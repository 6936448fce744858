package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joins (SURVEY.md §2.3).
  *
  * The reference has no dataflow joins - entity integration is deferred to
  * BigQuery star joins over the shared `Ticker` key
  * (`code/sql/DDLs:13,27,166,174`; `README.md:9-10`). This object supplies
  * that query surface inside the engine, plus the as-of join the (Ticker,
  * Date) series pair (prices vs dividends, `code/sql/DDLs:2-15,165-170`)
  * calls for.
  */
object Joins {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Joins")

  /** Hot-block cap for [[fuzzyJoinBlocked]]: blocks wider than this
    * (combined, both sides) are sub-split by length band before the
    * candidate join, bounding per-task pair mass under any prefix/suffix
    * skew ("every record starts 'the '"). Far above any benign ER block
    * on a real name field, far below a degenerate one. Pass
    * `Long.MaxValue` to opt out, which also skips the width pass.
    */
  val DefaultMaxBlockWidth: Long = 10000L

  /** DIAGNOSTIC: how many over-cap blocks the most recent
    * [[fuzzyJoinBlocked]] call on this driver sub-split, and how many
    * sub-blocks it then dropped as STILL over cap (same block key AND
    * same length band, wider than the cap). Driver-side, last-call-wins
    * visibility hooks for tests and operators; the authoritative
    * per-call signal is the WARN log emitted when either fires.
    */
  val lastBlockCapSplits = new java.util.concurrent.atomic.AtomicLong(0L)
  val lastBlockCapDrops = new java.util.concurrent.atomic.AtomicLong(0L)

  /** J3 - star join: fact x N dimensions on a shared key, dims broadcast.
    * The reference's dims are <=20 rows (`stock_list.csv:1-21`) and at 100 TB
    * dimension tables stay small relative to facts, so an explicit
    * `broadcast()` hint pins a BroadcastHashJoin - no fact-side shuffle at
    * all; the fact table streams through map-side.
    */
  def starJoin(fact: DataFrame, dims: Seq[(DataFrame, Seq[String])]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, keys)) =>
      acc.join(broadcast(dim), keys, "inner")
    }

  /** J2 - allowlist semi-join: keep fact rows whose key appears in `keys`
    * (`transform_job_tabular_entitities.py:19` does this with an in-list).
    * LEFT SEMI emits no dim columns and deduplicates the build side, and the
    * broadcast keeps it shuffle-free.
    */
  def semiFilter(fact: DataFrame, keys: DataFrame, joinKeys: Seq[String]): DataFrame =
    fact.join(broadcast(keys), joinKeys, "left_semi")

  /** As-of join (stretch op, SURVEY §2.3): for every row of `left`, the most
    * recent `right` row with the same key and `right.time <= left.time`
    * (ties included - `<=` semantics, matching SQL ASOF JOIN).
    *
    * Spark has no ASOF JOIN operator, and an inequality join would be a
    * O(n*m) broadcast-nested-loop. Instead: union-tag the two inputs, then a
    * single `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY time,
    * side)` carries each right value forward to the left rows it covers.
    * One shuffle on `key`, one sort - the same cost as a sort-merge join,
    * and skew-safe under AQE. Right rows sort before left rows at equal
    * `time` (side 0 < 1) which yields the `<=` tie semantics.
    *
    * `right` must be unique per (key, time); pre-aggregate it otherwise.
    * Returns `left`'s columns plus `valueCol` (null when nothing precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               valueCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1)).withColumn(valueCol, lit(null).cast(
      right.schema(valueCol).dataType))
    val r = right.select(col(key), col(time), col(valueCol))
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Salted equi-join for a skewed key: spread each hot left key over
    * `buckets` salt values and explode the right side to match. AQE's skew
    * handling covers most cases; this is the explicit fallback when a single
    * key exceeds what one task can sort (the 100 TB "one ticker is half the
    * data" case).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int,
                 joinType: String = "inner",
                 saltCols: Seq[String] = Nil): DataFrame = {
    // Right/full-outer would duplicate unmatched right rows `buckets`
    // times (the right side is exploded across every salt).
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left join types only, got $joinType")
    // Salt from row CONTENT, not monotonically_increasing_id(): a retried
    // map task re-derives the identical salt for every row, so the join
    // stays deterministic under task retry. Default basis = all columns
    // (safe); pass `saltCols` (key + a couple of high-entropy payload
    // columns) on wide tables to avoid hashing every column per row.
    // (Identical duplicate rows share a salt — acceptable skew for real
    // data, where hot-key rows still differ in their payload columns.)
    val basis = if (saltCols.nonEmpty) saltCols else left.columns.toSeq
    val saltedL = left.withColumn("_salt",
      pmod(hash(basis.map(col).toIndexedSeq: _*), lit(buckets)))
    val saltedR = right.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedL.join(saltedR, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Range join: pair rows whose `point` falls inside `[lo, hi]` intervals.
    * Declared as a plain theta join so Catalyst can choose broadcast when the
    * interval side is small; at scale, pre-bucket both sides on
    * `floor(point / width)` to turn it into an equi-join plus residual
    * filter (the standard interval-bucketing trick).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, point: Column,
                lo: Column, hi: Column): DataFrame =
    points.join(intervals, point >= lo && point <= hi)

  /** Bucketed range join — the 100 TB path [[rangeJoin]]'s Scaladoc
    * promises: both sides bucket on `floor(x / width)`, intervals explode
    * to every bucket they overlap, and the pairing becomes an EQUI-join on
    * the bucket (shuffle-hash/sort-merge, AQE-skew-splittable) plus the
    * residual `[lo, hi]` filter. A plain theta join degrades to
    * broadcast-nested-loop — O(points x intervals) work — the moment the
    * interval side outgrows broadcast.
    *
    * `width` should be on the order of the typical interval length: the
    * explode factor is ~(interval length / width) + 1 per interval, while
    * too-small widths multiply interval copies and too-large widths put
    * many points in each bucket with non-matching intervals.
    */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
                        point: String, lo: String, hi: String,
                        width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val p = points.withColumn("_bkt", floor(col(point) / width).cast("long"))
    val iv = intervals.withColumn("_bkt",
      explode(sequence(floor(col(lo) / width).cast("long"),
        floor(col(hi) / width).cast("long"))))
    p.join(iv, Seq("_bkt"))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_bkt")
  }

  /** Blocked fuzzy join — entity resolution by edit distance WITHOUT the
    * all-pairs cross product. Returns `(idA, idB, dist)` for every
    * cross-frame pair whose normalized (lower/trim) texts are within
    * `maxDistance` Levenshtein edits AND share a blocking key.
    *
    * Blocking is the standard ER trade: candidates form only inside a
    * block, so the join is an equi-shuffle on the block key (data +
    * candidates, never n²). Two keys per record — the normalized text's
    * first 3 and last 3 characters — so any single-end corruption (the
    * common dirty-data shape: truncated head, clipped tail, one typo)
    * still collides on the other key; only an edit run touching BOTH
    * ends within `maxDistance` total edits escapes, the documented
    * recall boundary. RECALL FLOOR FOR SHORT TEXTS: below ~4 characters
    * the prefix and suffix windows overlap, so a single length-changing
    * edit ("ab" vs "abc", distance 1) rewrites BOTH keys and the pair is
    * missed — the two-key guarantee only holds for texts of at least
    * `3 + maxDistance` characters. A cheap `abs(len_a - len_b) <=
    * maxDistance` pre-filter runs ahead of the O(len²) Levenshtein
    * kernel (Spark's codegen'd `levenshtein`), which therefore only ever
    * sees same-block, length-plausible candidates.
    *
    * SKEW GUARD (on by default at [[DefaultMaxBlockWidth]]): a
    * pathologically common prefix (every record starting "the ")
    * concentrates one block, and the candidate join inherits that skew —
    * a hot block is quadratic in its width. A width pass counts each
    * block (both sides combined); blocks over `maxBlockWidth` are
    * sub-split by length band `floor(len / (maxDistance + 1))`, with the
    * probe side exploded to the adjacent bands as well: any pair within
    * `maxDistance` edits differs by at most `maxDistance` in length, so
    * it lands at most one band apart and still collides — sub-splitting
    * costs width, not recall. Sub-blocks STILL over cap (same key AND
    * same length band) are dropped with a WARN — the only recall loss,
    * confined to blocks so degenerate they carry no blocking signal —
    * which bounds per-key pair mass at ~3·maxBlockWidth². Both passes
    * fire only when a block is actually hot; the common benign case
    * adds one count-shuffle and no joins.
    */
  def fuzzyJoinBlocked(left: DataFrame, right: DataFrame,
                       leftId: String, leftText: String,
                       rightId: String, rightText: String,
                       maxDistance: Int,
                       maxBlockWidth: Long = DefaultMaxBlockWidth): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    require(maxBlockWidth > 0, s"maxBlockWidth must be > 0, got $maxBlockWidth")
    def prep(df: DataFrame, idC: String, textC: String, side: String) =
      df.select(col(idC).as(s"id_$side"),
        lower(trim(col(textC))).as(s"t_$side"))
    def keyed(df: DataFrame, side: String) =
      df.select(col(s"id_$side"),
        (length(col(s"t_$side")) / (maxDistance + 1)).cast("long").as("_band"),
        explode(array(
          concat(lit("p:"), expr(s"substring(t_$side, 1, 3)")),
          concat(lit("s:"),
            expr(s"substring(t_$side, greatest(length(t_$side) - 2, 1), 3)"))))
        .as("bkey"))
    val a = prep(left, leftId, leftText, "a")
    val b = prep(right, rightId, rightText, "b")
    val ka = keyed(a, "a")
    val kb = keyed(b, "b")
    // Width pass: over-cap block keys, collected driver-side (bounded at
    // 2·(|a|+|b|)/cap rows — the same driver-visibility trade as
    // Similarity.applyCap; empty on any benignly-blocked corpus).
    val over =
      if (maxBlockWidth == Long.MaxValue) Array.empty[org.apache.spark.sql.Row]
      else ka.select("bkey").unionAll(kb.select("bkey"))
        .groupBy("bkey").agg(count(lit(1)).as("w"))
        .filter(col("w") > maxBlockWidth).select("bkey").collect()
    lastBlockCapSplits.set(over.length.toLong)
    // Last-call-wins for BOTH diagnostics: a benign call must not leave a
    // stale drop count from an earlier hot-block call.
    lastBlockCapDrops.set(0L)
    val cand =
      if (over.isEmpty)
        ka.select("id_a", "bkey").join(kb.select("id_b", "bkey"), Seq("bkey"))
          .select("id_a", "id_b").distinct()
      else {
        log.warn(s"fuzzyJoinBlocked: sub-splitting ${over.length} hot " +
          s"block(s) by length band (maxBlockWidth=$maxBlockWidth)")
        val spark = left.sparkSession
        val overDf = spark.createDataFrame(
            java.util.Arrays.asList(over: _*),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("bkey",
                org.apache.spark.sql.types.StringType))))
          .withColumn("_hot", lit(true))
        // Hot rows swap their key for bkey#band; the probe (b) side also
        // emits the two adjacent bands so band-boundary pairs survive.
        // Cold rows pass through untouched (null `_hot` → otherwise arm).
        def split(k: DataFrame, idC: String, adjacent: Boolean) = {
          val j = k.join(broadcast(overDf), Seq("bkey"), "left")
          val bands = if (adjacent) Seq(-1L, 0L, 1L) else Seq(0L)
          val keys = when(col("_hot"), array(bands.map(d =>
              concat(col("bkey"), lit("#"), col("_band") + d)): _*))
            .otherwise(array(col("bkey")))
          j.select(col(idC), coalesce(col("_hot"), lit(false)).as("_hot"),
            explode(keys).as("bkey"))
        }
        val sa = split(ka, "id_a", adjacent = false)
        val sb = split(kb, "id_b", adjacent = true)
        // Hard bound: a sub-block still over cap on either side (the b
        // side gets a 3x allowance for its adjacent-band copies) is
        // dropped from candidate generation entirely.
        val still = sa.filter(col("_hot")).groupBy("bkey")
          .agg(count(lit(1)).as("w")).filter(col("w") > maxBlockWidth)
          .select("bkey")
          .unionAll(sb.filter(col("_hot")).groupBy("bkey")
            .agg(count(lit(1)).as("w"))
            .filter(col("w") > 3L * maxBlockWidth).select("bkey"))
          .distinct().collect()
        lastBlockCapDrops.set(still.length.toLong)
        val (fa, fb) =
          if (still.isEmpty) (sa, sb)
          else {
            log.warn(s"fuzzyJoinBlocked: dropping ${still.length} " +
              s"sub-block(s) still over cap after length banding " +
              s"(maxBlockWidth=$maxBlockWidth) — recall degrades there")
            val stillDf = spark.createDataFrame(
              java.util.Arrays.asList(still: _*),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("bkey",
                  org.apache.spark.sql.types.StringType))))
            (sa.join(broadcast(stillDf), Seq("bkey"), "left_anti"),
              sb.join(broadcast(stillDf), Seq("bkey"), "left_anti"))
          }
        fa.select("id_a", "bkey").join(fb.select("id_b", "bkey"), Seq("bkey"))
          .select("id_a", "id_b").distinct()
      }
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .filter(abs(length(col("t_a")) - length(col("t_b"))) <= maxDistance)
      .withColumn("dist", levenshtein(col("t_a"), col("t_b")))
      .filter(col("dist") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
