package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window operators (SURVEY.md §2.5 W1-W2).
  *
  * W1 reproduces the reference's skip-N-metadata-rows idiom
  * (`raw_to_landing_sparkjob.py:85-89`); W2 supplies the per-key ordered
  * analytics the reference delegates to BigQuery/Tableau
  * (`images/tableau_AMZN.png`; unique `(Ticker, Date)` keys
  * `code/sql/DDLs:14,28`).
  */
object Windows {

  /** W1 - drop the first `n` physical rows via a global row_number
    * (`row_number().over(Window.orderBy(lit(1)))`,
    * `raw_to_landing_sparkjob.py:85-89`), kept verbatim for parity.
    *
    * Scale note: a global window collapses to ONE partition - acceptable only
    * because the reference applies it to single small per-ticker files. For
    * anything large use [[skipRowsPerFile]], which keeps scan parallelism.
    */
  def skipRows(df: DataFrame, n: Int): DataFrame = {
    val w = Window.orderBy(lit(1))
    df.withColumn("row_index", row_number().over(w))
      .filter(col("row_index") > n)
      .drop("row_index")
  }

  /** W1 at scale - skip the first `n` rows of EACH input file without a
    * global shuffle: partition the window by `input_file_name()` so every
    * file's header junk is dropped independently and in parallel. Row order
    * within a file is preserved by the line-based CSV reader only when the
    * file is read as one split; for the small per-ticker raw files that is
    * always true, and larger files should carry explicit row keys instead.
    */
  def skipRowsPerFile(df: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(input_file_name()).orderBy(monotonically_increasing_id())
    df.withColumn("row_index", row_number().over(w))
      .filter(col("row_index") > n)
      .drop("row_index")
  }

  /** W2 - per-key ordered time-series analytics: previous value (`lag`), a
    * trailing `windowRows`-row moving sum/average, cumulative running sum and
    * row rank. One `Window.partitionBy(key).orderBy(date, tiebreak)` spec is
    * shared by all measures so Catalyst evaluates them in a single Window
    * physical node (one shuffle on `key`, one sort per partition).
    *
    * The tiebreak column MUST make the ordering total - nondeterministic
    * window output is not reproducible and will not match any oracle.
    */
  def keyedAnalytics(df: DataFrame, key: String, date: String, tiebreak: String,
                     measure: String, windowRows: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(date), col(tiebreak))
    val moving = w.rowsBetween(-(windowRows - 1), 0)
    val cumulative = w.rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("prev_value", lag(col(measure), 1).over(w))
      .withColumn("moving_sum", sum(col(measure)).over(moving))
      .withColumn("running_sum", sum(col(measure)).over(cumulative))
      .withColumn("rn", row_number().over(w))
  }

  /** The warehouse `SERIAL` surrogate key (`code/sql/DDLs:3,19`) as a dense
    * 1-based id over an EXPLICIT total ordering — reproducible, unlike
    * insert-order serials or `monotonically_increasing_id` (which is
    * partition-dependent and non-dense).
    *
    * Scale shape: a naive `row_number().over(Window.orderBy(...))` collapses
    * the whole table into one partition. Instead: range-repartition on the
    * order keys, number rows locally per partition, and add each partition's
    * prefix-sum offset (a window over #partitions rows — driver-small). Two
    * shuffles of the data at most, full parallelism throughout; the same
    * two-phase prefix-sum shape as `Curation.packShards`.
    *
    * `order` MUST be a total order (unique key set) — with duplicate keys,
    * rows that straddle a range-partition boundary would be numbered
    * arbitrarily and the output would not be reproducible.
    */
  def surrogateKey(df: DataFrame, idName: String, order: Column*): DataFrame =
    surrogateKeyMaterialized(df, idName, Materialize.Local, order: _*)

  /** [[surrogateKey]] with an explicit [[Materialize]] strategy for the
    * pinned range-partitioned frame. The pin is CORRECTNESS-bearing here
    * (see below), so long-running cluster jobs should prefer
    * `Materialize.Reliable` / `Materialize.Path` — with the default local
    * checkpoint an executor loss fails the job (no lineage fallback; see
    * the [[Materialize]] contract).
    */
  def surrogateKeyMaterialized(df: DataFrame, idName: String, mat: Materialize,
                               order: Column*): DataFrame = {
    // The __pid-tagged frame feeds two consumers (the offset aggregate and
    // the final join). Materializing it ONCE means both consumers see the
    // SAME range boundaries — re-evaluating the range exchange per
    // consumer can sample different boundaries, which desynchronizes
    // offsets from local row numbers. With consistent boundaries the
    // result is boundary-independent: offset + local == global rank under
    // the total order, wherever the cuts fall.
    val local = mat(df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local",
        row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*))))
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(idName, (col("__offset") + col("__local")).cast("long"))
      .drop("__pid", "__local", "__offset")
  }

  /** Distributed inclusive prefix sums over a TOTAL order — the
    * generalization of [[surrogateKeyMaterialized]] from ranks to running
    * totals. For each name in `sums`, appends `cum_<name>` = the sum of
    * that column over all rows at-or-before this row in `order`. Two
    * phases: range-partition on the order, per-partition window sums,
    * then one broadcast partition-offset join — never a global
    * single-partition window, so it holds at any scale the range
    * exchange can balance.
    *
    * The order must be TOTAL (unique per row): ties would make each
    * row's inclusive sum depend on intra-tie ordering, which no engine
    * pair reproduces. Pre-aggregate to distinct order keys first (the
    * natural shape for CDF/cumulative-count consumers like
    * [[Checks.ksDrift]]).
    *
    * Same materialization contract as [[surrogateKeyMaterialized]]: the
    * pinned frame feeds the offset aggregate and the final join, so both
    * must see one set of range boundaries.
    */
  def prefixSums(df: DataFrame, mat: Materialize, order: Seq[Column],
                 sums: Seq[String]): DataFrame = {
    require(sums.nonEmpty, "prefixSums: no sum columns")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = mat(df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id()))
    val withLocal = sums.foldLeft(local) { (acc, c) =>
      acc.withColumn(s"__loc_$c", sum(col(c)).over(w))
    }
    val offsets = local.groupBy(col("__pid"))
      .agg(sums.map(c => sum(col(c)).as(s"__tot_$c")).head,
           sums.map(c => sum(col(c)).as(s"__tot_$c")).tail: _*)
    val wp = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = sums.foldLeft(offsets) { (acc, c) =>
      acc.withColumn(s"__off_$c",
        coalesce(sum(col(s"__tot_$c")).over(wp), lit(0L)))
    }.select(col("__pid") +: sums.map(c => col(s"__off_$c")): _*)
    val joined = withLocal.join(broadcast(withOff), Seq("__pid"))
    val out = sums.foldLeft(joined) { (acc, c) =>
      acc.withColumn(s"cum_$c", col(s"__off_$c") + col(s"__loc_$c"))
    }
    out.drop("__pid" +: sums.flatMap(c =>
      Seq(s"__loc_$c", s"__off_$c")): _*)
  }

  /** Fixed-horizon exponentially-weighted moving average: per key, over
    * the last `terms` rows in (order, tiebreak) order, ewma = Σ w_i·x_{t-i}
    * / Σ w_i with w_i = α(1-α)^i, renormalized over the lags that exist
    * (so the first rows of a key average over what's available instead of
    * decaying toward 0). The standard smoothing step before thresholding
    * noisy per-entity metrics.
    *
    * A TRUE infinite-horizon EWMA is a sequential recurrence — inherently
    * order-dependent float accumulation that no engine pair reproduces
    * bit-for-bit. Truncating at `terms` makes the value a FIXED arithmetic
    * expression over `terms` lags: all lags share one window spec (one
    * shuffle + one sort per key), evaluation order is pinned left-to-right,
    * and the weights are plan-time literals — engine-portable exactly.
    */
  def ewmaFixed(df: DataFrame, key: String, order: String, tiebreak: String,
                value: String, alpha: Double, terms: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(terms >= 1, s"terms must be >= 1, got $terms")
    // If every in-horizon value is null the denominator is 0.0 and the
    // ewma is NULL (Spark division) — a missing smoothed metric, which is
    // the honest answer when there is nothing to smooth.
    val w = Window.partitionBy(col(key)).orderBy(col(order), col(tiebreak))
    val contribs = (0 until terms).map { i =>
      val wt = alpha * math.pow(1 - alpha, i)
      val l = lag(col(value), i).over(w)
      (when(l.isNotNull, l * lit(wt)).otherwise(lit(0.0)),
        when(l.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    df.select(col(key), col(order), col(tiebreak), col(value))
      .withColumn("ewma",
        contribs.map(_._1).reduce(_ + _) / contribs.map(_._2).reduce(_ + _))
  }

  /** Gap-delimited session ids — the ONE gaps-and-islands derivation
    * every session consumer shares (the `>=` boundary is contract: an
    * event at EXACTLY last + gap starts a new session, matching
    * session_window's [start, last + gap) interval). Appends `__sid`
    * (1-based per key) to the input; both windows ride one (key, ts,
    * seq) sort. The input is projected to the four named columns, so a
    * caller column can only collide if itself named `__`-something.
    */
  def sessionIds(df: DataFrame, key: String, ts: String, seq: String,
                 extra: Seq[String], gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, s"gapMinutes must be positive, got $gapMinutes")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(seq))
    val gapUs = gapMinutes * 60L * 1000000L
    df.select((Seq(key, ts, seq) ++ extra).distinct.map(col): _*)
      .withColumn("__prev_us",
        unix_micros(lag(col(ts), 1).over(w).cast("timestamp")))
      .withColumn("__flag",
        when(col("__prev_us").isNull ||
          unix_micros(col(ts).cast("timestamp")) - col("__prev_us") >= gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sid",
        sum(col("__flag")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_us", "__flag")
  }

  /** SESSION ASSEMBLY: collapse a per-key event log into one row per
    * gap-delimited session, with the payloads concatenated in event
    * order — the conversation-assembly step that turns raw interaction
    * logs into training dialogues (turns joined chronologically, one
    * document per session).
    *
    * Gaps-and-islands shape: every window shares ONE (key, ts, seq)
    * sort (one Exchange total); the assembly groupBy sorts only each
    * session's OWN rows (bounded by session length, never corpus-wide).
    * Output: (key, sid, session_start, n_events, assembled). NULL
    * payloads are skipped by the concat (both engines' agg semantics);
    * an all-NULL session assembles to the empty string.
    */
  def assembleSessions(df: DataFrame, key: String, ts: String, seq: String,
                       payload: String, gapMinutes: Int,
                       sep: String = " -> "): DataFrame =
    sessionIds(df, key, ts, seq, Seq(payload), gapMinutes)
      .groupBy(col(key), col("__sid").as("sid"))
      .agg(
        min(col(ts).cast("timestamp")).as("session_start"),
        count(lit(1)).as("n_events"),
        concat_ws(sep,
          transform(
            array_sort(collect_list(struct(col(ts), col(seq), col(payload)))),
            s => s.getField(payload))).as("assembled"))
}
