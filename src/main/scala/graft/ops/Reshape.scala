package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reshaping (SURVEY.md §2.7): the reference's most distinctive operator is
  * the pandas transpose of a wide statement matrix
  * (`transform_job_tabular_entitities.py:12-31`: allowlist row filter ->
  * `df.T` -> first-row-as-header promotion -> `Ticker` tag). pandas `df.T`
  * relies on physical row order, which Spark does not have, so the
  * distributed equivalent goes through an explicit long form:
  * unpivot (metric stays a VALUE) -> pivot(metric) with a FIXED column list.
  *
  * Pivoting against the fixed allowlist matters twice at scale: the output
  * schema is deterministic (queryable without a pre-pass), and Spark skips
  * the extra pivot-values discovery job it would otherwise run over 100 TB.
  */
object Reshape {

  /** Generic unpivot: wide `(idCols..., valueCols...)` to long
    * `(idCols..., nameCol, valueCol)` — one pass, no shuffle, no UDF,
    * null values retained (the built-in `unpivot`/melt semantics;
    * asserted against it in ReshapeSpec).
    *
    * Implemented as `explode(array(struct(name, value)...))` — a
    * Catalyst `Generate` — rather than the built-in `unpivot`'s
    * `Expand`, for a partitioning-visibility reason (round-20, guide
    * §2.4): `ExpandExec` reports `UnknownPartitioning` even though
    * every projection leaves the id columns untouched, so an
    * unpivot→pivot roundtrip over an id-partitioned frame re-shuffles
    * the EXPLODED long frame twice (`r1_transpose_roundtrip`: 3
    * Exchanges, and at sf100 the 1.8B-row long exchange is the suite's
    * largest spill). `GenerateExec` preserves its child's partitioning,
    * and hash(ids) satisfies the pivot aggregates' clustering on both
    * (ids, name) and (ids), so the downstream pivot runs shuffle-free
    * on the partitioning the upstream aggregate already established.
    * The struct array coerces its value fields to the least common
    * type, matching the built-in's cast rule.
    */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
              nameCol: String, valueCol: String): DataFrame = {
    val entries = valueCols.map(c =>
      struct(lit(c).as(nameCol), col(c).as(valueCol)))
    df.select(idCols.map(col) :+ explode(array(entries: _*)).as("__e"): _*)
      .select(idCols.map(col) :+ col(s"__e.$nameCol").as(nameCol) :+
        col(s"__e.$valueCol").as(valueCol): _*)
  }

  /** Inverse of [[unpivot]] on unique `idCols`: pivot the long form back to
    * one column per `names` entry. `first(valueCol)` is deterministic here
    * because each `(idCols, name)` group holds exactly one value.
    */
  def pivot(df: DataFrame, idCols: Seq[String], nameCol: String, valueCol: String,
            names: Seq[String]): DataFrame =
    df.groupBy(idCols.map(col): _*)
      .pivot(nameCol, names)
      .agg(first(col(valueCol)))

  /** R1+R2+P7 - distributed statement transpose
    * (`transform_job_tabular_entitities.py:12-31`).
    *
    * Input: the S4 scan of a statement CSV - first column (`metricCol`)
    * holds metric names, the remaining columns are period dates, all strings.
    * Output: one row per period: `(Date, <metrics as double>, Ticker)` -
    * the reference's post-transpose shape with the header promotion (R2)
    * subsumed by the pivot (metric names become columns directly).
    */
  def transposeStatement(raw: DataFrame, metricCol: String, metrics: Seq[String],
                         ticker: String): DataFrame = {
    val periodCols = raw.columns.filterNot(_ == metricCol).toSeq
    val allowed = Clean.allowlistFilter(raw, metricCol, metrics)
    val long = unpivot(allowed, Seq(metricCol), periodCols, "Date", "value")
      .withColumn("value", col("value").cast("double"))
    pivot(long, Seq("Date"), metricCol, "value", metrics)
      .withColumn("Ticker", lit(ticker))
  }

  /** [[transposeStatement]] generalized to a MULTI-ENTITY frame: the input
    * carries a key column (e.g. `Ticker` recovered from the file path by
    * [[Sources.globWithKey]]) and the pivot groups by `(keyCol, Date)`, so
    * one glob scan transposes every entity's statement in a single job.
    * This is the scale shape of the reference's driver-side ticker loop
    * (`transform_job_tabular_entitities.py:68-80`, one pandas transpose per
    * ticker): N tickers cost one scan + one shuffle, not N jobs.
    */
  def transposeStatementKeyed(raw: DataFrame, metricCol: String,
                              metrics: Seq[String], keyCol: String): DataFrame = {
    val periodCols = raw.columns.filterNot(c => c == metricCol || c == keyCol).toSeq
    val allowed = Clean.allowlistFilter(raw, metricCol, metrics)
    val long = unpivot(allowed, Seq(keyCol, metricCol), periodCols, "Date", "value")
      .withColumn("value", col("value").cast("double"))
    pivot(long, Seq(keyCol, "Date"), metricCol, "value", metrics)
  }

  /** R2 standalone - promote the first physical row to column names (the
    * pandas `df.columns = df.iloc[0]; df = df[1:]` idiom). "First" is
    * defined by current physical order, so this belongs immediately after
    * a single-file scan (same caveat as [[Windows.skipRows]]); the header
    * row is read on the driver (one row), the rename is metadata-only, and
    * the body filter streams.
    *
    * SMALL-FRAME CONTRACT (like [[graft.ops.Sources.keyList]]): the
    * driver-side collect is one row of one partition — bounded by sheet
    * WIDTH, never row count — and the single-partition require bounds the
    * frame to one scan split. Statement sheets are KB-sized; anything
    * that outgrows one split should use the keyed
    * [[transposeStatementKeyed]] path, which never touches the driver.
    */
  def firstRowAsHeader(df: DataFrame): DataFrame = {
    // queryExecution.toRdd reuses the session's cached physical plan for
    // this frame and skips the row re-encoding that `.rdd` would add;
    // this runs once per KB-sized sheet, never on a hot path.
    require(df.queryExecution.toRdd.getNumPartitions == 1,
      "firstRowAsHeader requires a single-partition frame: \"first row\" is " +
        "physical order, which multi-partition limit(1)/skipRows do not share")
    val cols = df.columns
    val header = df.limit(1).collect()(0)
    val named = cols.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      // A null header cell (e.g. CSV empty-string -> null) falls back to
      // the positional name instead of NPE-ing.
      val name = if (header.isNullAt(i)) c else header.getString(i)
      col(c).as(name)
    }
    val tagged = Windows.skipRows(df, 1)
    tagged.select(named: _*)
  }
}
