package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: SCD2 history construction and
  * key-based upsert — the merge half of the reference's warehouse loads
  * (its BigQuery `WRITE_TRUNCATE` loads replace tables wholesale,
  * `ingest_data_API.py:52-64`; a Spark-native warehouse needs the
  * incremental counterparts).
  */
object Scd {

  /** Collapse an ordered change log into SCD2 (type-2 slowly-changing-
    * dimension) validity intervals: per key, consecutive runs of the same
    * `attrCol` value become one row with `valid_from` (run start),
    * `valid_to` (next run's start; null on the open run), a 1-based
    * `version`, and `is_current`.
    *
    * Gaps-and-islands: a per-key lag marks run starts, a per-key running
    * sum numbers the runs, one aggregate collapses them, and a per-key
    * lead closes each interval. Every window partitions by the key — per-
    * key state only, so a 100 TB log shuffles once on key and each
    * partition sorts locally; there is no global window anywhere.
    * `tieCol` must make (ts, tie) unique per key or run numbering is
    * nondeterministic under equal timestamps. `attrCol` must be non-null
    * (a null attr never flags a run start).
    */
  def scd2FromChangeLog(df: DataFrame, keyCol: String, attrCol: String,
                        tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(attrCol), 1).over(w)
    val flagged = df
      .withColumn("_chg",
        when(prev.isNull || prev =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("int"))
    val runs = flagged.groupBy(col(keyCol), col("version"))
      .agg(min(col(attrCol)).as(attrCol), // constant within a run
        min(col(tsCol)).as("valid_from"))
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Key-based upsert (SCD1 merge): `updates` rows replace `target` rows
    * sharing their key; unmatched update keys append. Callers must
    * de-duplicate `updates` on the key first (this is MERGE semantics —
    * duplicate update keys would both survive).
    *
    * Plan shape: one anti-join plus a union — when `updates` is
    * dimension-sized Catalyst broadcasts it and the target never
    * shuffles; at comparable sizes it degrades to a single shuffle on
    * the key. Schemas are matched by name.
    */
  def upsert(target: DataFrame, updates: DataFrame,
             keyCols: Seq[String]): DataFrame =
    target.join(updates, keyCols, "left_anti").unionByName(updates)
}
