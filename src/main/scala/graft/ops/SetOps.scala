package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Unions / sorts / limits / set operations (SURVEY.md §2.6 O1-O5).
  *
  * O1/O2 are the reference's only combine steps
  * (`raw_to_landing_sparkjob.py:134,181-184`); ORDER BY / LIMIT / top-k /
  * INTERSECT / EXCEPT are part of the delegated-to-BigQuery query surface
  * the engine exposes.
  */
object SetOps {

  /** O1/O2/O3 - N-way union by column name. A fold of `unionByName` builds a
    * linear plan; Catalyst collapses adjacent unions into one N-ary `Union`
    * node, so this stays a single stage regardless of N. (The reference
    * folds 20 frames on the driver, `raw_to_landing_sparkjob.py:181-184`;
    * prefer a glob read - [[Sources.globWithKey]] - when the inputs are
    * files, which avoids the N plan nodes entirely.)
    */
  def unionAll(dfs: Seq[DataFrame], allowMissingColumns: Boolean = false): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns))

  /** O5 - top-k: `orderBy(...).limit(k)`. Catalyst plans this as
    * `TakeOrderedAndProject` - each partition keeps a size-k heap and only k
    * rows per partition reach the driver-side merge; there is NO global sort.
    * The ordering must be total (include a unique tiebreak column) or the
    * selected rows at the boundary are nondeterministic.
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** O4 - explicit ordering (pandas' implicit row order, made declarative:
    * `transform_job_tabular_entitities.py:21-24` relies on transpose
    * preserving column order; Spark output order is undefined without this).
    */
  def ordered(df: DataFrame, order: Column*): DataFrame =
    df.orderBy(order: _*)

  /** O5 - set intersection (deduplicating, SQL INTERSECT). */
  def intersection(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)

  /** O5 - set difference (deduplicating, SQL EXCEPT). */
  def difference(a: DataFrame, b: DataFrame): DataFrame = a.except(b)
}
