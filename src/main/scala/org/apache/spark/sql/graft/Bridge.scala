package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.{Expression, ScalarSubquery}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column <-> Expression
  * converters — the sanctioned way for a library to wrap a custom Catalyst
  * Expression as a user-facing Column in Spark 4's classic API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a 1-row/1-column Dataset as a scalar-subquery Column — the
    * shape Spark's own `InjectRuntimeFilter` uses to feed a built filter
    * into a probe-side predicate. Unlike `crossJoin(broadcast(onerow))`,
    * a Filter over a scalar subquery is NOT a join, so
    * `PushLeftSemiLeftAntiThroughJoin` cannot reorder a downstream
    * semi-join beneath it (verified: the cross-join form executed the
    * semi-join FIRST, defeating a prefilter entirely).
    */
  def scalarSubquery(df: Dataset[_]): Column =
    ExpressionUtils.column(ScalarSubquery(df.queryExecution.analyzed))
}
