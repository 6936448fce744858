package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft native
  * functions into the session's FunctionRegistry so SQL users get them
  * too (`SELECT graft_dot(a, b)`). Activate with
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * imperatively via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"graft_dot(a, b) takes 2 arguments, got ${children.length}")
        DotProduct(children(0), children(1))
      }),
    ("graft_hash60",
      new ExpressionInfo(classOf[Hash60Expr].getName, "graft_hash60"),
      (children: Seq[Expression]) => {
        if (children.length != 1) throw new IllegalArgumentException(
          s"graft_hash60(s) takes 1 argument, got ${children.length}")
        Hash60Expr(children.head)
      }),
    ("graft_hll",
      new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"graft_hll(hashed, p) takes 2 arguments, got ${children.length}")
        val pExpr = children(1)
        if (!pExpr.foldable) throw new IllegalArgumentException(
          "graft_hll: p must be a literal integer")
        pExpr.eval(null) match {
          case n: Number => HllSketch(children.head, n.intValue())
          case other => throw new IllegalArgumentException(
            s"graft_hll: p must be an integer literal, got $other")
        }
      }),
    ("graft_bloom",
      new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom"),
      (children: Seq[Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"graft_bloom(hashed, numBits, numHashes) takes 3 arguments, got ${children.length}")
        val args = children.tail.map { e =>
          if (!e.foldable) throw new IllegalArgumentException(
            "graft_bloom: numBits and numHashes must be literal integers")
          e.eval(null) match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"graft_bloom: expected an integer literal, got $other")
          }
        }
        BloomAgg(children.head, args(0), args(1))
      }),
    ("graft_bloom_contains",
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"graft_bloom_contains(filter, hashed) takes 2 arguments, got ${children.length}")
        BloomMightContain(children(0), children(1))
      }),
    ("graft_top_k",
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_top_k"),
      (children: Seq[Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"graft_top_k(score, value, k) takes 3 arguments, got ${children.length}")
        val kExpr = children(2)
        if (!kExpr.foldable) throw new IllegalArgumentException(
          "graft_top_k: k must be a literal integer")
        kExpr.eval(null) match {
          case n: Number if n.intValue() > 0 =>
            TopKByScore(children(0), children(1), n.intValue())
          case other => throw new IllegalArgumentException(
            s"graft_top_k: k must be a positive integer literal, got $other")
        }
      }))

  /** Imperative registration for sessions built without the extensions
    * conf (tests, notebooks).
    */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}
