package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass simhash of a token array — the codegen'd replacement
  * for the explode → md5-per-token → N-column ±1 vote aggregate → pack
  * dataflow ([[graft.llm.Dedup.simhashFrame]] /
  * `simhashWideFrame`'s original shape).
  *
  * Why an expression instead of the aggregate: the vote fold is a pure
  * per-document function of its token multiset (documents are KB-scale,
  * so one doc's tokens always fit a scalar eval), but the frame form
  * paid for it with a token-row explode, a 60/120-column codegen
  * aggregate (whole-stage compile measured at ~7 s cold on the wide
  * family), and a groupBy exchange — per BATCH of signatures. At corpus
  * scale that exchange carries a row per document per aggregation; this
  * expression computes the identical value inline in the scan
  * projection: zero shuffle, one md5 (plus one salted md5 for the wide
  * family) per token, whole-stage-codegen friendly.
  *
  * Value parity (oracle-checked): bit j votes +1 when bit j of
  * `hash60(token)` is 1 else -1, multiplicity-weighted; bit set on
  * vote sum >= 0. The wide family's high word votes with
  * `hash60("1:" + token)` ([[graft.llm.TextOps.hash60Salted]] salt 1).
  * A null token array (null text upstream) yields a null signature —
  * callers filter it, matching the explode path dropping the doc.
  */
case class Simhash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimhashExprs.compute60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashExprs.compute60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Two-word 120-bit simhash: `array(lo, hi)` of the token array (see
  * [[Simhash60Expr]]).
  */
case class SimhashWideExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_wide requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_simhash_wide"

  override protected def nullSafeEval(input: Any): Any =
    SimhashExprs.computeWide(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashExprs.computeWide($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashExprs {

  private val Salt1 = UTF8String.fromString("1:")

  /** 60-bit one-word simhash of a token array. Null tokens vote -1 on
    * every bit — the exact value the frame form's
    * `when(h.bitwiseAND(1) === 1, 1).otherwise(-1)` gives a null hash
    * (split() never produces them, but parity is parity).
    */
  def compute60(tokens: ArrayData): Long = {
    val counts = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t == null) {
        var j = 0
        while (j < 60) { counts(j) -= 1; j += 1 }
      } else {
        val h = Hash60Expr.hash(t)
        var j = 0
        while (j < 60) {
          counts(j) += ((((h >>> j) & 1L).toInt) << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    pack(counts, 0)
  }

  /** 120-bit two-word simhash: `[lo, hi]`, hi salted with `"1:"`. */
  def computeWide(tokens: ArrayData): ArrayData = {
    val counts = new Array[Int](120)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t == null) {
        var j = 0
        while (j < 120) { counts(j) -= 1; j += 1 }
      } else {
        val h1 = Hash60Expr.hash(t)
        val h2 = Hash60Expr.hash(UTF8String.concat(Salt1, t))
        var j = 0
        while (j < 60) {
          counts(j) += ((((h1 >>> j) & 1L).toInt) << 1) - 1
          counts(60 + j) += ((((h2 >>> j) & 1L).toInt) << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(Array(pack(counts, 0), pack(counts, 60)))
  }

  private def pack(counts: Array[Int], off: Int): Long = {
    var w = 0L
    var j = 0
    while (j < 60) {
      if (counts(off + j) >= 0) w |= 1L << j
      j += 1
    }
    w
  }
}

object SimhashFunctions {

  /** Codegen'd 60-bit simhash of a token-array column. */
  def simhash60(tokens: Column): Column =
    Bridge.column(Simhash60Expr(Bridge.expression(tokens)))

  /** Codegen'd 120-bit two-word simhash (`array(lo, hi)`). */
  def simhashWide(tokens: Column): Column =
    Bridge.column(SimhashWideExpr(Bridge.expression(tokens)))
}
