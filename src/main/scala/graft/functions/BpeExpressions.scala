package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native greedy BPE merge over a `(pos, token)` struct array — one
  * left-to-right pass applying the rule `(a, b) → ab` with exact BPE
  * tokenizer-training semantics (non-overlapping, leftmost-first:
  * `[a,a,a]` under `(a,a)` becomes `[aa, a]`). The merged pair keeps the
  * FIRST member's `pos`, so chained rounds preserve each surviving
  * token's original-tokenization position (sparse), exactly like the
  * windowed form this replaces.
  *
  * Why an expression: with the token stream EXPLODED to one row per
  * token ([[graft.llm.Curation.bpeApplyMerge]]'s original dataflow), the
  * greedy selection needed a per-document window — an Exchange + sort of
  * the FULL corpus token stream per training round, and the
  * `localCheckpoint` between rounds erases the partitioning under AQE
  * (the physical layout is unknown until runtime), so no round could
  * reuse the previous round's shuffle. Kept as one array per document,
  * the merge is a pure per-row O(doc) scalar function: zero shuffle,
  * whole-stage codegen, and the only per-round exchange left in BPE
  * training is the map-side-combined pair-count aggregate.
  */
case class BpeGreedyMergeExpr(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 2 && s(0).dataType == IntegerType &&
        s(1).dataType == StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "graft_bpe_merge requires ARRAY<STRUCT<pos INT, token STRING>>, " +
        s"got ${t.sql}")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_bpe_merge"

  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)

  override protected def nullSafeEval(input: Any): Any =
    BpeGreedyMergeExpr.merge(input.asInstanceOf[ArrayData], aU, bU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeMergeA", aU, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("bpeMergeB", bU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeGreedyMergeExpr.merge($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeGreedyMergeExpr {

  /** One greedy leftmost non-overlapping pass. Null tokens never match
    * (the windowed form's `coalesce(…, false)` candidate flag).
    */
  def merge(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val ab = UTF8String.concat(a, b)
    val out = new java.util.ArrayList[InternalRow](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      val tok = row.getUTF8String(1)
      var merged = false
      if (i + 1 < n && tok != null && tok.equals(a)) {
        val nextTok = arr.getStruct(i + 1, 2).getUTF8String(1)
        if (nextTok != null && nextTok.equals(b)) {
          out.add(new GenericInternalRow(
            Array[Any](row.getInt(0), ab)))
          i += 2
          merged = true
        }
      }
      if (!merged) {
        out.add(new GenericInternalRow(
          Array[Any](row.getInt(0), tok)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size())))
  }
}

object BpeFunctions {

  /** Codegen'd greedy BPE merge of a `(pos, token)` struct-array column. */
  def greedyMerge(pt: Column, a: String, b: String): Column =
    Bridge.column(BpeGreedyMergeExpr(Bridge.expression(pt), a, b))
}
