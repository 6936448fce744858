package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit MD5 hash — the codegen'd twin of
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long`
  * ([[graft.llm.TextOps.hash60]]'s composed form).
  *
  * The composed chain allocates a 32-char hex string, a 15-char
  * substring, and runs a base-16 parse PER CALL — and it is the single
  * most-called primitive in the engine (every shingle, token, minhash,
  * fingerprint and split/sample id hash goes through it). This
  * expression digests the UTF-8 bytes and assembles the value from the
  * first 8 digest bytes directly: the first 15 hex characters of an MD5
  * are exactly the first 60 bits, i.e. (first 8 bytes big-endian) >>> 4.
  *
  * Value-identical to the composed form and to the DuckDB oracle's
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` — verified by the
  * PropertySpec twin test.
  */
case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash60Expr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60Expr {

  // MessageDigest is stateful; one instance per thread, reset per call.
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes) as a non-negative long. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top8 =
      (d(0) & 0xFFL) << 56 | (d(1) & 0xFFL) << 48 |
      (d(2) & 0xFFL) << 40 | (d(3) & 0xFFL) << 32 |
      (d(4) & 0xFFL) << 24 | (d(5) & 0xFFL) << 16 |
      (d(6) & 0xFFL) << 8 | (d(7) & 0xFFL)
    top8 >>> 4
  }
}

object HashFunctions {

  /** Codegen'd 60-bit MD5 hash of a string column. */
  def hash60(c: Column): Column = Bridge.column(Hash60Expr(Bridge.expression(c)))
}
