package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Grouped top-k as a mergeable bounded-heap aggregate.
  *
  * The built-in way to take "top k rows per group" is a window
  * `row_number()` + filter — which SORTS every partition fully: O(n log n)
  * per group and the whole group's rows shuffle. This aggregate keeps a
  * k-element min-heap per group: O(n log k) work, O(k) state, and —
  * because it is a proper partial-aggregate — map-side combine shrinks the
  * shuffle to k rows per group per partition. At 100 TB per-key top-k this
  * is the difference between shuffling the corpus and shuffling k·groups
  * rows.
  *
  * Semantics: keeps the k largest (score, payload) pairs, ordered by
  * score DESC then payload ASC (total order — payloads must be unique per
  * group for oracle-reproducible output). Null scores/payloads are
  * skipped. Result: `array<struct<score double, value string>>`, sorted.
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, UTF8String)]] {

  require(k > 0, "graft_top_k requires k > 0")

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("value", StringType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && payload.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_k requires (DOUBLE, STRING), got " +
        s"${score.dataType.sql}, ${payload.dataType.sql}")

  // Heap ordering ranks the WORST element largest (PriorityQueue.head =
  // max): lower score is worse; among equal scores the larger payload is
  // worse (payload orders ascending in the result).
  private val ord: Ordering[(Double, UTF8String)] =
    new Ordering[(Double, UTF8String)] {
      override def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String)] =
    mutable.PriorityQueue.empty[(Double, UTF8String)](ord)

  private def insert(buf: mutable.PriorityQueue[(Double, UTF8String)],
                     s: Double, v: UTF8String): Unit = {
    if (buf.size < k) buf.enqueue((s, v))
    else {
      val worst = buf.head
      if (s > worst._1 || (s == worst._1 && v.compareTo(worst._2) < 0)) {
        buf.dequeue(); buf.enqueue((s, v))
      }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, UTF8String)],
                      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String)] = {
    val s = score.eval(input)
    val v = payload.eval(input)
    if (s != null && v != null)
      insert(buf, s.asInstanceOf[Double], v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, UTF8String)],
                     other: mutable.PriorityQueue[(Double, UTF8String)]): mutable.PriorityQueue[(Double, UTF8String)] = {
    other.foreach { case (s, v) => insert(buf, s, v) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String)]): Any = {
    val sorted = buf.toSeq.sorted(ord) // ord ascending = best first
    new GenericArrayData(sorted.map { case (s, v) =>
      InternalRow(s, v)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, v) =>
      out.writeDouble(s)
      val b = v.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((s, UTF8String.fromBytes(b)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1))
}

object AggFunctions {

  /** Bounded-heap grouped top-k: `array<struct<score, value>>` of the k
    * highest-scored payloads, score DESC / value ASC.
    */
  def topK(score: Column, payload: Column, k: Int): Column =
    Bridge.column(TopKByScore(
      Bridge.expression(score), Bridge.expression(payload), k)
      .toAggregateExpression())
}
