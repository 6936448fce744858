package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom filter as a mergeable `TypedImperativeAggregate` — the explicit
  * runtime-prefilter primitive for 100 TB semi-joins.
  *
  * The scale story: a semi-join "corpus ⋉ benchmark" shuffles EVERY
  * corpus-side row to its hash partition even though almost none of them
  * match. Building a bloom filter over the (small) build side and
  * applying `graft_bloom_contains` on the probe side BEFORE the join cuts
  * the shuffled volume to matches + false positives — the same idea as
  * Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` rewrite,
  * exposed as a first-class, composable aggregate so a pipeline can build
  * the filter once and reuse it across stages (Spark's injected version
  * is per-query and heuristic-gated).
  *
  * Correctness contract: a bloom filter has false positives but NEVER
  * false negatives, so `prefilter → exact join` is result-identical to
  * the plain join — queries stay exact-oracle-checkable while the plan
  * carries the prefilter.
  *
  * State is an `Array[Long]` bitset (`numBits/64` words): O(bits)
  * per-group state, map-side partial merge is a word-wise OR — exactly
  * the shape a shuffle-friendly aggregate needs. Inputs are pre-hashed
  * 60-bit longs (compose with [[HashFunctions.hash60]]); the k probe
  * positions derive from one multiply (Kirsch–Mitzenmacher double
  * hashing), so update cost is O(k) integer ops per row with no
  * allocation. Serialized form: 4-byte big-endian `numHashes` header +
  * big-endian words, self-describing for [[BloomMightContain]].
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 30),
    s"graft_bloom numBits must be a multiple of 64 in [64, 2^30], got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"graft_bloom numHashes must be in [1, 16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom requires a BIGINT (pre-hashed) argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val h1 = BloomAgg.mix1(h)
      val h2 = BloomAgg.mix2(h)
      var i = 0
      while (i < numHashes) {
        val bit = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
        buf(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](4 + buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(numHashes)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt() // numHashes — fixed by this instance, skip
    val words = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomAgg {

  /** Kirsch–Mitzenmacher probe bases. A bare multiply is NOT enough
    * here: `numBits` is a power of two, so `x mod numBits` keeps only
    * x's LOW bits, and a multiply leaves low output bits a function of
    * low input bits alone — the filter would degenerate to membership
    * on `h mod numBits` (measured: FP == n/numBits, 10× theory). The
    * xor-shift after the multiply (murmur3-finalizer style) folds the
    * high bits back down so every probe position sees all 60 input
    * bits. mix2 is forced odd so the probe stride never collapses
    * mod 2^k.
    */
  def mix1(h: Long): Long = {
    val z = h * 0xFF51AFD7ED558CCDL
    z ^ (z >>> 33)
  }

  def mix2(h: Long): Long = {
    val z = h * 0xC4CEB9FE1A85EC53L
    (z ^ (z >>> 33)) | 1L
  }

  /** Membership probe against the serialized filter. False positives
    * possible, false negatives never.
    */
  def mightContain(bytes: Array[Byte], h: Long): Boolean = {
    val numHashes = ((bytes(0) & 0xFF) << 24) | ((bytes(1) & 0xFF) << 16) |
      ((bytes(2) & 0xFF) << 8) | (bytes(3) & 0xFF)
    val numBits = (bytes.length - 4).toLong * 8L
    val h1 = mix1(h)
    val h2 = mix2(h)
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      val byteIdx = 4 + (bit >>> 6) * 8 + (7 - ((bit & 63) >>> 3))
      if ((bytes(byteIdx) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `graft_bloom_contains(filter, hashed)` — codegen'd membership probe;
  * sits in the probe side's scan-stage Filter, inside whole-stage
  * codegen, upstream of the join Exchange.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires (BINARY, BIGINT), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(f: Any, h: Any): Any =
    BloomAgg.mightContain(f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (f, h) => s"graft.functions.BloomAgg.mightContain($f, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {

  /** Bloom filter aggregate over a pre-hashed 60-bit long column. Size
    * `numBits` to the build side: ~10 bits/element ≈ 1% false positives
    * with numHashes=7; FP rate only costs prefilter selectivity, never
    * correctness.
    */
  def bloomAgg(hashed: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(BloomAgg(Bridge.expression(hashed), numBits, numHashes)
      .toAggregateExpression())

  /** Membership probe against a [[bloomAgg]] result. */
  def bloomContains(filter: Column, hashed: Column): Column =
    Bridge.column(BloomMightContain(
      Bridge.expression(filter), Bridge.expression(hashed)))
}
