package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** HyperLogLog sketch as a mergeable `TypedImperativeAggregate` — the
  * custom-sketch slot SURVEY §4 reserves beyond `approx_count_distinct`.
  *
  * Distinct-count state at 100 TB must be O(registers), shuffle-friendly
  * (map-side partial merge), and mergeable across shards/days — exactly a
  * register array with elementwise max. 2^p byte registers; update is one
  * bucket/rank computation per row on an ALREADY-HASHED 60-bit input
  * (compose with [[HashFunctions.hash60]] / `graft_hash60`).
  *
  * Unlike the built-in HLL++, every arithmetic step here is DETERMINISTIC
  * AND ENGINE-PORTABLE, so the estimate is exactly reproducible in the
  * DuckDB oracle:
  *   - bucket = top p bits of the 60-bit hash; rank = leading-zero count
  *     of the remaining 60-p bits + 1 (pure integer bit math);
  *   - the harmonic sum Σ 2^(-M_j) is computed EXACTLY as the integer
  *     Σ 2^(62 - M_j) (BigInt; the oracle uses HUGEINT) — no
  *     floating-point accumulation order to disagree on;
  *   - the estimate is the raw HLL formula α·m²·2^62 / S evaluated in a
  *     pinned left-to-right double sequence;
  *   - the small-range regime (raw ≤ 2.5·m, where the raw estimator
  *     floors at ~α·m) applies the standard linear-counting correction
  *     m·ln(m/V) from the exact zero-register count V. The branch
  *     condition and V are exact integer/pinned-double ops; the log is
  *     `StrictMath.log` (fdlibm — bit-pinned across JVMs). CAVEAT: a
  *     C-libm engine's `ln` may differ from fdlibm in the last ulp, so
  *     the RAW ln value is guaranteed portable only OUTSIDE the
  *     correction regime (n ≳ 2.5·m). GUARD: the correction branch
  *     therefore rounds to 1e-6 by default (`portableRound`) in the
  *     pinned sequence `floor(x·1e6 + 0.5) / 1e6` — an oracle replicating
  *     that exact sequence (DuckDB `floor(x * 1e6 + 0.5) / 1e6`)
  *     hash-matches unless the two lns straddle a floor boundary within
  *     one ulp (~1e-16 relative: negligible, and the only residual
  *     caveat). `portableRound = false` recovers the unrounded estimate
  *     for callers that want full precision and accept rows-only checks.
  *     The raw regime is bit-exact either way and never rounded.
  */
case class HllSketch(
    child: Expression,
    p: Int,
    portableRound: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"graft_hll precision must be in [4, 16], got $p")

  private val m = 1 << p
  private val windowBits = 60 - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll requires a BIGINT (pre-hashed) argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> windowBits).toInt & (m - 1)
      val w = h & ((1L << windowBits) - 1)
      // rank: leading zeros within the windowBits-wide field, + 1.
      val rank =
        if (w == 0) windowBits + 1
        else windowBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // Exact integer harmonic sum at scale 2^(62-p): Σ 2^(62-p-M_j).
    // M_j ≤ windowBits+1 = 61-p so every term is an integer ≥ 2, and the
    // m = 2^p empty-register terms cap the total at 2^62 — exact in a
    // signed long for every p, no floating-point accumulation order to
    // disagree on (the oracle sums the same integers).
    val scaleBits = 62 - p
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      s += 1L << (scaleBits - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    // Pinned double sequence: ((alpha * m²) * 2^(62-p)) / S.
    val raw = ((HllSketch.alpha(m) * (m.toDouble * m.toDouble)) *
      (1L << scaleBits).toDouble) / s.toDouble
    // Linear-counting correction (see class doc for the portability
    // boundary): without it a group with 5 distinct values reports ~α·m
    // (~184 at p=8). The default 1e-6 rounding keeps the corrected value
    // inside the exact-hash regime (fdlibm-vs-libm last-ulp noise cannot
    // survive it away from a floor boundary).
    if (raw <= 2.5 * m && zeros > 0) {
      val lc = m.toDouble * StrictMath.log(m.toDouble / zeros.toDouble)
      if (portableRound) StrictMath.floor(lc * 1e6 + 0.5) / 1e6 else lc
    } else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllSketch {

  /** Standard HLL alpha constant for m registers (m >= 16). The oracle
    * embeds `alpha(m).toString` so both engines use the identical double.
    */
  def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)
}

object SketchFunctions {

  /** HLL distinct-count estimate over a pre-hashed 60-bit long column.
    * `portableRound` (default true) rounds the linear-counting branch to
    * 1e-6 so small-cardinality groups stay safe in exact-hash oracles;
    * the oracle twin for that branch is
    * `floor(m * ln(m / V) * 1e6 + 0.5) / 1e6`.
    */
  def hllEstimate(hashed: Column, p: Int, portableRound: Boolean = true): Column =
    Bridge.column(HllSketch(Bridge.expression(hashed), p, portableRound)
      .toAggregateExpression())
}
