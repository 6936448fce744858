package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expressions for the vector hot loops.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a dot
  * product declaratively but evaluate the lambda INTERPRETED, one function
  * call per element — measurably slow when the expression sits inside an
  * O(candidate-pairs) similarity join. [[DotProduct]] is the custom
  * `Expression` escape hatch the design reserves for exactly this case: a
  * `doGenCode` that compiles to a tight primitive `for` loop inside
  * whole-stage codegen, with semantics identical to the sequential
  * left-to-right double fold (same IEEE operation order, so results are
  * bit-identical to the HOF form and to the DuckDB oracle's
  * `list_reduce`).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      case e => e.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two ARRAY<INT> columns (int8/SQ8 code
  * vectors), accumulated in a primitive long — the scoring kernel of the
  * scalar-quantized ANN path. Unlike [[DotProduct]] there is no float
  * rounding anywhere: the result is EXACT for any code range whose
  * products sum below 2^63, so on EQUAL-LENGTH inputs quantized
  * similarity scores hash-compare across engines and partitionings.
  * Ragged inputs truncate to the shorter length (matching
  * [[DotProduct]]'s convention) — but note a SQL twin that indexes past
  * the shorter list returns NULL instead, so callers must guarantee
  * equal dimensions (true for any single-corpus quantization, where
  * every code vector comes from the same embedding column).
  */
case class DotProductInt(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      case e => e.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_int requires two ARRAY<INT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot_int"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getInt(i).toLong * y.getInt(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (long) $a.getInt($i) * $b.getInt($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment: argmin over squared euclidean distance
  * from `vector` to each row of a (plan-time literal) centroid matrix,
  * returning the index-aligned cell id; ties go to the first (= lowest,
  * callers pass cell-sorted literals) index via strict `<`. This is the
  * IVF cell-assignment kernel as a codegen'd `Expression` instead of a
  * per-row Scala UDF: the k×dim argmin loop compiles into whole-stage
  * codegen with no Seq boxing per row, vectorizing the index build for
  * large corpora. The arithmetic (`t = v(i) - c(i); d += t*t`, ascending
  * scan, strict improvement) is operation-for-operation the shape the
  * previous UDF used, so existing index layouts re-assign identically.
  */
case class NearestCentroid(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_nearest_centroid requires (ARRAY<DOUBLE>, ARRAY<INT>, " +
        s"ARRAY<ARRAY<DOUBLE>>), got ${first.dataType.sql}, " +
        s"${second.dataType.sql}, ${third.dataType.sql}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(v: Any, cells: Any, cents: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val ids = cells.asInstanceOf[ArrayData]
    val m = cents.asInstanceOf[ArrayData]
    // Fail loud on a vector shorter than the centroid dimension:
    // ArrayData.getDouble past numElements() is an unchecked read on
    // unsafe rows — a malformed row would get a silently arbitrary cell
    // (and eval/codegen could even disagree) instead of failing the
    // index build. Centroids all share one dimension; check once.
    if (m.numElements() > 0 && x.numElements() < m.getArray(0).numElements())
      throw new IllegalArgumentException(
        s"graft_nearest_centroid: vector has ${x.numElements()} dims, " +
          s"centroids have ${m.getArray(0).numElements()}")
    // Fail loud on a null COMPONENT too: the type check accepts
    // ARRAY<DOUBLE> with containsNull=true (real frames usually carry
    // it), but getDouble on a null element reads 0.0 from unsafe rows —
    // a silently-wrong cell instead of a failed build. One scan of the
    // needed prefix per row, not per centroid.
    val dim = if (m.numElements() > 0) m.getArray(0).numElements() else 0
    var p = 0
    while (p < dim) {
      if (x.isNullAt(p)) throw new IllegalArgumentException(
        s"graft_nearest_centroid: vector has a null component at index $p")
      p += 1
    }
    var best = -1
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < m.numElements()) {
      val c = m.getArray(j)
      var d = 0.0
      var i = 0
      while (i < c.numElements()) {
        val t = x.getDouble(i) - c.getDouble(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = ids.getInt(j) }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cells, cents) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($cents.numElements() > 0 &&
         |    $v.numElements() < $cents.getArray(0).numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_nearest_centroid: vector has " + $v.numElements() +
         |    " dims, centroids have " + $cents.getArray(0).numElements());
         |}
         |for (int $i = 0; $i < ($cents.numElements() > 0 ?
         |    $cents.getArray(0).numElements() : 0); $i++) {
         |  if ($v.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "graft_nearest_centroid: vector has a null component at index "
         |      + $i);
         |  }
         |}
         |${ev.value} = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < $cents.numElements(); $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($j);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $c.numElements(); $i++) {
         |    double $t = $v.getDouble($i) - $c.getDouble($i);
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; ${ev.value} = $cells.getInt($j); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorFunctions {

  /** Codegen'd dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd exact integer dot product of two int arrays. */
  def dotInt(a: Column, b: Column): Column =
    Bridge.column(DotProductInt(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd nearest-centroid cell assignment against a plan-time
    * centroid model: the (cell, centroid) pairs become two index-aligned
    * LITERALS (cell-sorted, so strict-`<` argmin ties resolve to the
    * lowest cell id), and the per-row work is one generated k×dim loop.
    */
  def nearestCentroid(v: Column,
                      centroids: Array[(Int, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    val cellsLit = Literal.create(sorted.map(_._1).toSeq,
      ArrayType(IntegerType, containsNull = false))
    val centLit = Literal.create(sorted.map(_._2.toSeq).toSeq,
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false))
    Bridge.column(NearestCentroid(Bridge.expression(v), cellsLit, centLit))
  }

  /** Cosine similarity in the pinned shape dot/(sqrt(na)*sqrt(nb)) over
    * the codegen'd [[DotProduct]] — value-identical to
    * [[graft.llm.Similarity.cosine]], several times faster per pair.
    */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
