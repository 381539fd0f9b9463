package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector arithmetic for the similarity operators.
  *
  * The composable forms (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) are
  * higher-order functions — CodegenFallback, interpreted, with per-element
  * lambda dispatch and boxing. On pairwise workloads (400k pairs × 64 dims)
  * that interpretive overhead dominated entire queries. These expressions
  * run the same arithmetic in one codegen'd loop.
  *
  * Determinism contract (oracle parity): identical operation ORDER to the
  * HOF forms and to DuckDB's sequential loops — left-to-right accumulate,
  * float→double widening before any arithmetic — so scores are
  * bit-identical across formulations.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Exact squared L2 distance between two array<long> vectors (→ long).
  *
  * Integer-quantized geometry (clustering, IVF training) needs distances
  * that hash-match a SQL oracle exactly; doubles can't promise that across
  * engines, longs can. Same codegen'd-loop rationale as [[DotProductExpr]] —
  * this sits inside the per-iteration assignment scan of Lloyd's k-means,
  * k× per row, so interpreted HOF dispatch would dominate.
  */
case class SqDistLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_l2sq_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.sqDistLong($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLongExpr =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product between two array<long> vectors (→ long).
  * Companion to [[SqDistLongExpr]]: the quantized-cosine predicate of the
  * integer-exact SemDeDup pass compares `den²·dot²` against `num²·|a|²·|b|²`
  * entirely in longs, so the near-dup decision is bit-identical in any
  * engine (no float threshold boundary).
  */
case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotLong($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize an array<float> or array<double> into a unit array<double>. */
case class UnitizeExpr(child: Expression) extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"unitize expects array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_unit"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (isFloat) VectorOps.unitFromFloat(a) else VectorOps.unitFromDouble(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isFloat) "unitFromFloat" else "unitFromDouble"
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.$m($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnitizeExpr =
    copy(child = newChild)
}

/** PQ nearest-code argmin: subvector (array<long>, d elements) against a
  * FLAT codebook (array<long>, k·d elements, row-major) → the int code j
  * minimizing (‖sv − cb[j]‖², j) — ties take the LOWEST j (first strict
  * improvement wins), matching the oracle's `ORDER BY dist, j`.
  *
  * Why an expression: the unrolled alternative (array_min over k inlined
  * struct(dist, j) subtrees) generates O(k·d) Java per subspace — at
  * 8 subspaces × 64 codes Janino hits the 64 KB method limit and
  * whole-stage codegen silently falls back to interpreted. This loops in
  * ONE call whose generated code is constant-size in k, keeping PQ
  * training/encoding scans inside codegen at any codebook size.
  */
case class NearestCodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_nearest_code"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.nearestCode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.nearestCode($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCodeExpr =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // loud failure beats a silently-truncated projection (a dimension
    // mismatch upstream would otherwise just degrade ranking quality)
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot dimension mismatch: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot_long dimension mismatch: $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vec_l2sq_long dimension mismatch: $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  def unitFromFloat(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val d = new Array[Double](n)
    var i = 0
    while (i < n) { d(i) = a.getFloat(i).toDouble; i += 1 }
    unit(d)
  }

  def unitFromDouble(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val d = new Array[Double](n)
    var i = 0
    while (i < n) { d(i) = a.getDouble(i); i += 1 }
    unit(d)
  }

  private def unit(d: Array[Double]): ArrayData = {
    var s = 0.0
    var i = 0
    while (i < d.length) { s += d(i) * d(i); i += 1 }
    val norm = math.sqrt(s)
    // loud failure, matching vec_dot's dimension-mismatch policy: an
    // all-zero embedding would otherwise yield NaN components and NaN
    // cosines that silently poison every downstream top-k ranking
    if (norm == 0.0)
      throw new IllegalArgumentException(
        "vec_unit: zero vector has no direction (all-zero embedding upstream)")
    i = 0
    while (i < d.length) { d(i) = d(i) / norm; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(d)
  }

  def vec_dot(a: Column, b: Column): Column =
    GraftShims.column(DotProductExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  def vec_unit(a: Column): Column =
    GraftShims.column(UnitizeExpr(GraftShims.expression(a)))

  def vec_l2sq_long(a: Column, b: Column): Column =
    GraftShims.column(SqDistLongExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  def vec_dot_long(a: Column, b: Column): Column =
    GraftShims.column(DotLongExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** [[NearestCodeExpr]] helper: flat row-major codebook, k = flat/d. */
  def nearestCode(sv: ArrayData, flat: ArrayData): Int = {
    val d = sv.numElements()
    if (d == 0 || flat.numElements() % d != 0)
      throw new IllegalArgumentException(
        s"vec_nearest_code: codebook size ${flat.numElements()}" +
          s" not a multiple of subvector dim $d")
    val k = flat.numElements() / d
    if (k == 0)
      throw new IllegalArgumentException(
        "vec_nearest_code: empty codebook")
    var best = 0L
    var bestJ = -1
    var j = 0
    while (j < k) {
      var acc = 0L
      var i = 0
      while (i < d) {
        val diff = sv.getLong(i) - flat.getLong(j * d + i)
        acc += diff * diff
        i += 1
      }
      if (bestJ < 0 || acc < best) { best = acc; bestJ = j }
      j += 1
    }
    bestJ
  }

  def vec_nearest_code(sv: Column, flatCodebook: Column): Column =
    GraftShims.column(NearestCodeExpr(
      GraftShims.expression(sv), GraftShims.expression(flatCodebook)))
}
