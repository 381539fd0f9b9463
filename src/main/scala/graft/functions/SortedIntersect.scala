package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** |A ∩ B| for two SORTED array<long> columns via linear merge — a custom
  * codegen'd Expression for the hot inner loop of pairwise set-similarity
  * joins (n-gram Jaccard, shingle verification).
  *
  * Spark's `array_intersect` builds a boxed hash set per invocation; inside
  * a join condition that is evaluated for every candidate pair, which
  * measured ~50 µs/pair on ~300-element gram sets. The merge walk is O(n)
  * over primitive longs with zero allocation (~1 µs/pair), and inputs are
  * sorted once per ROW upstream (sort_array), not once per PAIR.
  */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersect.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity |A∩B|/|A∪B| of two SORTED, DISTINCT array<long>
  * columns, fused into a single expression: one merge walk computes the
  * intersection count and the sizes come from the array lengths, so a
  * similarity-join condition costs exactly one O(n) pass per pair. The
  * division is `(double)c / (na + nb - c)` — bit-identical to the SQL
  * oracle's CAST(len(...) AS DOUBLE) arithmetic.
  */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaccard_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersect.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSortedExpr =
    copy(left = newLeft, right = newRight)
}

/** `jaccard_sorted(a, b) >= t` as one EARLY-EXIT merge: the walk bails the
  * moment the optimistic completion (current matches + all remaining
  * elements of the shorter side) can no longer reach the threshold —
  * background-similarity pairs in a dense corpus reject partway through
  * instead of paying the full merge. Decision semantics are EXACTLY the
  * double comparison `c/(na+nb-c) >= t`: the bail bound is slacked one
  * full intersection unit below the boundary (an integer step in c moves
  * Jaccard by ≥ 1/|A∪B| ≫ one ulp, so float rounding can never cross it),
  * and any pair that survives the walk is decided by the exact division.
  */
case class JaccardSortedGeExpr(
    left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "jaccard_sorted_ge"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.jaccardGe(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersect.jaccardGe($a, $b, ${threshold}D)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSortedGeExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {

  /** Linear merge count; both inputs must be sorted ascending. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectSizeExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** One-pass Jaccard over sorted distinct long arrays. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val c = count(a, b)
    val union = a.numElements() + b.numElements() - c
    if (union == 0) 0.0 else c.toDouble / union.toDouble
  }

  def jaccard_sorted(a: Column, b: Column): Column =
    GraftShims.column(JaccardSortedExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Early-exit `jaccard >= t`; see [[JaccardSortedGeExpr]]. */
  def jaccardGe(a: ArrayData, b: ArrayData, t: Double): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    // c/(na+nb-c) >= t  <=>  c >= t*(na+nb)/(1+t); slack one unit so the
    // bail can never reject a pair the exact double comparison accepts
    val minNeeded = math.floor(t * (na + nb) / (1.0 + t)).toInt - 1
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val rem = if (na - i < nb - j) na - i else nb - j
      if (c + rem < minNeeded) return false
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - c
    if (union == 0) 0.0 >= t else c.toDouble / union.toDouble >= t
  }

  def jaccard_sorted_ge(a: Column, b: Column, t: Double): Column =
    GraftShims.column(JaccardSortedGeExpr(
      GraftShims.expression(a), GraftShims.expression(b), t))
}
