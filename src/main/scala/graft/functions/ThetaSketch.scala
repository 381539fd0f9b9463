package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-set aggregate (Dasgupta, Lang, Rhodes, Thorup —
  * "theta sketch framework", KDD'16; org.apache.datasketches on the Spark
  * classpath) as a native `TypedImperativeAggregate` — the SET-ALGEBRA
  * sibling of the built-in HLL family (`hll_sketch_agg` can union but
  * never intersect: HLL registers carry no per-element evidence, theta's
  * retained-hash-set does).
  *
  * Why it matters at 100 TB: "how many users/docs are in BOTH corpora"
  * is the planning question behind cross-corpus dedup
  * ([[graft.operators.Dedup.crossCorpus]]) and benchmark-contamination
  * triage ([[graft.operators.TextAnalysis.contamination]]) — answered
  * exactly it costs a full shuffle-join of both key sets; answered with
  * theta sketches it costs one scan per side into a ≤(16·2^lgK)-byte
  * summary, then driver-side set algebra. Sketches are mergeable
  * map-side (union is associative/commutative), so each corpus partition
  * contributes a bounded partial and the reducer sees sketch-sized
  * state regardless of corpus size — and a PERSISTED per-partition
  * sketch table supports incremental overlap tracking without
  * rescanning history (same lifecycle as the persisted IVF index).
  *
  * Determinism contract (what lets the DuckDB oracle hash-match):
  * below ~2^lgK distinct keys the sketch is in EXACT mode — theta = 1,
  * the retained set is the full murmur-hash image of the key set, and
  * estimate ≡ true cardinality for ANY update/merge order. The
  * registered queries keep lgK sized so the driver corpus stays exact;
  * in estimation mode results remain correct within the published
  * bounds but are merge-order-sensitive, so specs assert error bounds
  * there instead of equality.
  *
  * Input is canonicalized to the UTF-8 string image of the value
  * (`update(String)`), so `1L` and `"1"` sketch identically — matching
  * how the oracle's `COUNT(DISTINCT CAST(k AS VARCHAR))` would see it.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {
  require(lgK >= 4 && lgK <= 26, "lgK must be in [4, 26]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Union-merge an entire COLUMN of serialized theta sketches into one —
  * the aggregate that makes a PERSISTED theta census incremental: daily
  * per-group sketch rows fold into coarser groups (or a global row)
  * without ever rescanning the corpus that built them, exactly like
  * `hll_union_agg` for the HLL census. Same exactness contract as
  * [[ThetaSketchAgg]]: with lgK matching the inputs' build size, exact
  * mode survives the merge (union downsampling is sized away).
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {
  require(lgK >= 4 && lgK <= 26, "lgK must be in [4, 26]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(CompactSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** Rounded cardinality estimate of a serialized theta sketch — exact-mode
  * sketches round to the true count. Interpreted eval only: runs on
  * sketch-cardinality rows (one per group), never per corpus row, so
  * codegen would buy nothing.
  */
case class ThetaEstimateExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(input: Any): Any =
    Math.round(CompactSketch
      .heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      .getEstimate)
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimateExpr =
    copy(child = newChild)
}

/** A ∩ B of two serialized theta sketches, as a serialized sketch —
  * composable with [[ThetaEstimateExpr]] and [[ThetaUnionExpr]].
  * Intersection never downsamples (its result theta is the min of the
  * input thetas; the retained set only shrinks), so no nominal-entry
  * sizing is needed here — exact inputs give an exact intersection.
  */
case class ThetaIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(CompactSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    inter.intersect(CompactSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    inter.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** A ∪ B of two serialized theta sketches, as a serialized sketch.
  *
  * `lgK` MUST match the nominal entries the input sketches were built
  * with: a DataSketches Union DOWNSAMPLES when its retained entries
  * exceed its own nominal entries, so a default-sized (lgK 12) union of
  * two exact lgK-16 sketches would silently degrade the documented
  * "exact below 2^lgK" contract to an estimate. [[ThetaSketch.theta_union]]
  * threads the caller's lgK through; [[graft.operators.Census.overlap]]
  * passes the same lgK it aggregated with.
  */
case class ThetaUnionExpr(left: Expression, right: Expression, lgK: Int)
    extends BinaryExpression with CodegenFallback {
  require(lgK >= 4 && lgK <= 26, "lgK must be in [4, 26]")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    u.union(CompactSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    u.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionExpr =
    copy(left = newLeft, right = newRight)
}

object ThetaSketch {
  /** Aggregate column: theta sketch (serialized compact image) of the
    * group's distinct values. lgK 12 → ≤4096 retained hashes ≈ 32 KiB
    * cap per group; exact below 4096 distinct.
    */
  def theta_sketch(c: Column, lgK: Int = 12): Column =
    GraftShims.column(
      ThetaSketchAgg(GraftShims.expression(c), lgK).toAggregateExpression())

  def theta_estimate(c: Column): Column =
    GraftShims.column(ThetaEstimateExpr(GraftShims.expression(c)))

  def theta_intersect(a: Column, b: Column): Column =
    GraftShims.column(
      ThetaIntersectExpr(GraftShims.expression(a), GraftShims.expression(b)))

  /** `lgK` must match the build size of the input sketches (union
    * downsampling otherwise degrades exact mode — see [[ThetaUnionExpr]]).
    */
  def theta_union(a: Column, b: Column, lgK: Int = 12): Column =
    GraftShims.column(
      ThetaUnionExpr(GraftShims.expression(a), GraftShims.expression(b), lgK))

  /** Aggregate: union a column of serialized sketches into one. */
  def theta_union_agg(c: Column, lgK: Int = 12): Column =
    GraftShims.column(
      ThetaUnionAgg(GraftShims.expression(c), lgK).toAggregateExpression())
}
