package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items sketch (Anderson, Bergen, Lang et al. — Misra–Gries /
  * SpaceSaving lineage, `org.apache.datasketches.frequencies` on the
  * Spark classpath) as a native `TypedImperativeAggregate` — the
  * HEAVY-HITTER member of the census-sketch family (HLL = how many
  * distinct, theta = how many shared, KLL = how distributed, freq = WHO
  * dominates).
  *
  * Why it matters at 100 TB: "top terms over all history" via exact
  * counting is a vocabulary-sized shuffle PER QUESTION over an
  * ever-growing corpus. A persisted frequent-items census bounds state
  * to `maxMapSize` counters per group regardless of vocabulary: each
  * delta is one scan of the new rows, merges are associative (counter
  * add + deterministic purge), and every "which items exceed
  * threshold" question runs on census rows alone with the sketch's
  * published guarantee — NO FALSE NEGATIVES above
  * `getMaximumError`: any item whose true count exceeds the threshold
  * plus maxError is reported, and every reported estimate brackets its
  * true count in [lowerBound, upperBound].
  *
  * Determinism contract: the sketch is purely counter arithmetic — no
  * randomness anywhere. While the number of distinct items a sketch
  * (or merge of sketches) has absorbed stays under its purge point
  * (~0.75 · maxMapSize), NO eviction happens, `getMaximumError` is 0,
  * and every estimate IS the exact count for ANY update/merge order —
  * the hash-matchable exact mode the registered query runs in (theta's
  * contract, applied to counts). Past the purge point, eviction order
  * depends on stream order, so results are order-sensitive but still
  * within the published bounds — specs assert the bounds there, not
  * equality.
  *
  * Input canonicalized to the UTF-8 string image (like
  * [[ThetaSketchAgg]]). Exactly-once note: counting algebra — a
  * replayed delta double-counts, so the persisted lifecycle's batchId
  * guard ([[graft.sinks.Sink.mergeFreqCensusTable]]) is load-bearing
  * with no idempotence backstop, same as the KLL census.
  *
  * Relation to the in-repo Misra–Gries aggregate ([[FreqSketchAgg]],
  * used by `TextAnalysis.heavyHitters` / `StreamHeavyHitters`): that
  * one DECODES to its report array at eval — right for one-shot
  * in-plan reports, but its output can't be stored and re-merged. This
  * one evals to the SERIALIZED sketch, which is what a persisted,
  * incrementally-maintained census table needs (fold deltas forever,
  * decode only at question time via [[FreqItemsListExpr]]), and carries
  * two-sided (lb, ub) brackets plus the exact stream length where MG
  * tracks a single one-sided error term.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of 2, >= 8")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_items_sketch"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(
      b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] =
    b1.merge(b2)

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}

/** Merge an entire COLUMN of serialized frequent-items sketches into
  * one — the roll-up aggregate of the persisted heavy-hitter census.
  * The result's error budget is bounded by the sum of the inputs'
  * maxErrors plus any purges the merge itself forces; in exact mode
  * (every input exact, union of actives fits) the merge is exact for
  * any order.
  */
case class FreqItemsMergeAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of 2, >= 8")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_items_merge_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe))
    buf
  }

  override def merge(
      b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] =
    b1.merge(b2)

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsMergeAgg =
    copy(child = newChildren.head)
}

/** All tracked items of a serialized frequent-items sketch under the
  * NO_FALSE_NEGATIVES policy (threshold = the sketch's own maxError:
  * everything that could possibly matter), as
  * `array<struct<item, est, lb, ub>>` sorted (est desc, item) —
  * deterministic given the sketch bytes. Callers apply their own
  * `est >= T` cut in-plan, which in exact mode (maxError 0 ⇒ est ≡
  * true count) makes the threshold semantics exactly theirs.
  * Interpreted eval only: runs on census rows, never per corpus row.
  */
case class FreqItemsListExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_items"
  override protected def nullSafeEval(input: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe)
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map { r =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.getItem),
          r.getEstimate, r.getLowerBound, r.getUpperBound))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(newChild: Expression): FreqItemsListExpr =
    copy(child = newChild)
}

/** Exact total stream length of a serialized frequent-items sketch —
  * a summed counter, deterministic through any merge tree (the census's
  * saw-every-row-once proof, like [[KllNExpr]]).
  */
case class FreqItemsLenExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_items_len"
  override protected def nullSafeEval(input: Any): Any =
    ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]),
      new ArrayOfStringsSerDe).getStreamLength
  override protected def withNewChildInternal(
      newChild: Expression): FreqItemsLenExpr =
    copy(child = newChild)
}

/** The sketch's maximum estimation error (0 ⇔ exact mode: no purge has
  * ever happened and every estimate is the true count) — the in-plan
  * witness the oracle-checked query pins to assert it ran exact.
  */
case class FreqItemsMaxErrExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_items_max_error"
  override protected def nullSafeEval(input: Any): Any =
    ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]),
      new ArrayOfStringsSerDe).getMaximumError
  override protected def withNewChildInternal(
      newChild: Expression): FreqItemsMaxErrExpr =
    copy(child = newChild)
}

object FreqItemsSketch {
  /** Aggregate: frequent-items sketch (serialized) of the group's
    * values. State ≤ maxMapSize counters; exact while distinct items
    * stay under the purge point (~0.75 · maxMapSize), no-false-negative
    * bounded-error beyond.
    */
  def freq_items_sketch(c: Column, maxMapSize: Int = 1024): Column =
    GraftShims.column(
      FreqItemsAgg(GraftShims.expression(c), maxMapSize)
        .toAggregateExpression())

  /** Aggregate: merge a column of serialized freq sketches into one. */
  def freq_items_merge_agg(c: Column, maxMapSize: Int = 1024): Column =
    GraftShims.column(
      FreqItemsMergeAgg(GraftShims.expression(c), maxMapSize)
        .toAggregateExpression())

  def freq_items(sk: Column): Column =
    GraftShims.column(FreqItemsListExpr(GraftShims.expression(sk)))

  def freq_items_len(sk: Column): Column =
    GraftShims.column(FreqItemsLenExpr(GraftShims.expression(sk)))

  def freq_items_max_error(sk: Column): Column =
    GraftShims.column(FreqItemsMaxErrExpr(GraftShims.expression(sk)))
}
