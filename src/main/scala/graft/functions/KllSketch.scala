package graft.functions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin, Lang, Liberty — "Optimal quantile
  * approximation in streams", FOCS'16; `org.apache.datasketches.kll` on
  * the Spark classpath) as a native `TypedImperativeAggregate` — the
  * QUANTILE member of the census-sketch family (HLL = how many
  * distinct, theta = how many shared, KLL = how are values
  * DISTRIBUTED).
  *
  * Why it matters at 100 TB: `percentile_approx` answers "p99 of this
  * scan", but re-answers it from scratch on every query — over
  * append-only history that is a full rescan per question. A persisted
  * per-(group, day) KLL census makes percentile tracking incremental
  * exactly like the HLL distinct census: appending a day costs one scan
  * of that day into KiB-per-group summaries, and any roll-up (coarser
  * groups, longer horizons, global) plus every quantile/rank/CDF
  * question — including two-sample distribution-DRIFT tests
  * ([[KllKsExpr]]) — runs on census rows alone. Sketches merge
  * associatively map-side, so reducer state is sketch-sized (~3 KiB at
  * k=200) regardless of group row count.
  *
  * Operates on the repo-standard integer lattice (`LongType` — put
  * fractional values on a cents/ppm lattice upstream), so quantile
  * ESTIMATES are themselves lattice points.
  *
  * Determinism contract (vs the HLL/theta siblings — weaker, and the
  * registered query is shaped around it): KLL compaction flips a random
  * coin per level compaction, so two builds over the same rows can
  * retain different items. What IS deterministic and exact regardless:
  * `getN` (a summed counter — the census proves it saw every row
  * exactly once through any merge tree), min/max items, and the
  * published rank-error bound (≤ ~1.65%/√(k/200) with 99% confidence,
  * merge-insensitive). Oracle-checked outputs therefore hash on exact
  * quantities (n, corpus-derived ranks) and pin tolerance BOOLEANS on
  * the estimates, the `census_distinct_sketch` pattern.
  *
  * Exactly-once note for the persisted lifecycle: unlike HLL/theta
  * union (register/retained-set max — idempotent), KLL merge is
  * COUNTING algebra: merging the same delta twice double-counts n.
  * The generation-commit batchId guard
  * ([[graft.sinks.Sink.mergeKllCensusTable]]) is therefore load-bearing
  * on its own, with no algebraic backstop — spec-demonstrated both ways.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllLongsSketch] {
  require(k >= 8 && k <= 65535, "k must be in [8, 65535]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KllLongsSketch, b2: KllLongsSketch): KllLongsSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllLongsSketch = {
    val s = KllLongsSketch.newHeapInstance(k)
    s.merge(KllLongsSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Merge an entire COLUMN of serialized KLL sketches into one — the
  * roll-up aggregate of the persisted quantile census: daily per-group
  * sketch rows fold to coarser groups (or one global row) without
  * rescanning the rows that built them. `k` caps the result's accuracy;
  * inputs built at a smaller k dominate (KLL merge takes the min k).
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllLongsSketch] {
  require(k >= 8 && k <= 65535, "k must be in [8, 65535]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllLongsSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: KllLongsSketch, b2: KllLongsSketch): KllLongsSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllLongsSketch = {
    val s = KllLongsSketch.newHeapInstance(k)
    s.merge(KllLongsSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** Quantile estimate (INCLUSIVE criteria — the value whose rank is the
  * smallest ≥ the target) of a serialized KLL sketch at `rankPpm`
  * (rank on the ppm lattice, 0..1000000). Null for an empty sketch.
  * Interpreted eval only: runs on census rows (one per group·rank),
  * never per corpus row.
  */
case class KllQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // returns null on an EMPTY sketch regardless of child nullability —
  // sketch columns from KllSketchAgg are non-nullable, and inheriting
  // their nullable=false would let the optimizer mis-prune / codegen
  // read garbage for all-null groups
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"
  override protected def nullSafeEval(sk: Any, rankPpm: Any): Any = {
    val s = KllLongsSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else s.getQuantile(rankPpm.asInstanceOf[Long].toDouble / 1e6, INCLUSIVE)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}

/** Estimated rank (ppm, INCLUSIVE — fraction of the stream ≤ value) of
  * `value` in a serialized KLL sketch. Null for an empty sketch.
  */
case class KllRankExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // null on an empty sketch — see KllQuantileExpr.nullable
  override def nullable: Boolean = true
  override def prettyName: String = "kll_rank"
  override protected def nullSafeEval(sk: Any, value: Any): Any = {
    val s = KllLongsSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else Math.round(s.getRank(value.asInstanceOf[Long], INCLUSIVE) * 1e6)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRankExpr =
    copy(left = newLeft, right = newRight)
}

/** Exact stream length of a serialized KLL sketch — a summed counter,
  * deterministic through ANY merge tree (unlike the retained items):
  * the census's proof it saw every row exactly once, and the
  * hash-matchable spine of the oracle-checked quantile-census query.
  */
case class KllNExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"
  override protected def nullSafeEval(input: Any): Any =
    KllLongsSketch.heapify(
      Memory.wrap(input.asInstanceOf[Array[Byte]])).getN
  override protected def withNewChildInternal(newChild: Expression): KllNExpr =
    copy(child = newChild)
}

/** Two-sample Kolmogorov–Smirnov statistic (ppm) between two serialized
  * KLL sketches — distribution DRIFT measured from census rows alone
  * (reference window vs live window, corpus A vs corpus B) with the
  * corpora never rescanned and never joined.
  *
  * Both estimated CDFs are step functions, so the supremum over all
  * reals is attained at a step point; evaluating |rankA − rankB| at the
  * union of both sketches' 1/256-grid quantiles bounds the grid miss by
  * ~1/256 of rank on each side, well inside the sketches' own
  * rank-error budget (callers size tolerances to ε_A + ε_B + 2/256).
  * Null if either sketch is empty.
  */
case class KllKsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // null when either sketch is empty — see KllQuantileExpr.nullable
  override def nullable: Boolean = true
  override def prettyName: String = "kll_ks"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = KllLongsSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = KllLongsSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    if (sa.isEmpty || sb.isEmpty) null
    else {
      val ranks = (0 to 256).map(_.toDouble / 256).toArray
      val points = (sa.getQuantiles(ranks, INCLUSIVE) ++
        sb.getQuantiles(ranks, INCLUSIVE)).distinct
      var ks = 0.0
      var i = 0
      while (i < points.length) {
        val d = Math.abs(
          sa.getRank(points(i), INCLUSIVE) - sb.getRank(points(i), INCLUSIVE))
        if (d > ks) ks = d
        i += 1
      }
      Math.round(ks * 1e6)
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllKsExpr =
    copy(left = newLeft, right = newRight)
}

object KllSketch {
  /** Aggregate: KLL sketch (serialized) of the group's long values.
    * k=200 → ~1.65% rank error (99% conf), ~3 KiB; error scales
    * ~1/√k, size ~linearly.
    */
  def kll_sketch(c: Column, k: Int = 200): Column =
    GraftShims.column(
      KllSketchAgg(GraftShims.expression(c), k).toAggregateExpression())

  /** Aggregate: merge a column of serialized KLL sketches into one. */
  def kll_merge_agg(c: Column, k: Int = 200): Column =
    GraftShims.column(
      KllMergeAgg(GraftShims.expression(c), k).toAggregateExpression())

  def kll_quantile(sk: Column, rankPpm: Column): Column =
    GraftShims.column(KllQuantileExpr(
      GraftShims.expression(sk), GraftShims.expression(rankPpm)))

  def kll_rank(sk: Column, value: Column): Column =
    GraftShims.column(KllRankExpr(
      GraftShims.expression(sk), GraftShims.expression(value)))

  def kll_n(sk: Column): Column =
    GraftShims.column(KllNExpr(GraftShims.expression(sk)))

  def kll_ks(a: Column, b: Column): Column =
    GraftShims.column(KllKsExpr(
      GraftShims.expression(a), GraftShims.expression(b)))
}
