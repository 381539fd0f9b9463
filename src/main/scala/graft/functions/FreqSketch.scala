package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary. `items` maps item → lower-bound
  * count estimate; `n` = items observed; `decs` = total decrement applied
  * (the one-sided error: est ≤ true ≤ est + decs).
  */
final class FreqSummary(
    val items: mutable.HashMap[String, Long],
    var n: Long,
    var decs: Long)

/** Single-pass bounded-memory frequent-items aggregate (Misra-Gries '82,
  * merged per Agarwal et al. "Mergeable Summaries", PODS'12) as a native
  * `TypedImperativeAggregate` — the heavy-hitters sibling of the built-in
  * HLL (`approx_count_distinct`) and the custom [[MinHashAggExpr]].
  *
  * Guarantees (spec-verified against exact counts):
  *   - any item with true frequency > n/(capacity+1) is IN the summary;
  *   - for every reported item, est ≤ true ≤ est + decs, with
  *     decs ≤ n/(capacity+1).
  *
  * Why it matters at 100 TB: the exact top-k term table
  * ([[graft.operators.TextAnalysis.tokenFrequencies]]) shuffles the full
  * vocabulary×doc table; this sketch carries AT MOST `capacity` entries
  * per partial buffer, merges associatively map-side like a sum, and the
  * final reducer sees capacity-sized summaries regardless of corpus size
  * — a constant-memory, one-scan answer to "what dominates this corpus"
  * (the boilerplate / junk-token probe a curation pipeline runs first).
  *
  * The merge subtracts the (capacity+1)-th largest count from all entries
  * (the mergeable-summaries rule), so the error bound composes across any
  * merge tree — partial results from different partitions/executors are
  * combinable without touching raw data again.
  */
case class FreqSketchAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSummary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): FreqSummary =
    new FreqSummary(mutable.HashMap.empty, 0L, 0L)

  override def update(buf: FreqSummary, input: InternalRow): FreqSummary = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.n += 1
      buf.items.get(item) match {
        case Some(c) => buf.items.update(item, c + 1)
        case None =>
          if (buf.items.size < capacity) buf.items.update(item, 1L)
          else {
            // decrement-all; drop zeros (classic MG step, O(capacity))
            buf.decs += 1
            val dead = mutable.ArrayBuffer.empty[String]
            buf.items.foreach { case (k, c) =>
              if (c == 1L) dead += k else buf.items.update(k, c - 1)
            }
            dead.foreach(buf.items.remove)
          }
      }
    }
    buf
  }

  override def merge(b1: FreqSummary, b2: FreqSummary): FreqSummary = {
    b2.items.foreach { case (k, c) =>
      b1.items.update(k, b1.items.getOrElse(k, 0L) + c)
    }
    b1.n += b2.n
    b1.decs += b2.decs
    if (b1.items.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val counts = b1.items.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      b1.decs += d
      val dead = mutable.ArrayBuffer.empty[String]
      b1.items.foreach { case (k, c) =>
        if (c <= d) dead += k else b1.items.update(k, c - d)
      }
      dead.foreach(b1.items.remove)
    }
    b1
  }

  override def eval(buf: FreqSummary): Any = {
    // deterministic order GIVEN the summary: est desc, then item
    val rows = buf.items.toArray
      .sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        InternalRow(UTF8String.fromString(item), est, buf.decs)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: FreqSummary): Array[Byte] = {
    val entries = buf.items.toArray
    val payload = entries.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val size = 8 + 8 + 4 + payload.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putLong(buf.decs)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(payload(i).length)
      bb.put(payload(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val decs = bb.getLong()
    val count = bb.getInt()
    val items = mutable.HashMap.empty[String, Long]
    (0 until count).foreach { _ =>
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      items.update(new String(kb, StandardCharsets.UTF_8), bb.getLong())
    }
    new FreqSummary(items, n, decs)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** Aggregate column: Misra-Gries summary of the group's items as
    * array&lt;struct&lt;item, est, err&gt;&gt; sorted (est desc, item).
    */
  def freq_sketch(c: Column, capacity: Int = 32): Column =
    GraftShims.column(
      FreqSketchAgg(GraftShims.expression(c), capacity).toAggregateExpression())
}
