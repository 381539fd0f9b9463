package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** GROUP-level MinHash signature as a native Catalyst aggregate
  * (TypedImperativeAggregate — the custom-aggregate analog of the nine
  * codegen'd scalar expressions): folds every member row's element-hash
  * array into one k-permutation signature.
  *
  * Because the per-row signature and this aggregate share the identical
  * (a·h+b) mod P fold (MinHash.foldMin), the group signature EQUALS the
  * signature of the UNION of the members' element sets (min distributes
  * over union) — spec-verified. That's the property that makes it useful
  * at scale: signatures of corpus partitions / dedup clusters / sources
  * combine associatively, so estimated Jaccard between arbitrary group
  * aggregations costs one signature compare instead of touching members.
  *
  * Execution shape: partial-aggregates map-side like any sum (buffer =
  * k longs), merges are elementwise min — shuffle carries k·8 bytes per
  * group, never element sets.
  */
case class MinHashAggExpr(
    child: Expression,
    k: Int,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](k)
    java.util.Arrays.fill(buf, Long.MaxValue)
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHash.foldMin(buffer, v.asInstanceOf[ArrayData], k, seed)
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(MinHash.finalizeSig(buffer))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAggExpr =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Aggregate column: MinHash signature of the union of all element-hash
    * arrays in the group.
    */
  def minhash_agg(c: Column, k: Int = 64, seed: Long = 42L): Column =
    GraftShims.column(
      MinHashAggExpr(GraftShims.expression(c), k, seed).toAggregateExpression())
}
