package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, distinct xxhash64 values of all byte n-grams of a string, as one
  * native expression.
  *
  * The composable formulation — `sort_array(array_distinct(transform(
  * sequence(...), i -> xxhash64(substr(...)))))` — is correct but runs on
  * Catalyst's interpreted path (higher-order functions are CodegenFallback):
  * measured ~3.3 ms per 450-char document, which made gram construction,
  * not the pair join, the bottleneck of the n-gram similarity operator.
  * This expression does one pass over the UTF-8 bytes with zero per-gram
  * allocation (~µs per document): hash each n-byte window in place
  * (XXH64.hashUnsafeBytes on the string's base memory), sort the primitive
  * array, deduplicate in place.
  *
  * Note: grams are BYTE windows. For ASCII text this is identical to
  * character windows (what a SQL oracle computes); for multi-byte UTF-8 the
  * sets differ slightly — irrelevant for similarity quality, but worth
  * knowing when comparing against char-based implementations.
  */
case class NgramHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    NgramHashes.hashed(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramHashes.hashed($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesExpr =
    copy(child = newChild)
}

object NgramHashes {
  final val Seed = 42L

  /** Sorted distinct hashes of every n-byte window (whole string if shorter). */
  def hashed(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes()
    val out =
      if (len <= n) Array(XXH64.hashUnsafeBytes(base, offset, len, Seed))
      else {
        val arr = new Array[Long](len - n + 1)
        var i = 0
        while (i < arr.length) {
          arr(i) = XXH64.hashUnsafeBytes(base, offset + i, n, Seed)
          i += 1
        }
        arr
      }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 0
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    val dedup = if (w + 1 == out.length) out else java.util.Arrays.copyOf(out, w + 1)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(dedup)
  }

  def ngram_hashes(c: Column, n: Int): Column =
    GraftShims.column(NgramHashesExpr(GraftShims.expression(c), n))
}
