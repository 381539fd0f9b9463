package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-derived feature-bucket ids of all word n-grams of a single-space-
  * normalized string, IN ORDER with multiplicity — the codegen'd hashing
  * trick for [[graft.operators.Curation.dsirSelect]].
  *
  * Bucket identity is EXACTLY `conv(substring(md5(gram), 1, 4), 16, 10) %
  * buckets` — i.e. the first two md5 digest bytes of the gram string — so a
  * SQL oracle reproduces the same partition of grams into buckets (DuckDB:
  * the strpos hex-decode of `substring(md5(gram), 1, 4)`). That portability
  * requirement is why this uses md5 and not xxhash64: the feature HASH is
  * part of the operator's observable semantics (weights attach to buckets),
  * unlike the dedup operators where hash equality only proxies string
  * equality.
  *
  * Same motivation as [[WordGramHashesExpr]]: the composable form
  * (`transform` + `md5` + `conv` under an explode) runs on Catalyst's
  * interpreted path (~10 µs/row measured) and re-evaluates per reference;
  * this expression walks the UTF-8 bytes once, hashing each n-word window
  * in place (one ThreadLocal digest, zero per-gram string allocation).
  * Fewer than n words → empty array (mirrors TextAnalysis.wordGrams).
  */
case class GramBucketsExpr(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")
  require(buckets >= 1 && buckets <= 65536,
    "buckets must be in [1, 65536] (bucket id = first two md5 bytes mod buckets)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_buckets"

  override protected def nullSafeEval(input: Any): Any =
    GramBuckets.bucketIds(input.asInstanceOf[UTF8String], n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramBuckets.bucketIds($c, $n, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): GramBucketsExpr =
    copy(child = newChild)
}

object GramBuckets {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bucket id of every n-word window (order + multiplicity preserved). */
  def bucketIds(s: UTF8String, n: Int, buckets: Int): ArrayData = {
    val len = s.numBytes()
    if (len == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val bytes = s.getBytes
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    if (nWords < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val md = digest.get()
    val arr = new Array[Long](nWords - n + 1)
    var j = 0
    while (j < arr.length) {
      val from = starts(j)
      val until = if (j + n < nWords) starts(j + n) - 1 else len
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      arr(j) = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % buckets
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  def gram_buckets(c: Column, n: Int, buckets: Int): Column =
    GraftShims.column(GramBucketsExpr(GraftShims.expression(c), n, buckets))
}
