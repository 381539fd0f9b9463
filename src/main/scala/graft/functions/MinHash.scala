package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash machinery: word-shingle hashing and k-permutation
  * signatures as codegen'd expressions.
  *
  * The composable form — `transform(params, p -> array_min(transform(
  * hashes, h -> (a*h+b) % P)))` — evaluates k×|shingles| interpreted
  * lambdas per document (HOFs are CodegenFallback); at 64 hashes × ~120
  * shingles that interpretive overhead dominated the MinHash-LSH operator
  * at 10× corpus scale. These expressions run the identical arithmetic
  * (same hash function, same (a·h+b) mod P universal family, same seeds →
  * identical signatures) in tight primitive loops.
  */

/** IN-ORDER (multiset) xxhash64 values of all n-word windows of a
  * single-space-normalized string — the sibling of
  * [[WordShingleHashesExpr]] that keeps duplicates and positions, for the
  * gram-statistics operators (repetition, contamination) where
  * multiplicity and index carry meaning. Fewer than n words → EMPTY array
  * (mirroring TextAnalysis.wordGrams), empty string → empty array.
  * Hash identity is the same xxhash64-over-gram-bytes as the shingle
  * expression, so a hash equality IS a gram string equality
  * (64-bit collision odds are the same trade ngramJaccardPairs documents).
  */
case class WordGramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.wordGramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHash.wordGramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashesExpr =
    copy(child = newChild)
}

/** Sorted DISTINCT xxhash64 values of all w-word windows of a
  * single-space-normalized string. Window bytes are exactly the
  * `concat_ws(" ", words)` content, and the hash is Spark's xxhash64
  * (XXH64, seed 42), so values match `xxhash64(shingle_string)` exactly.
  */
case class WordShingleHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.wordShingleHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHash.wordShingleHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashesExpr =
    copy(child = newChild)
}

/** IN-ORDER xxhash64 values of the TUMBLING k-word chunks of a
  * single-space-normalized string — including the short final chunk
  * (unlike the sliding-gram expressions, which need full windows). The
  * codegen'd detection-side hasher for [[graft.operators.Dedup
  * .boilerplateRemoval]]: chunk bytes are exactly the
  * `concat_ws(" ", slice(words, i*k+1, k))` content, so a hash equality
  * IS a chunk-string equality (same 64-bit-collision trade the other
  * hash operators document). Empty input → empty array.
  */
case class TumblingChunkHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "tumbling_chunk_hashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.tumblingChunkHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHash.tumblingChunkHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TumblingChunkHashesExpr =
    copy(child = newChild)
}

/** k-element minhash signature over an array of base hashes. */
case class MinHashSigExpr(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.signature(input.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHash.signature($c, $k, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** 64-bit SimHash from an array of (multiset) token hashes: per bit, sum
  * +1/−1 votes across tokens; bit set on a positive vote. One pass over the
  * tokens (the composable form ran 64 interpreted `aggregate` folds per
  * row).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object MinHash {
  /** 2^31 − 1 (Mersenne prime), the universal-hash modulus. */
  final val P = 2147483647L
  final val XxSeed = 42L

  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Deterministic (a, b) parameter arrays: a ∈ [1, 2^31−1), b ∈ [0, 2^31),
    * drawn from Random(seed) in a fixed order — signatures are reproducible
    * across runs and cluster sizes.
    */
  def params(k: Int, seed: Long): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent((k, seed), { _ =>
      val rnd = new scala.util.Random(seed)
      val a = new Array[Long](k)
      val b = new Array[Long](k)
      var i = 0
      while (i < k) {
        a(i) = rnd.nextInt(Int.MaxValue - 1).toLong + 1L
        b(i) = rnd.nextInt(Int.MaxValue).toLong
        i += 1
      }
      (a, b)
    })

  def wordShingleHashes(s: UTF8String, w: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes()
    // word start offsets in the single-space-normalized bytes
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    val out =
      if (nWords < w) Array(XXH64.hashUnsafeBytes(base, offset, len, XxSeed))
      else {
        val arr = new Array[Long](nWords - w + 1)
        var j = 0
        while (j < arr.length) {
          val from = starts(j)
          val until = if (j + w < nWords) starts(j + w) - 1 else len
          arr(j) = XXH64.hashUnsafeBytes(base, offset + from, until - from, XxSeed)
          j += 1
        }
        arr
      }
    java.util.Arrays.sort(out)
    var wr = 0
    var r = 1
    while (r < out.length) {
      if (out(r) != out(wr)) { wr += 1; out(wr) = out(r) }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (wr + 1 == out.length) out else java.util.Arrays.copyOf(out, wr + 1))
  }

  /** Fold the minima of `hashes` under the k-permutation family into
    * `out` (elementwise running min). Shared by the per-row signature and
    * the group aggregate — identical arithmetic means a group signature
    * IS the signature of the union of its members' element sets.
    */
  def foldMin(out: Array[Long], hashes: ArrayData, k: Int, seed: Long): Unit = {
    val (a, b) = params(k, seed)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      var h = hashes.getLong(i) % P
      if (h < 0) h += P
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
  }

  /** An untouched buffer (no elements seen) finalizes as all-zeros — the
    * same convention `signature` uses for an empty input array.
    */
  def finalizeSig(buf: Array[Long]): Array[Long] = {
    var i = 0
    var untouched = true
    while (i < buf.length && untouched) {
      untouched = buf(i) == Long.MaxValue; i += 1
    }
    if (untouched) new Array[Long](buf.length) else buf
  }

  def signature(hashes: ArrayData, k: Int, seed: Long): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    foldMin(out, hashes, k, seed)
    if (hashes.numElements() == 0) java.util.Arrays.fill(out, 0L)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def simhash64(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def simhash64(c: Column): Column =
    GraftShims.column(SimHash64Expr(GraftShims.expression(c)))

  /** In-order n-word-gram hashes (with multiplicity) of a single-space-
    * normalized string; < n words or empty input → empty array.
    */
  def wordGramHashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes()
    if (len == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    if (nWords < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val arr = new Array[Long](nWords - n + 1)
    var j = 0
    while (j < arr.length) {
      val from = starts(j)
      val until = if (j + n < nWords) starts(j + n) - 1 else len
      arr(j) = XXH64.hashUnsafeBytes(base, offset + from, until - from, XxSeed)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  /** Tumbling k-word chunk hashes, short final chunk included. */
  def tumblingChunkHashes(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes()
    if (len == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    val nChunks = (nWords + k - 1) / k
    val arr = new Array[Long](nChunks)
    var c = 0
    while (c < nChunks) {
      val from = starts(c * k)
      val until = if ((c + 1) * k < nWords) starts((c + 1) * k) - 1 else len
      arr(c) = XXH64.hashUnsafeBytes(base, offset + from, until - from, XxSeed)
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  def word_gram_hashes(c: Column, n: Int): Column =
    GraftShims.column(WordGramHashesExpr(GraftShims.expression(c), n))

  def tumbling_chunk_hashes(c: Column, k: Int): Column =
    GraftShims.column(TumblingChunkHashesExpr(GraftShims.expression(c), k))

  def word_shingle_hashes(c: Column, w: Int): Column =
    GraftShims.column(WordShingleHashesExpr(GraftShims.expression(c), w))

  def minhash_sig(c: Column, k: Int, seed: Long = 42L): Column =
    GraftShims.column(MinHashSigExpr(GraftShims.expression(c), k, seed))
}
