package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** North-star deduplication operators over the `documents` table
  * (BASELINE.json mandate; the reference has none — SURVEY.md §2D).
  *
  * Five families, each designed shuffle-first for 100 TB:
  *
  *   - exact: hash-groupBy on normalized content — one shuffle on the
  *     content key (here md5(norm) so the shuffle key is 16 bytes, not the
  *     document);
  *   - MinHash+LSH: shingle → k minhashes → band signatures → bucket join.
  *     Only bucket keys shuffle; candidate verification touches candidate
  *     pairs, never the n² cross product. Oversized buckets (degenerate
  *     content) are capped — the standard skew guard;
  *   - SimHash: 64-bit signature via per-bit token-hash voting, computed
  *     per-row with native array expressions (no shuffle), near-dup pairs
  *     via banded Hamming blocking;
  *   - n-gram Jaccard: blocked all-pairs verification (lang × length
  *     bucket) — the exact-verify companion, SQL-expressible for the
  *     oracle;
  *   - embedding cosine: near-dup by cosine ≥ τ within a blocking key.
  *
  * All hash-derived paths use deterministic seeds; minhash/simhash use
  * xxhash64 (Spark-native, codegen'd) so signatures are reproducible
  * across runs and cluster sizes.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Whitespace/case normalization. The coalesce makes the expression
    * NON-NULLABLE, which matters beyond semantics: a nullable similarity
    * key makes InferFiltersFromConstraints push `isnotnull(<whole gram
    * pipeline>)` below the materializing exchange, re-evaluating the
    * expensive higher-order-function chain once more per document.
    */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(coalesce(c, lit("")))), "\\s+", " ")

  /** Exact dedup groups: one row per distinct normalized content with >0
    * members; representative = min doc_id (deterministic survivor policy).
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(normText(col("text"))).as("content_key"))
      .groupBy(col("content_key"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_members"))

  /** Survivors only — the dedup'd corpus (drop all but the representative). */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_key", md5(normText(col("text"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_key")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .drop("rn", "content_key")

  // ------------------------------------------------------------- shingles

  /** Word w-shingles as a distinct array column (native higher-order
    * functions; no UDF, no explode until the LSH stage chooses to).
    */
  def wordShingles(text: Column, w: Int = 3): Column = {
    val words = split(normText(text), " ")
    array_distinct(
      when(size(words) >= w,
        transform(sequence(lit(0), size(words) - w),
          i => concat_ws(" ", slice(words, i + 1, lit(w)))))
        .otherwise(array(concat_ws(" ", words))))
  }

  /** Character n-grams, distinct. */
  def charNgrams(text: Column, n: Int = 3): Column = {
    val t = normText(text)
    array_distinct(
      when(length(t) >= n,
        transform(sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n))))
        .otherwise(array(t)))
  }

  // ------------------------------------------------------- MinHash + LSH

  /** k-element minhash signature from a shingle array: for each (a,b),
    * min over shingles of (a·h(s)+b) mod P, h = pmod(xxhash64, P). The
    * arithmetic runs in the native MinHashSigExpr (one tight loop; the
    * k×|shingles| nested-HOF form was interpreted and dominated the
    * operator at scale) — values identical to the composable form.
    */
  def minhashSignature(shingles: Column, k: Int = 64, seed: Long = 42L): Column =
    graft.functions.MinHash.minhash_sig(
      transform(shingles, s => xxhash64(s)), k, seed)

  /** Candidate pairs via banded LSH over the signature: b bands of r rows
    * (k = b·r); docs sharing any band bucket are candidates. `maxBucket`
    * caps degenerate buckets (skew guard: a bucket of m docs yields m²
    * pairs — boilerplate/empty docs would otherwise dominate the shuffle).
    */
  def lshCandidates(
      signed: DataFrame, // (doc_id, sig array<long>)
      bands: Int = 16,
      rows: Int = 4,
      maxBucket: Int = 50): DataFrame = {
    val banded = signed.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))): _*))
        .as(Seq("band", "bucket")))
    val buckets = banded
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    buckets
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
  }

  /** Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    * pairs → exact-Jaccard verification ≥ threshold.
    */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double = 0.8,
      k: Int = 64,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    // native one-pass shingle hashing (sorted distinct) + native signature;
    // verification is the fused sorted-merge Jaccard — no interpreted HOFs
    // anywhere on this path
    val shingled = docs.select(
      col("doc_id"),
      graft.functions.MinHash.word_shingle_hashes(normText(col("text")), 3)
        .as("sh"))
    val signed = shingled.select(
      col("doc_id"),
      graft.functions.MinHash.minhash_sig(col("sh"), k).as("sig"))
    val cand = lshCandidates(signed, bands, rowsPerBand)
    val a = shingled.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = shingled.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val jac = graft.functions.SortedIntersect
      .jaccard_sorted(col("sh_a"), col("sh_b"))
    cand
      .join(a, "doc_a").join(b, "doc_b")
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document from token hashes — per-row native array
    * expressions: for each bit, sum(+1/−1) over token hashes, bit set when
    * the vote is positive.
    */
  def simhash(text: Column): Column =
    graft.functions.MinHash.simhash64(
      transform(split(normText(text), " "), t => xxhash64(t)))

  /** Near-dup pairs by Hamming distance ≤ maxDist, blocked on 16-bit bands
    * (a pair within distance d ≤ 3 must agree on ≥1 of 4 bands — the
    * pigeonhole guarantee; d ≥ 4 could place one differing bit per band and
    * silently miss pairs, hence the hard require).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      s"4x16-bit banding guarantees recall only for hamming <= 3, got $maxDist")
    val sh = docs.select(col("doc_id"), simhash(col("text")).as("sh"))
    val banded = sh.select(
      col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), b * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("band", "bucket")))
    val a = banded.select(
      col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(
      col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Blocked exact n-gram-Jaccard near-dup: candidates = same lang and
    * same length bucket (|len/bucket|), verified by char-3-gram Jaccard.
    * This is the SQL-expressible exact-verify twin of the LSH path.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double = 0.65,
      lenBucket: Int = 64): DataFrame = {
    // Grams are xxhash64'd before the join: set intersection on primitive
    // longs is several times cheaper than on strings, and with a gram
    // universe ≪ 2^32 the collision probability is negligible, so the
    // Jaccard VALUE is unchanged (the SQL oracle keeps string grams).
    // |A∪B| is computed as |A|+|B|−|A∩B| rather than materializing the
    // union array — halves the per-pair set work.
    // Grams are xxhash64'd and SORTED once per doc before the join; the
    // per-pair intersection is then a zero-allocation linear merge
    // (SortedIntersect) instead of array_intersect's per-invocation hash
    // set. The repartition materializes the gram arrays ahead of the
    // self-join (otherwise Catalyst collapses the projection past the join
    // and recomputes gram sets per PAIR) and both branches canonicalize to
    // one exchange, which ReuseExchange computes once. Collision note: with
    // a gram universe ≪ 2^32 the xxhash64 step leaves Jaccard values
    // unchanged, so the string-gram SQL oracle still matches.
    // gram sets come from the native NgramHashes expression (one codegen'd
    // pass over the bytes) — the HOF formulation was interpreted and cost
    // ~3.3 ms/doc, dominating the whole operator
    val g = docs.select(
      col("doc_id"), col("lang"),
      (col("n_chars").cast("long") / lenBucket).cast("long").as("len_b"),
      graft.functions.NgramHashes.ngram_hashes(normText(col("text")), 3)
        .as("grams"))
      .repartition(col("lang"), col("len_b"))
    val a = g.select(col("lang"), col("len_b"),
      col("doc_id").as("doc_a"), col("grams").as("g_a"))
    val b = g.select(col("lang"), col("len_b"),
      col("doc_id").as("doc_b"), col("grams").as("g_b"))
    val jac = graft.functions.SortedIntersect
      .jaccard_sorted(col("g_a"), col("g_b"))
    a.join(b, Seq("lang", "len_b"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(jac >= threshold)
      .select(col("lang"), col("doc_a"), col("doc_b"), jac.as("jaccard"))
  }

  // ------------------------------------------------- embedding near-dup

  /** Cosine near-dup over an embedding column within a blocking key —
    * here `label` (cluster id): exact within-block verification.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      threshold: Double = 0.99): DataFrame = {
    val v = embeddings.select(
      col("label"), col("vec_id"),
      Similarity.normalized(col("embedding")).as("unit"))
    val a = v.select(col("label"), col("vec_id").as("vec_a"),
      col("unit").as("u_a"))
    val b = v.select(col("label"), col("vec_id").as("vec_b"),
      col("unit").as("u_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        Similarity.dot(col("u_a"), col("u_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
