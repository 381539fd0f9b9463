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

  /** Exact n-gram-Jaccard near-dup pairs within `lang` via PREFIX
    * FILTERING (the PPJoin family): for sets in a global canonical order,
    * any pair with J ≥ t must share a gram inside each side's first
    * |G| − ⌈t·|G|⌉ + 1 grams — so only docs sharing a PREFIX gram are
    * candidates, and the final result is provably identical to the
    * all-pairs join (no recall loss, unlike fixed length-bucket
    * blocking whose block populations grow linearly with the corpus).
    *
    * The canonical order is document-frequency ascending (rarest first):
    * prefixes then hold only rare grams, so candidate bucket sizes are
    * bounded by gram rarity — a boilerplate gram shared by half the
    * corpus sorts LAST and never enters a prefix. That makes candidate
    * count track the true near-dup density, not corpus², which is the
    * 100 TB property. Costs one extra linear aggregation (the df count —
    * a classic corpus statistic worth materializing anyway) plus one
    * window sort per doc's grams.
    *
    * Two exact pre-filters trim verification further: J ≥ t implies
    * min(|A|,|B|) ≥ t·max(|A|,|B|) (size-ratio), applied with an epsilon
    * so float rounding of t·n can never drop a boundary pair; same
    * epsilon guards the prefix length ⌈t·n⌉.
    *
    * Verification unchanged from round 1: grams are xxhash64'd and SORTED
    * once per doc (native NgramHashes, one codegen'd pass — the HOF form
    * was interpreted at ~3.3 ms/doc); per-pair intersection is the fused
    * zero-allocation merge (SortedIntersect) with |A∪B| = |A|+|B|−|A∩B|.
    * Hash note: gram universe ≪ 2^32, so xxhash64 leaves Jaccard values
    * unchanged and the string-gram SQL oracle matches. Byte note:
    * NgramHashes windows BYTES while the oracle takes CHAR substrings —
    * equivalent on this ASCII corpus only (NgramHashes.scala documents
    * the ASCII contract); a non-ASCII corpus would need an
    * encode()-to-bytes oracle.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double = 0.65): DataFrame = {
    val eps = 1e-9
    // repartition materializes gram arrays once; every downstream branch
    // (df counts, prefixes, both verification sides) reuses the exchange
    // instead of recomputing the gram pipeline per reference
    val g = docs.select(
      col("doc_id"), col("lang"),
      graft.functions.NgramHashes.ngram_hashes(normText(col("text")), 3)
        .as("grams"))
      .withColumn("n_g", size(col("grams")))
      .repartition(col("doc_id"))
    val occ = g.select(col("lang"), col("doc_id"), col("n_g"),
      explode(col("grams")).as("gram"))
    val dfc = occ.groupBy(col("lang"), col("gram"))
      .agg(count(lit(1)).as("gdf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("gdf"), col("gram"))
    val prefixLen =
      (col("n_g") - ceil(col("n_g") * threshold - eps) + 1).cast("int")
    val pre = occ.join(dfc, Seq("lang", "gram"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= prefixLen)
      .select(col("lang"), col("gram"), col("doc_id"), col("n_g"))
    val cand = pre.select(col("lang"), col("gram"),
        col("doc_id").as("doc_a"), col("n_g").as("n_a"))
      .join(pre.select(col("lang"), col("gram"),
        col("doc_id").as("doc_b"), col("n_g").as("n_b")), Seq("lang", "gram"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("n_a"), col("n_b")) + eps >=
        greatest(col("n_a"), col("n_b")) * threshold)
      .select(col("lang"), col("doc_a"), col("doc_b"))
      .distinct()
    val jac = graft.functions.SortedIntersect
      .jaccard_sorted(col("g_a"), col("g_b"))
    cand
      .join(g.select(col("doc_id").as("doc_a"), col("grams").as("g_a")), "doc_a")
      .join(g.select(col("doc_id").as("doc_b"), col("grams").as("g_b")), "doc_b")
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
