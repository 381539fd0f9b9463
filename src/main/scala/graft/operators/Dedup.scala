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
  *   - n-gram Jaccard: exact all-pairs semantics within lang via
  *     log-banded size blocking + salted band join — the exact-verify
  *     companion, SQL-expressible for the oracle;
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

  /** Incremental-ingest (cross-corpus) exact dedup: the docs in `batch`
    * whose content does not already exist in `reference`, deduped within
    * the batch itself (min-doc_id survivor — same policy as
    * [[exactDedup]]). This is the "dedupe tonight's crawl against the
    * corpus we already have" step, run on every ingest cycle.
    *
    * 100 TB shape: both sides reduce to 16-byte md5 keys before any
    * shuffle — the reference side to a DISTINCT key set, the batch keeps
    * (doc_id, source, key). The anti-join then shuffles keys, never text.
    * Nightly batches are orders of magnitude smaller than the corpus, so
    * with a bucketed reference key table (see Sink.writeBucketed) the
    * reference side reads pre-partitioned with zero exchange and only the
    * batch shuffles.
    */
  def crossCorpusNew(batch: DataFrame, reference: DataFrame): DataFrame = {
    val key = md5(normText(col("text")))
    val refKeys = reference.select(key.as("content_key")).distinct()
    batch
      .withColumn("content_key", key)
      .join(refKeys, Seq("content_key"), "left_anti")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_key")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("content_key"))
  }

  /** Bloom-prefiltered twin of [[crossCorpusNew]] — same contract, same
    * survivors (equivalence is what the shared oracle verifies), different
    * 100 TB cost model. A Bloom filter over the reference key set is built
    * with Spark's mergeable sketch aggregate (`stat.bloomFilter` — map-side
    * partials, one tree-reduce, no row ever collected) and broadcast; the
    * batch then probes it in a NARROW map. Rows the filter clears (the
    * overwhelming majority of a nightly crawl) never enter the anti-join
    * at all — only Bloom-positives (true matches + the `fpp` false-positive
    * sliver) do exact key confirmation. No false negatives is a Bloom
    * THEOREM, so clear ∪ (suspects ∖ reference) ≡ batch ∖ reference
    * exactly; `fpp` trades broadcast bytes against suspect-join size, it
    * never affects the answer.
    *
    * The probe UDF costs one murmur-hash per row on a 32-char key
    * (off-codegen but trivially cheap next to the scan); the within-batch
    * survivor window is unchanged from [[crossCorpusNew]].
    */
  def crossCorpusNewBloom(
      batch: DataFrame,
      reference: DataFrame,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    val key = md5(normText(col("text")))
    val refKeys = reference.select(key.as("content_key")).distinct()
    val bloom = refKeys.stat.bloomFilter("content_key", expectedItems, fpp)
    val bc = batch.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: String) => bc.value.mightContainString(k))
    val keyed = batch.withColumn("content_key", key)
    val clear = keyed.filter(!might(col("content_key")))
    val confirmedNew = keyed.filter(might(col("content_key")))
      .join(refKeys, Seq("content_key"), "left_anti")
    clear.unionByName(confirmedNew)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_key")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("content_key"))
  }

  /** Boilerplate REMOVAL — the apply side of [[spanDedup]]'s detection
    * pass, CCNet/C4-style: cut each document into tumbling `k`-word
    * chunks, find chunks occurring in >= `maxDocs` DISTINCT documents
    * (navigation chrome, license blocks, cookie banners), drop every
    * occurrence, and re-assemble each document from its surviving chunks
    * in order. Unlike spanDedup (which keeps first occurrences and emits
    * fingerprints), this is the pass that rewrites the corpus text.
    *
    * 100 TB shape: the DETECTION pass is fully codegen'd — tumbling-chunk
    * xxhash64 values are computed in place by
    * [[graft.functions.TumblingChunkHashesExpr]] (no chunk strings, no
    * interpreted higher-order lambdas) and only (8-byte hash, doc_id,
    * idx) tuples shuffle to the hot-set count; removal indices come back
    * as one (doc_id, int-list) row per AFFECTED document — the
    * broadcast-hinted join side — and the REWRITE pass materializes the
    * chunk strings once and filters them with a narrow higher-order
    * expression. Document text never crosses the network; if boilerplate
    * ever touches so many docs the index lists outgrow a broadcast, the
    * join degrades to one doc_id-keyed exchange of int lists (still
    * never text).
    */
  def boilerplateRemoval(
      docs0: DataFrame, k: Int = 10, maxDocs: Int = 2): DataFrame = {
    // fan the chunk hashing/building out of the scan stage when the
    // source yields fewer splits than cores (r17, [[Fanout]]): both
    // branches below re-derive from this one exchange (reused), and the
    // per-doc HOF work is the operator's CPU
    val docs = Fanout.bySessionCores(
      docs0.select(col("doc_id"), col("text")), col("doc_id"))
    val exploded = docs
      .select(col("doc_id"),
        posexplode(graft.functions.MinHash.tumbling_chunk_hashes(
          TextAnalysis.normWords(col("text")), k)).as(Seq("idx", "h")))
    val ws = TextAnalysis.wordArray(col("text"))
    val base = docs
      .select(col("doc_id"),
        when(size(ws) > 0,
          transform(sequence(lit(0),
            floor((size(ws) - 1).cast("double") / k).cast("int")),
            i => concat_ws(" ", slice(ws, i * k + 1, lit(k)))))
          .otherwise(array().cast("array<string>")).as("chunks"))
      .filter(size(col("chunks")) > 0)
    val hot = exploded.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= maxDocs)
      .select(col("h"))
    val removed = exploded.join(hot.hint("broadcast"), Seq("h"))
      .groupBy(col("doc_id")).agg(collect_set(col("idx")).as("rm"))
    val rm = coalesce(col("rm"), array().cast("array<int>"))
    val kept = filter(col("chunks"), (_, i) => !array_contains(rm, i))
    base.join(removed.hint("broadcast"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(kept).cast("long").as("n_kept"),
        when(size(kept) > 0, array_join(kept, " "))
          .otherwise(lit(null).cast("string")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

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
  def simhashPairs(docs: DataFrame, maxDist: Int = 3, salts: Int = 8): DataFrame =
    hammingPairs64(
      docs.select(col("doc_id"), simhash(col("text")).as("sh")),
      maxDist, salts)

  /** Banded-Hamming near-dup pairs over ANY 64-bit signature table
    * `(doc_id, sh)` — the blocking engine behind [[simhashPairs]] and the
    * multimodal perceptual-hash dedup
    * ([[Multimodal.imageNearDupPairs]]). Same contract: pairs at Hamming
    * ≤ maxDist ≤ 3, found via 4×16-bit band buckets (pigeonhole-complete),
    * emitted exactly once from the first agreeing band, salted against
    * degenerate bucket skew.
    */
  def hammingPairs64(
      sigs: DataFrame, maxDist: Int = 3, salts: Int = 8): DataFrame = {
    require(maxDist <= 3,
      s"4x16-bit banding guarantees recall only for hamming <= 3, got $maxDist")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    def chunk(sh: Column, b: Int): Column =
      shiftright(sh, b * 16).bitwiseAND(0xffffL)
    val sh = sigs.select(col("doc_id"), col("sh"))
    val banded = sh.select(
      col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(b => chunk(col("sh"), b)): _*))
        .as(Seq("band", "bucket")))
    // EXACTLY-ONCE emission, no pair-level distinct(): a pair sharing k
    // bands would match k times, so emit it only from its FIRST agreeing
    // band — computable post-join from the two full signatures (a when
    // chain over the four 16-bit chunks). The former distinct() shuffled
    // every duplicate pair row; this filter kills duplicates inside the
    // join stage for free.
    val firstBand = (0 until 4).reverse.foldLeft(lit(4)) { (acc, b) =>
      when(chunk(col("sh_a"), b) === chunk(col("sh_b"), b), lit(b))
        .otherwise(acc)
    }
    // SALTED ×`salts` like ngramJaccardPairs: a degenerate corpus
    // (boilerplate / near-empty docs) concentrates in one 16-bit bucket
    // per band, and a join key's within-key cross product runs on ONE
    // task — quadratic work AQE cannot split (partitions small in bytes,
    // skew in PAIR count). The probe carries a deterministic salt of
    // doc_a (coalesce keeps it non-nullable so
    // InferFiltersFromConstraints can't push a plan-splitting isnotnull
    // below the shared exchange); the build explodes all S salts. Each
    // pair still matches once per shared band, at salt(doc_a), and the
    // first-band filter keeps exactly one. The salt factor amplifies the
    // build side ×S unconditionally — the insurance premium against the
    // degenerate-bucket case; callers with a known-benign corpus can pass
    // salts = 1 to skip it (the exactly-once first-band emission does not
    // depend on salting).
    val a = banded.select(
      col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      coalesce(pmod(xxhash64(col("doc_id")), lit(salts.toLong)), lit(0L))
        .as("salt"))
    val b = banded.select(
      col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      explode(sequence(lit(0L), lit(salts - 1L))).as("salt"))
    a.join(b, Seq("band", "bucket", "salt"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("band") === firstBand)
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram-Jaccard near-dup pairs within `lang`, semantics = the
    * full all-pairs join at J ≥ t (provably nothing lost — the SQL oracle
    * is the unblocked brute force), computed with LOG-BANDED SIZE
    * BLOCKING: J ≥ t implies the gram-count ratio min/max ≥ t, so bands
    * of logarithmic width ln(1/t) plus a ±1-band probe cover every
    * qualifying pair exactly. Fixed-width length buckets (round 1) cut
    * real pairs at bucket boundaries — the switch surfaced a pair at
    * sf0.01 the old blocking silently missed.
    *
    * Why not PPJoin prefix filtering / MinHash candidates? Measured on
    * this corpus (and documented in SCALING.md): the gram universe is
    * tiny (377 grams, median df = 53% of docs), so the background Jaccard
    * of UNRELATED docs is ~0.5 and every content-based candidate scheme
    * degenerates to ~all pairs while paying its own overhead — prefix
    * filtering additionally needs per-occurrence df ordering that was
    * measured GC-bound at 20×. When the pair space is genuinely dense,
    * the honest floor is Ω(pairs-at-background-similarity); size banding
    * is the pruning that remains free, and the per-pair cost is one
    * early-exit fused sorted-merge.
    *
    * The size-ratio pre-filter min ≥ t·max applies with an epsilon so
    * float rounding of t·n can never drop a boundary pair.
    *
    * Verification: grams are xxhash64'd and SORTED once per doc (native
    * NgramHashes, one codegen'd pass — the HOF form was interpreted at
    * ~3.3 ms/doc); the threshold test is the early-exit merge
    * (jaccard_sorted_ge bails the moment the remaining elements cannot
    * reach t — background-similarity pairs reject partway through), and
    * the exact jaccard VALUE is recomputed only for survivors.
    * Hash note: gram universe ≪ 2^32, so xxhash64 leaves Jaccard values
    * unchanged and the string-gram SQL oracle matches. Byte note:
    * NgramHashes windows BYTES while the oracle takes CHAR substrings —
    * equivalent on this ASCII corpus only (NgramHashes.scala documents
    * the ASCII contract); a non-ASCII corpus would need an
    * encode()-to-bytes oracle.
    */
  /** Exact integer band boundaries for log-banding at `threshold`:
    * boundary k = the smallest integer n with log_r(n) >= k, r =
    * nextUp(1/t), powers taken in UNLIMITED-context BigDecimal (doubles
    * are exact rationals, so r^k and its ceiling are exact — digit count
    * grows ~17/power, bounded by the 2^31 takeWhile). Exposed for the
    * band-gap property test.
    */
  private[graft] def bandBoundaries(threshold: Double): Seq[Long] =
    if (threshold >= 1.0 || threshold <= 0.0) Nil // degenerate
    else {
      // The ±1-probe guarantee needs only r >= 1/t (qualifying pairs have
      // nb/na <= 1/t <= r ⟹ log_r gap < 1 ⟹ band gap <= 1), so a LARGER
      // r is always sound — bands just get coarser (more candidates, same
      // exactness). The floor 2^(31/256) caps the boundary count at 256
      // for thresholds near 1, where nextUp(1/t) alone would mint tens of
      // thousands of boundaries (unbounded driver-side BigDecimal work
      // and an analyzer-killing when-chain) for no filtering benefit the
      // tight ratio pre-filter doesn't already provide.
      val rFloor = math.pow(2.0, 31.0 / 256.0)
      val r = BigDecimal.decimal(
        math.max(Math.nextUp(1.0 / threshold), rFloor),
        java.math.MathContext.UNLIMITED)
      Iterator.iterate(r)(_ * r)
        .map(p => // smallest integer n with n >= r^k (band boundary k)
          if (p.isWhole) p.toLongExact
          else p.setScale(0, BigDecimal.RoundingMode.FLOOR).toLongExact + 1L)
        .takeWhile(_ <= Int.MaxValue.toLong)
        .toSeq
    }

  /** Driver-side twin of the columnar band expression. */
  private[graft] def bandOfCount(n: Long, bounds: Seq[Long]): Long =
    bounds.count(_ <= n).toLong

  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double = 0.65): DataFrame =
    hashedSetJaccardPairs(
      docs.select(
        col("doc_id"), col("lang"),
        graft.functions.NgramHashes.ngram_hashes(normText(col("text")), 3)
          .as("grams")),
      threshold, blockKeys = Seq("lang"))

  /** Threshold-sweep audit — the dedup CALIBRATION table: pair and
    * affected-document counts at each candidate Jaccard threshold, from
    * ONE pair-generation pass at the loosest threshold (a pair at J ≥ t
    * is a pair at every t' ≤ t, so tighter rows are filters over the same
    * set — never a second pair pass). This is how the threshold gets
    * picked before committing to a corpus-wide dedup: too loose and
    * n_docs explodes (false merges), too tight and the curve collapses to
    * exact dups only.
    *
    * Output: `(threshold_pct, n_pairs, n_docs)` — one row per threshold
    * (rows with zero pairs included), all exact integers.
    *
    * 100 TB shape: pair generation's documented banded/salted cost at
    * min(thresholds), then per-threshold 1-row aggregates over the
    * materialized pair set (lazily checkpointed — evaluated once, reused
    * |thresholds| times), unioned into one lazy plan.
    */
  def thresholdSweep(
      docs: DataFrame,
      thresholds: Seq[Double] = Seq(0.7, 0.8, 0.9)): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(t => t > 0 && t <= 1))
    require(
      thresholds.map(t => math.round(t * 100)).distinct.size ==
        thresholds.size,
      s"thresholds must stay distinct after pct rounding: $thresholds")
    val pairs = ngramJaccardPairs(docs, thresholds.min)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .localCheckpoint(false) // evaluated once, reused |thresholds| times
    thresholds.sorted.map { t =>
      val p = pairs.filter(col("jaccard") >= t)
      p.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .agg(count(lit(1)).as("two_n_pairs"),
          countDistinct(col("d")).as("n_docs"))
        .select(
          lit(math.round(t * 100).toInt).as("threshold_pct"),
          expr("two_n_pairs div 2").as("n_pairs"),
          col("n_docs"))
    }.reduce(_.unionAll(_)).orderBy(col("threshold_pct"))
  }

  /** Exact word-3-shingle Jaccard pairs — the same banded-exact join over
    * the MINHASH operators' similarity space (word shingles via
    * `word_shingle_hashes`, no lang blocking, matching
    * [[minhashLshPairs]]'s candidate-free ground truth). Used by the
    * `dedup_minhash` recall audit: the exact pair set is DuckDB-
    * recomputable from string shingles, so LSH recall becomes a
    * hash-verified claim instead of a spec-only one.
    */
  def wordShingleJaccardPairs(
      docs: DataFrame,
      threshold: Double = 0.8): DataFrame =
    hashedSetJaccardPairs(
      docs.select(
        col("doc_id"),
        graft.functions.MinHash.word_shingle_hashes(normText(col("text")), 3)
          .as("grams")),
      threshold, blockKeys = Nil)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Shared banded-exact core: COMPLETE Jaccard-≥-threshold pairs over any
    * sorted-distinct hashed-set column, blocked on integer-exact size
    * bands (±1 probe) plus optional equality `blockKeys`, salted ×8. See
    * the inline notes — every design decision here was measured.
    */
  private def hashedSetJaccardPairs(
      gramsDf: DataFrame, // (doc_id, [blockKeys...], grams)
      threshold: Double,
      blockKeys: Seq[String]): DataFrame = {
    val eps = 1e-9
    // repartition materializes gram arrays once; both join branches reuse
    // the exchange instead of recomputing the gram pipeline per reference
    val g0 = gramsDf.withColumn("n_g", size(col("grams")))
    // EXACT log-band assignment, no per-row floating point: band(n) =
    // floor(log_r(n)) computed by counting precomputed INTEGER boundaries
    // b_k = min{ n : log_r(n) >= k }, with r = nextUp(1/t) and powers
    // taken in BigDecimal (doubles are exact rationals, so r^k and its
    // ceiling are exact). Rounding r UP makes log_r(1/t) < 1 strictly, so
    // any pair with gram-count ratio >= t has real band gap <= 1 — the
    // ±1 probe below provably covers every pair the final exact Jaccard
    // check could accept (J >= t ⟹ min/max >= t), with no fp-rounding
    // escape hatch. Pairs admitted only by the ratio pre-filter's eps
    // slack (true ratio < t) have J < t and die at the exact check, so
    // not probing them loses nothing. ~50 boundaries cover n < 2^31; the
    // when-sum is a flat codegen'd comparison chain.
    val bandBounds: Seq[Long] = bandBoundaries(threshold)
    def bandOf(n: Column): Column =
      if (threshold >= 1.0) n.cast("long") // t=1: exact dups, band = n
      else if (threshold <= 0.0) lit(0L)   // t<=0: every pair qualifies
      else bandBounds.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(n >= b, 1L).otherwise(0L)
      }
    // the ~50-comparison band chain is evaluated ONCE per doc, below the
    // shared exchange — repeating it per probe replica (×3 in the explode)
    // measurably bloated the probe stage's generated code
    //
    // PINNED partition count (r17): the skew downstream of this exchange
    // is in PAIR COUNT, not bytes — a coalescer that only sees bytes
    // (AQE) merges the small-in-bytes partitions and serializes the
    // quadratic jaccard work onto one task (measured: the whole
    // audit_split_leakage pair stage ran as 1 task on 32 cores, 10.4 s).
    // An explicit N is exempt from AQE coalescing, so the CPU-dense
    // probe stage keeps ≥ core-count tasks at every scale; N derives
    // from the session (cores / shuffle.partitions), never a constant.
    val np = math.max(
      gramsDf.sparkSession.sparkContext.defaultParallelism,
      gramsDf.sparkSession.sessionState.conf.numShufflePartitions)
    val g = g0.withColumn("b0", bandOf(col("n_g")))
      .repartition(np, col("doc_id"))
    // The probe covers b−1..b+1 because doc_a<doc_b orders by ID, not by
    // size — the smaller-band doc can sit on either side of the pair. The
    // build side keeps its single band, so every qualifying pair matches
    // EXACTLY once (no distinct, no re-dedup shuffle), and both sides
    // carry their gram arrays into the join: the ratio pre-filter and the
    // fused merge run inline on the join's output iterator — candidate
    // rows are born and die in one stage, nothing pair-shaped is ever
    // shuffled or sorted (a staged candidates→distinct→attach-arrays
    // formulation streamed TBs of array payload at 20×).
    //
    // SALTED for parallelism: a few (lang, band) keys can hold most of
    // the corpus, and a join key's within-key cross product executes on
    // ONE task — quadratic work concentrated on a handful of cores (AQE
    // won't split it: the partitions are small in BYTES, the skew is in
    // pair count). The probe carries a deterministic salt of doc_a (one
    // value — no extra array duplication); the build explodes all S
    // salts. Each pair still matches exactly once, at salt(doc_a), and
    // parallelism multiplies by S.
    val salts = 8
    // coalesce keeps the salt expression NON-NULLABLE: otherwise
    // InferFiltersFromConstraints pushes an isnotnull(pmod(...)) below the
    // probe branch's exchange, the two branch children stop canonicalizing
    // equal, and ReuseExchange no longer shares the materialized grams
    val keyCols = blockKeys.map(col)
    val probe = g.select(keyCols ++ Seq(col("doc_id").as("doc_a"),
        col("n_g").as("n_a"), col("grams").as("g_a"),
        coalesce(pmod(xxhash64(col("doc_id")), lit(salts.toLong)), lit(0L))
          .as("salt"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("band")): _*)
    val build = g.select(keyCols ++ Seq(col("b0").as("band"),
        col("doc_id").as("doc_b"), col("n_g").as("n_b"),
        col("grams").as("g_b"),
        explode(sequence(lit(0L), lit(salts - 1L))).as("salt")): _*)
    val jac = graft.functions.SortedIntersect
      .jaccard_sorted(col("g_a"), col("g_b"))
    probe.join(build, blockKeys ++ Seq("band", "salt"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("n_a"), col("n_b")) + eps >=
        greatest(col("n_a"), col("n_b")) * threshold)
      .filter(graft.functions.SortedIntersect
        .jaccard_sorted_ge(col("g_a"), col("g_b"), threshold))
      .select(keyCols ++ Seq(col("doc_a"), col("doc_b"),
        jac.as("jaccard")): _*)
  }

  // ------------------------------------------------- edit distance

  /** Edit-distance (Levenshtein) fuzzy near-dup pairs — the
    * typo/OCR-noise family the token-level operators miss. Scoped BY
    * DEFINITION to (lang, `prefixLen`-char prefix) blocks with the
    * distance computed on `cmpLen`-char prefixes: blocked fuzzy match is
    * the standard trade (unblocked all-pairs Levenshtein is O(n²·L²) and
    * has no sublinear exact structure). Within a block the cost is
    * pairs × O(cmpLen²), bounded by block population — the same
    * skew-guard/salting options as the other pair generators apply if a
    * corpus degenerates into one block.
    */
  def editDistancePairs(
      docs: DataFrame,
      maxDist: Int = 5,
      prefixLen: Int = 8,
      cmpLen: Int = 40): DataFrame = {
    val n = docs.select(col("doc_id"), col("lang"),
      normText(col("text")).as("norm"))
      .withColumn("blk", substring(col("norm"), 1, prefixLen))
      .withColumn("cmp", substring(col("norm"), 1, cmpLen))
    val a = n.select(col("lang"), col("blk"),
      col("doc_id").as("doc_a"), col("cmp").as("cmp_a"))
    val b = n.select(col("lang"), col("blk"),
      col("doc_id").as("doc_b"), col("cmp").as("cmp_b"))
    a.join(b, Seq("lang", "blk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"),
        levenshtein(col("cmp_a"), col("cmp_b")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
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

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): embeddings are
    * pre-clustered (here the `label` column — in production a k-means/IVF
    * assignment), cosine near-dup pairs are verified WITHIN clusters
    * only, pairs close into connected components, and each component
    * keeps its minimum vec_id. Every vector comes back labeled with its
    * component and a `kept` flag — the survivor mask a curation pipeline
    * applies to the training mix.
    *
    * 100 TB shape: the cluster blocking bounds pair generation to
    * within-cell all-pairs (the SemDeDup recipe — cells are sized to
    * make that affordable); components run the same O(log n)-round
    * large-star/small-star contraction as [[Graph.connectedComponents]],
    * shuffling 8-byte id pairs; the survivor flag is a narrow left join
    * of the (tiny) component table back to the corpus.
    */
  def semanticDedup(
      embeddings: DataFrame, threshold: Double = 0.35): DataFrame = {
    val pairs = embeddingNearDupPairs(embeddings, threshold)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
    val comps = Graph.componentsFor(embeddings, "vec_id", pairs)
    embeddings.select(col("vec_id"), col("label"))
      .join(comps, Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("component"),
        (col("vec_id") === col("component")).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** Label-free [[semanticDedup]]: when no pre-clustering exists, learn
    * the cells first with the IVF coarse quantizer
    * ([[Similarity.buildIvfIndex]] — bounded-sample k-means training +
    * ONE assignment scan, cost independent of corpus size beyond the
    * scan) and run the same pair → components → survivor pass within the
    * learned cells. This is the full SemDeDup recipe (Abbas et al. 2023:
    * k-means the embeddings, dedup within clusters); with `label`-style
    * cells already present, use [[semanticDedup]] directly.
    *
    * Not oracle-registered: Spark-ML float k-means centroids are not
    * SQL-replayable (float reduction order). When a replayable clustering
    * is required, [[Clustering.kmeansAssign]] (integer-quantized Lloyd's,
    * hash-matched end-to-end as `embedding_kmeans`) provides the cells.
    * The spec asserts the operator's contract instead — every vector
    * labeled, kept = component minimum, and NO two kept vectors in the
    * same cell are cosine-near-dups (the property the oracle-checked
    * within-cell pass guarantees given any cell assignment).
    */
  def semanticDedupAuto(
      embeddings: DataFrame,
      nlist: Int = 16,
      threshold: Double = 0.35): DataFrame = {
    val idx = Similarity.buildIvfIndex(embeddings, nlist)
    val relabeled = idx.celled.select(col("vec_id"),
      col("unit").as("embedding"), col("cell").as("label"))
    semanticDedup(relabeled, threshold)
      .withColumnRenamed("label", "cell")
  }

  /** Integer-exact SemDeDup: the full semantic-dedup pipeline — cell
    * assignment, within-cell near-dup pairs, connected components,
    * survivor mask — with EVERY stage in exact integer arithmetic, so the
    * whole composition hash-matches a cross-engine SQL replay end to end
    * (registered as `dedup_semdedup_kmeans`). The float variants above
    * carry property specs because float k-means centroids and float
    * cosine thresholds are not bit-replayable; this twin trades a
    * quantization step for audit-grade reproducibility:
    *
    *   - cells: [[Clustering.assignedCorpus]] — integer Lloyd's, oracle-
    *     replayable (md5 seeds, long arithmetic, floor-div updates);
    *   - near-dup predicate: cosine ≥ num/den evaluated on CENTERED
    *     quantized vectors `round(x · 512)` without ever forming a float:
    *     `dot > 0 AND den²·dot² ≥ num²·|a|²·|b|²` (longs throughout —
    *     with |x| < 1 and dim 64, |dot| ≤ 64·512² so den²·dot² ≤ 2.9e18
    *     and num²·|a|²·|b|² ≤ 3.5e17, both inside Long range; the spec
    *     pins the |x| < 1 precondition). Zero-norm vectors (all |x| <
    *     1/1024) have no direction and never pair;
    *   - components: the same large-star/small-star contraction as every
    *     other dedup family ([[Graph.componentsFor]]);
    *   - survivor: minimum vec_id per component.
    *
    * 100 TB shape: identical to [[semanticDedup]] — pair generation is
    * bounded by within-cell all-pairs (cells sized by k), the quantized
    * vectors add one narrow map, and the predicate is a codegen'd long
    * comparison ([[graft.functions.VectorOps.vec_dot_long]]), cheaper per
    * pair than the float dot it replaces.
    */
  def semanticDedupExact(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3,
      thresholdNum: Long = 35,
      thresholdDen: Long = 100): DataFrame = {
    // Overflow guard for the long predicate den²·dot² ≥ num²·|a|²·|b|²:
    // under the documented preconditions (dim ≤ 64, |x| < 1, scale 512)
    // each side is bounded by den²·(64·512²)² = den²·2^48, inside Long
    // iff den ≤ 181. A larger den (or unnormalized input) would silently
    // wrap and flip near-dup decisions — refuse instead.
    require(thresholdNum >= 0 && thresholdNum <= thresholdDen &&
      thresholdDen <= 181,
      s"need 0 <= thresholdNum <= thresholdDen <= 181 (den²·2^48 must stay " +
        s"inside Long range); got $thresholdNum/$thresholdDen")
    val scaleCos = 512.0
    val celled = Clustering.assignedCorpus(embeddings, k, iters)
      .select(col("vec_id"), col("cluster").as("cell"),
        transform(col("embedding"),
          x => round(x.cast("double") * scaleCos).cast("long")).as("qc"))
      .withColumn("nrm",
        graft.functions.VectorOps.vec_dot_long(col("qc"), col("qc")))
    val a = celled.select(col("cell"), col("vec_id").as("vec_a"),
      col("qc").as("q_a"), col("nrm").as("n_a"))
    val b = celled.select(col("cell"), col("vec_id").as("vec_b"),
      col("qc").as("q_b"), col("nrm").as("n_b"))
    val dot = graft.functions.VectorOps.vec_dot_long(col("q_a"), col("q_b"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("dot", dot)
      .filter(col("dot") > 0 && col("n_a") > 0 && col("n_b") > 0 &&
        col("dot") * col("dot") * lit(thresholdDen * thresholdDen) >=
          col("n_a") * col("n_b") * lit(thresholdNum * thresholdNum))
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
    val comps = Graph.componentsFor(celled, "vec_id", pairs)
    celled.select(col("vec_id"), col("cell"))
      .join(comps, Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("component"),
        (col("vec_id") === col("component")).as("kept"))
      .orderBy(col("vec_id"))
  }

  // ------------------------------------------------- sub-document spans

  /** Sub-document (span-level) exact dedup, C4/RefinedWeb-style: the
    * corpus-wide pass that removes REPEATED PASSAGES (boilerplate,
    * licenses, navigation chrome) while keeping each passage's first
    * occurrence. Documents are cut into tumbling `k`-word spans (the
    * single-line corpus stand-in for line/paragraph units); a span is kept
    * iff it is the globally-first occurrence of its content, ordered by
    * (doc_id, span_idx) — a total order, so the survivor set is
    * deterministic and engine-independent.
    *
    * 100 TB shape: span generation is a narrow per-row array expression
    * that hashes each span IN PLACE (no explode until the 32-hex span
    * keys exist), then ONE shuffle keyed on the span hash to rank
    * occurrences, then one (doc_id) shuffle to re-assemble per-doc stats.
    * Both exchanges carry (span_md5, doc_id, idx) — never document text
    * — so the network payload is constant per span regardless of span
    * width. A pathologically hot span (the same license block a billion
    * times) skews one reducer; the mitigation is the same two-level trick
    * the exact-dedup path uses — pre-aggregate min-(doc_id, idx) per
    * (span_key, partition) map-side.
    *
    * Output: per doc, total spans, surviving spans, and a fingerprint of
    * the surviving content: md5 over the ordered sequence of kept span
    * hashes (null when every span was a duplicate) — the audit row a
    * curation pipeline logs per document. Keying and fingerprinting on
    * md5(span) rather than raw text is the same identity the exact-dedup
    * path uses (16-byte key, collision-negligible).
    */
  def spanDedup(docs0: DataFrame, k: Int = 10): DataFrame = {
    // span md5 generation out of the scan stage (r17, [[Fanout]])
    val docs = Fanout.bySessionCores(
      docs0.select(col("doc_id"), col("text")), col("doc_id"))
    val ws = TextAnalysis.wordArray(col("text"))
    val spans = docs
      .select(col("doc_id"),
        when(size(ws) > 0,
          transform(sequence(lit(0), floor((size(ws) - 1).cast("double") / k).cast("int")),
            i => md5(concat_ws(" ", slice(ws, i * k + 1, lit(k))))))
          .otherwise(array().cast("array<string>")).as("span_keys"))
      .select(col("doc_id"),
        posexplode(col("span_keys")).as(Seq("span_idx", "span_key")))
    val ranked = spans.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("span_key")).orderBy(col("doc_id"), col("span_idx"))))
    ranked
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        count(when(col("rn") === 1, lit(1))).as("n_kept"),
        sort_array(collect_list(when(col("rn") === 1,
          struct(col("span_idx"), col("span_key"))))).as("kept"))
      .select(col("doc_id"), col("n_spans"), col("n_kept"),
        when(col("n_kept") > 0,
          md5(concat_ws(" ", transform(col("kept"), x => x("span_key")))))
          .otherwise(lit(null).cast("string")).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------- containment

  /** Directional containment pairs — partial-copy detection, the
    * asymmetric sibling of Jaccard near-dup: C(A→B) = |S(A)∩S(B)| / |S(A)|
    * over distinct word-3-shingle sets. A short doc quoted wholesale
    * inside a long one has high containment but low Jaccard (the union is
    * dominated by B), so [[wordShingleJaccardPairs]] misses exactly the
    * quote/excerpt/boilerplate-embedding duplicates this operator exists
    * for. One row per ORDERED pair (doc_a contained in doc_b) at
    * `pct`-percent containment; both directions can appear.
    *
    * Size banding (the Jaccard blocker) cannot apply — containment puts
    * NO bound on |B|/|A|, that asymmetry being the point — so candidates
    * come from the inverted-index join: postings (gram → doc) self-joined
    * on gram, and |A∩B| is exactly the per-(a,b) match count because
    * shingle sets are distinct (sorted-distinct hash arrays, the
    * [[wordShingleJaccardPairs]] identity; 64-bit collisions are the same
    * documented trade). Candidate generation and intersection counting
    * are ONE join+aggregate — no array re-attachment, nothing pair-shaped
    * carries payload.
    *
    * The integer filter `shared·100 ≥ pct·n_a` is the exact boundary (no
    * float rounding); the reported `containment` ratio is a single
    * correctly-rounded int/int division, bit-equal on any IEEE engine.
    *
    * 100 TB shape: the join cost is Ω(Σ_g df(g)²) — hot shingles
    * (boilerplate sentences) dominate, and unlike the Jaccard path
    * there is no completeness-preserving band to hide behind. `maxDf`
    * drops grams appearing in more than that many docs BEFORE the join —
    * the standard stopword-shingle prune of containment search (cap 0 =
    * off = exact semantics, the oracle's form). A capped run can only
    * lose pairs whose every shared shingle is corpus-hot; the spec pins
    * capped ⊆ exact. Per-gram df itself is one map-side-combinable count
    * over the postings table. Prefix filtering (probe only the
    * (1-pct%)·n_a+1 smallest hashes of A) is the further pruning step at
    * extreme scale; it composes with this plan without changing the
    * aggregate.
    */
  def containmentPairs(
      docs: DataFrame,
      pct: Int = 60,
      maxDf: Long = 0L): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be 1..100, got $pct")
    // shingle hashing out of the scan stage (r17, [[Fanout]]) — the
    // gram join downstream shuffles anyway; this only parallelizes the
    // per-doc hash work when the scan is single-split
    val g = Fanout.bySessionCores(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(
        col("doc_id"),
        graft.functions.MinHash.word_shingle_hashes(normText(col("text")), 3)
          .as("grams"))
      .withColumn("n_g", size(col("grams")).cast("long"))
    val post0 = g.select(col("doc_id"), col("n_g"),
      explode(col("grams")).as("gram"))
    val post =
      if (maxDf <= 0L) post0
      else {
        val wDf = org.apache.spark.sql.expressions.Window
          .partitionBy(col("gram"))
        post0.withColumn("df", count(lit(1)).over(wDf))
          .filter(col("df") <= maxDf).drop("df")
      }
    post.as("a")
      .join(post.select(col("doc_id").as("b_doc"), col("gram")).as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") =!= col("b_doc"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b_doc").as("doc_b"))
      .agg(first(col("a.n_g")).as("n_a"), count(lit(1)).as("shared"))
      .filter(col("shared") * 100L >= lit(pct.toLong) * col("n_a"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("shared"),
        (col("shared").cast("double") / col("n_a").cast("double"))
          .as("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
