package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pipeline a training-data
  * build runs at 100 TB: quality-score → threshold filter → exact dedup →
  * deterministic split. Composition order is the scale story:
  *
  *  1. quality scoring is COLUMNAR (one scan, codegen'd regex counts) and
  *     the threshold filter runs before anything shuffles, so low-quality
  *     rows never cost network;
  *  2. exact dedup shuffles only survivors, on a 16-byte md5 key;
  *  3. the split assignment is a narrow map on the dedup output.
  *
  * Net: ONE shuffle (the dedup key) over the quality-surviving fraction of
  * the corpus; every stage is an already-oracle-checked operator
  * ([[TextAnalysis.withQuality]], [[Dedup.normText]] survivorship,
  * [[Assembly.hashSplit]]) so the composition itself is what this
  * operator (and its oracle) verifies.
  */
object Curation {

  def curate(
      docs: DataFrame,
      minQuality: Double = 0.5,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    val scored = TextAnalysis.withQuality(docs)
      .filter(col("quality_score") >= minQuality)
    val deduped = scored
      .withColumn("content_key", md5(Dedup.normText(col("text"))))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("content_key")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
    Assembly.hashSplit(deduped, "doc_id", splits)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"), col("split"))
  }

  /** End-to-end NEAR-duplicate curation — the production big sibling of
    * [[curate]]: quality filter → exact n-gram Jaccard near-dup pairs →
    * connected components → keep each component's minimum doc_id →
    * deterministic split. This is the pass real corpus builds run (near
    * dups, not just byte dups, dominate web-scale redundancy), composed
    * from operators that each already carry their own oracle
    * (withQuality, ngramJaccardPairs, Graph.componentsFor,
    * Assembly.hashSplit) — so the full composition is DuckDB-checkable.
    *
    * Scale story, in order: (1) the quality filter is columnar and runs
    * before ANY pair work, so rejected docs never enter candidate
    * generation; (2) pair generation is the banded+salted exact join
    * (Ω(pairs) floor documented in SCALING.md — swap in minhashLshPairs
    * for the approximate path at larger thresholds, same downstream);
    * (3) clustering is O(log n)-round star contraction, shuffling 16-byte
    * id pairs; (4) survivor selection is doc_id == component (component
    * id IS the member minimum), a narrow filter; (5) the split is a
    * narrow hash map.
    */
  def curateNearDup(
      docs: DataFrame,
      minQuality: Double = 0.5,
      threshold: Double = 0.7,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    val scored = TextAnalysis.withQuality(docs)
      .filter(col("quality_score") >= minQuality)
    val pairs = Dedup.ngramJaccardPairs(scored, threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val comps = Graph.componentsFor(scored, "doc_id", pairs)
    val survivors = scored
      .join(comps, Seq("doc_id"))
      .filter(col("doc_id") === col("component"))
    Assembly.hashSplit(survivors, "doc_id", splits)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"), col("split"))
  }

  /** Benchmark decontamination — the APPLY side of
    * [[TextAnalysis.contamination]]: drop every corpus doc whose distinct
    * word-n-gram overlap with the benchmark set reaches `flagThreshold`,
    * carrying the ratio on each survivor so the cut is reviewable
    * downstream. The pass every serious training build runs before the
    * eval suite means anything.
    *
    * Scale shape: two corpus scans (the audit's gram pass, then the
    * survivor projection) plus ONE doc_id-keyed join of the corpus
    * against the per-doc audit — no text ever enters the audit shuffle
    * (the audit aggregates hashed-gram tuples), and the benchmark gram
    * set broadcasts exactly as in the audit. Deliberately NOT fused into
    * one scan: carrying `text` through the audit's posexplode would put
    * the full corpus payload on the exchange, which is the expensive
    * resource at 100 TB; a second columnar scan is not.
    */
  def decontaminate(
      docs: DataFrame,
      isBenchmark: org.apache.spark.sql.Column,
      n: Int = 5,
      flagThreshold: Double = 0.5): DataFrame = {
    val clean = TextAnalysis
      .contamination(docs, isBenchmark, n, flagThreshold)
      .filter(!col("contaminated"))
      .select(col("doc_id"), col("contamination_ratio"))
    docs.filter(!isBenchmark).join(clean, Seq("doc_id"))
  }

  /** Split-leakage audit — the QA gate between assembly and training:
    * near-duplicate pairs that CROSS the train/val/test boundary are
    * evaluation leakage (the eval doc is "in" the training set up to
    * near-duplication), and this lists every such pair with its splits
    * and similarity. A clean corpus returns zero rows; every returned row
    * is a doc to move or drop before the eval numbers mean anything.
    *
    * 100 TB shape: pair generation is [[Dedup.ngramJaccardPairs]]'s
    * banded+salted exact join (the audited Ω(pairs) floor); the split
    * labels are NOT joined in — split membership is a pure hash function
    * of the id ([[Assembly.splitExpr]]), so both labels are computed
    * directly on the pair rows. Net cost over the pair scan: two md5s per
    * pair, zero extra shuffles.
    */
  def splitLeakage(
      docs: DataFrame,
      threshold: Double = 0.6,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      salt: String = "graft"): DataFrame =
    Dedup.ngramJaccardPairs(docs, threshold)
      .withColumn("split_a", Assembly.splitExpr(col("doc_a"), splits, salt))
      .withColumn("split_b", Assembly.splitExpr(col("doc_b"), splits, salt))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Per-source (per-domain) document cap: keep the `maxPerSource`
    * largest docs per source (n_chars desc, doc_id tiebreak — a total
    * order, so the cut is deterministic). The anti-over-representation
    * guard every web-scale corpus applies so no single domain dominates
    * the training mix.
    *
    * TWO-PHASE at scale: phase 1 ([[localTopPerSource]]) keeps each
    * input partition's top `maxPerSource` rows per source with a bounded
    * in-memory heap — a narrow map, NO shuffle, and provably lossless
    * (a row outside its partition's local top-N cannot be in the global
    * top-N). The global `row_number` window then sees at most
    * N × partitions rows per source, so a billion-doc domain costs one
    * reducer a bounded sort instead of a billion-row sort — the
    * single-window formulation's scale-killer.
    */
  def capPerSource(docs: DataFrame, maxPerSource: Int = 20): DataFrame =
    localTopPerSource(docs, maxPerSource)
      .withColumn("rank_in_source", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
      .filter(col("rank_in_source") <= maxPerSource)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("rank_in_source"))

  /** Token-budget composition table — the "what fills my training budget"
    * report every mixing decision starts from: per source, document and
    * token counts plus the cumulative token share when sources are taken
    * largest-first. The cumulative column answers "how many sources cover
    * 90% of the budget" directly; feeding `Assembly.temperatureMix` /
    * `weightedMix` with rates derived from this table is the standard
    * loop.
    *
    * 100 TB shape: ONE corpus scan into a source-keyed aggregate with
    * map-side partial sums (tokens counted per row by a codegen'd size —
    * no explode); everything after operates on the source-cardinality
    * table (tens of rows in real mixes), where the global-order cumsum
    * window's single-partition funnel is free. `cum_share` divides two
    * exact longs — one correctly-rounded IEEE op, oracle-exact.
    */
  def tokenBudget(docs: DataFrame): DataFrame = {
    val per = docs
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.wordArray(col("text"))).cast("long"))
          .as("n_tokens"))
    val ord = Window.orderBy(col("n_tokens").desc, col("source"))
    val wCum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy()
    per
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wCum))
      .withColumn("cum_share",
        col("cum_tokens").cast("double") /
          sum(col("n_tokens")).over(wTot).cast("double"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("cum_tokens"), col("cum_share"))
      .orderBy(col("n_tokens").desc, col("source"))
  }

  /** Phase 1 of [[capPerSource]]: per-PARTITION top-`n` per source, as a
    * bounded-memory heap fold (worst kept row at the heap head, evicted
    * on a better arrival). State is `sources-per-partition × n` tuples —
    * constant per task however large the partition. Exposed package-wide
    * so specs can assert the bound, not just the final answer.
    */
  private[graft] def localTopPerSource(
      docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // head of the queue = WORST kept row: smallest n_chars, then largest
    // doc_id — eviction compares against it in O(1), replaces in O(log n)
    val worstFirst: Ordering[(Long, Long)] =
      Ordering.by { case (nChars, docId) => (-nChars, docId) }
    docs
      .select(col("doc_id").cast("long"), col("source").cast("string"),
        col("n_chars").cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
        it.foreach { case (docId, source, nChars) =>
          val h = heaps.getOrElseUpdate(source,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          if (h.size < n) h.enqueue((nChars, docId))
          else if (worstFirst.lt((nChars, docId), h.head)) {
            h.dequeue(); h.enqueue((nChars, docId))
          }
        }
        heaps.iterator.flatMap { case (source, h) =>
          h.iterator.map { case (nChars, docId) => (docId, source, nChars) }
        }
      }
      .toDF("doc_id", "source", "n_chars")
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw document
    * by how much its hashed-bigram feature profile resembles a TARGET slice
    * of the corpus, and keep the top k. This is the standard recipe for
    * "give me the k web pages that look most like Wikipedia" — the
    * domain-targeting complement of the model-based [[TextAnalysis.classifierScore]].
    *
    * Features are bigrams hashed into `buckets` buckets (md5-derived, the
    * portable hash the oracle reproduces). Per-bucket importance weight is
    * the add-one-smoothed target/raw frequency ratio on an integer
    * lattice, CENTERED at the corpus-wide target rate:
    *
    *   w(b) = ((ct(b) + 1) · scale) div (cr(b) + 1)
    *        − ((CT + 1) · scale) div (CR + 1)
    *
    * with ct = target-slice occurrences of bucket b, cr = whole-pool
    * occurrences, CT/CR the corpus totals. The centering is what makes the
    * weight behave like the paper's log-likelihood ratio: a bucket that is
    * target-typical scores positive, one the target avoids scores NEGATIVE
    * — so an off-target document gets monotonically WORSE with length
    * instead of accumulating spurious positive mass (the failure mode of
    * an uncentered ratio sum). A doc's score is Σ w(bucket) over its
    * bigram occurrences — the integer proxy for the log-ratio sum (same
    * determinism trade as searchTopK's idf lattice: score bit-reproducible
    * cross-engine; the paper's Gumbel resampling step is replaced by the
    * deterministic top-k cut, its zero-temperature limit).
    *
    * 100 TB shape: ONE corpus tokenization pass produces the
    * (doc, bucket, count) partials; BOTH count tables derive from it (the
    * target slice is a conditional sum, never a second scan). The weight
    * table is bucket-sized — broadcast — so scoring is a narrow join plus
    * one doc-keyed sum. Global top-k membership WITHOUT a global sort: the
    * k-th order key comes from TakeOrderedAndProject (per-partition heaps)
    * and is broadcast as one row; `selected` is then a narrow comparison.
    * Output keeps every doc (scored audit), so downstream can re-cut at a
    * different k without re-scoring.
    */
  def dsirSelect(
      docs: DataFrame,
      isTarget: Column,
      buckets: Int = 1024,
      k: Int = 100,
      scale: Long = 1000000L): DataFrame = {
    // corpus totals need no gram materialization at all: per-doc bigram
    // count = max(words − 1, 0), a narrow column scan
    val ws = TextAnalysis.wordArray(col("text"))
    val nb = greatest(size(ws) - 1, lit(0)).cast("long")
    val totals = docs.agg(
      sum(nb).as("cr_total"),
      sum(when(isTarget, nb).otherwise(0L)).as("ct_total"))
    // codegen'd bucket ids (GramBucketsExpr): same md5-derived bucket the
    // oracle recomputes, ~10× the interpreted HOF string-gram pipeline.
    // ONE corpus subtree end to end: (doc, bucket) partials, then cr/ct as
    // bucket-partition window sums (no self-join back onto a second
    // evaluation of the same subtree — the plan-duplication trap), then
    // the doc-keyed scoring sum.
    val dbc = docs.select(
      col("doc_id"), isTarget.as("is_target"),
      explode(graft.functions.GramBuckets.gram_buckets(
        TextAnalysis.normWords(col("text")), 2, buckets)).as("bucket"))
      .groupBy(col("doc_id"), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val wBucket = Window.partitionBy(col("bucket"))
    val scored = dbc
      .withColumn("cr", sum(col("cnt")).over(wBucket))
      .withColumn("ct",
        sum(when(col("is_target"), col("cnt")).otherwise(0L)).over(wBucket))
      .crossJoin(broadcast(totals))
      .withColumn("w",
        expr(s"((ct + 1) * ${scale}L) div (cr + 1)" +
          s" - ((ct_total + 1) * ${scale}L) div (cr_total + 1)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("w")).as("dsir_score"))
    // the scored audit is consumed TWICE (k-th key + final output); a lazy
    // localCheckpoint materializes the narrow (doc_id, 2×long) table once
    // instead of re-running the corpus subtree — the "persist the audit
    // table" shape a 100 TB run would use
    val all = docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("dsir_score"), lit(0L)).as("dsir_score"))
      .localCheckpoint(eager = false)
    // k-th order key under (score desc, doc_id asc) == max of the
    // ascending key struct(-score, doc_id) over the top-k rows
    val kth = all
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(k)
      .agg(max(struct((-col("dsir_score")).as("ns"),
        col("doc_id").as("d"))).as("kth"))
    all.crossJoin(broadcast(kth))
      .withColumn("selected",
        struct((-col("dsir_score")).as("ns"), col("doc_id").as("d"))
          <= col("kth"))
      .drop("kth")
      .orderBy(col("doc_id"))
  }

  /** End-to-end corpus-BUILD census — the composed pipeline a full
    * training-data build runs, reported as one funnel table: how many
    * documents survive each stage of
    *
    *   input → quality filter → URL dedup → exact dedup → per-source cap
    *         → train/val/test split
    *
    * (the DataComp/RefinedWeb-style build recipe, each stage an
    * already-oracle-checked operator of this engine: quality =
    * [[TextAnalysis.withQuality]] threshold, URL dedup = largest doc per
    * [[Urls.canonicalize]] key, exact dedup = [[Dedup.exactDedup]]
    * min-id survivor, cap = [[capPerSource]], split =
    * [[Assembly.hashSplit]]). The census is what a build operator reads
    * FIRST — a stage that eats 90% of the corpus is either doing its job
    * or misconfigured, and this table is how you tell.
    *
    * Output: `(stage_idx, stage, n_docs)` — the five stage survivor
    * counts plus one row per split of the final corpus.
    *
    * 100 TB shape: the composition inherits each stage's documented
    * shape (columnar quality rejection before any exchange, one
    * canonical-key shuffle, one content-key shuffle, the two-phase
    * source cap, a narrow split map). Each stage frontier is
    * MATERIALIZED via `materialize` (default: eager localCheckpoint —
    * the [[Dedup.thresholdSweep]] pattern; on a cluster pass
    * `_.checkpoint()` for fault-tolerant storage — the policy is a
    * parameter, not an edit; note the default makes CONSTRUCTING the
    * report eager) before the census aggregates read it: Spark has no
    * cross-branch
    * common-subexpression elimination, so unioned lazy 1-row aggregates
    * would re-execute the whole prefix pipeline once per census branch
    * (ReuseExchange dedupes only the identical shuffle exchanges, not
    * the narrow pre-exchange work — at 100 TB the census would cost a
    * multiple of the build it audits). With checkpointed frontiers every
    * stage runs EXACTLY ONCE — each census branch aggregates an
    * already-materialized frontier, and the input corpus is scanned once
    * for the build plus once for the input-count row
    * (CurationOpsSpec asserts the single-scan receipt on the census
    * plan). The frontier tables are also what the build itself hands to
    * the next stage, so materialization is work the build pays anyway.
    */
  def buildReport(
      docs: DataFrame,
      url: Column,
      minQuality: Double = 0.5,
      maxPerSource: Int = 50,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    // every stage frontier is materialized ONCE and then read both by
    // the next stage and by its census branch — see the 100 TB note
    // above for why lazy branches re-execute
    val quality = materialize(TextAnalysis.withQuality(docs)
      .filter(col("quality_score") >= minQuality))
    // the SAME survivor rule as Urls.urlDedup, by construction
    val urlKept = materialize(Urls
      .keepLargestPerCanonical(quality.withColumn("_url", url), col("_url"))
      .drop("_url", "canonical_url", "n_dups"))
    val exact = materialize(Dedup.exactDedup(urlKept))
    val capped = materialize(capPerSource(exact, maxPerSource))
    val withSplit = materialize(Assembly.hashSplit(
      capped.select(col("doc_id")), "doc_id", splits))
    val stages: Seq[(String, DataFrame)] = Seq(
      "input" -> docs,
      "quality" -> quality,
      "url_dedup" -> urlKept,
      "exact_dedup" -> exact,
      "domain_cap" -> capped) ++
      splits.map { case (name, _) =>
        s"split_$name" -> withSplit.filter(col("split") === name)
      }
    stages.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"))
    }.reduce(_.unionAll(_)).orderBy(col("stage_idx"))
  }

  /** CCNet-style per-language LM-score bucketing (Wenzek et al. 2020):
    * split each language's documents into head / middle / tail terciles
    * by the corpus-trained bigram LM score ([[TextAnalysis.lmScore]] —
    * the perplexity proxy; higher average transition mass = more
    * LM-typical text). CCNet trains on "head", audits "middle", drops
    * "tail"; this operator produces that partition plus the per-bucket
    * census.
    *
    * Boundaries are value-lattice cuts: b1 = smallest score whose
    * cumulative count reaches ⌈n/3⌉, b2 likewise at ⌈2n/3⌉; bucket is a
    * pure function of (lang, score), so tied scores land together
    * (bucket sizes deviate from n/3 exactly by ties — deterministic,
    * documented). Integer end to end — the oracle replays the identical
    * recurrence and cuts.
    *
    * Output: `(lang, bucket, n_docs, min_avg, max_avg)`.
    *
    * 100 TB shape: lmScore's one tokenization pass + vocabulary-sized
    * model; bucketing adds a (lang, score)-histogram aggregate whose
    * cumulative windows run on the score LATTICE (value-cardinality
    * rows, corpus-size-independent — [[Behavior.madOutliers]]'s median
    * shape), a broadcast boundary join, and one (lang, bucket) partial
    * agg. The doc table never sorts.
    */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val lm = TextAnalysis.lmScore(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val hist = lm.groupBy(col("lang"), col("lm_avg"))
      .agg(count(lit(1)).as("cnt"))
    val cumW = Window.partitionBy(col("lang")).orderBy(col("lm_avg"))
    val totW = Window.partitionBy(col("lang"))
    val bounds = hist
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(totW))
      .groupBy(col("lang"))
      .agg(
        min(when(col("cum") * 3 >= col("n"), col("lm_avg"))).as("b1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("lm_avg"))).as("b2"))
    lm.join(broadcast(bounds), "lang")
      .withColumn("bucket",
        when(col("lm_avg") <= col("b1"), "tail")
          .when(col("lm_avg") <= col("b2"), "middle")
          .otherwise("head"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("lm_avg")).as("min_avg"),
        max(col("lm_avg")).as("max_avg"))
      .orderBy(col("lang"), col("bucket"))
  }
}
