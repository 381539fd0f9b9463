package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Dataset-assembly operators for training-data pipelines: deterministic
  * train/val/test splits, exact stratified sampling, weighted multi-source
  * mixing, and a deterministic global shuffle. The reference engine stops
  * at ingest (`/root/reference/internal/router/router.go` routes into
  * tables); these are the downstream assembly steps a corpus consumer
  * needs, built the Spark-first way.
  *
  * DETERMINISM CONTRACT (and the reason every operator here rides on
  * md5): assignments must be (a) reproducible run-over-run, (b) stable
  * under repartitioning — a row's fate depends only on its id, never on
  * partition layout or visit order, (c) portable — the DuckDB oracle
  * computes the identical md5 hex, and all comparisons happen on hex
  * STRINGS (lexicographic = numeric for fixed-width lowercase hex), so
  * no cross-engine integer/float conversion can disagree. `rand(seed)`
  * fails (a): it is seeded per-partition, so a repartition reshuffles
  * every sample.
  *
  * 100 TB shapes:
  *  - [[hashSplit]] / [[weightedMix]]: narrow per-row projections — no
  *    shuffle, no state; they pipeline into the scan.
  *  - [[stratifiedSample]]: one shuffle on the stratum key + a
  *    per-partition sort (rank window); strata are the parallelism unit.
  *  - [[globalShuffle]]: one range-partitioned sort on the hash key plus
  *    a count pass for partition offsets — the canonical distributed
  *    "assign a global position" plan (what RDD.zipWithIndex does under
  *    the hood); no single-partition window anywhere.
  */
object Assembly {

  /** Lowercase md5 hex of (salt ++ id-as-string) — the shared
    * deterministic randomness source. Oracle twin:
    * `md5('salt' || CAST(id AS VARCHAR))`.
    */
  private def hashKey(id: Column, salt: String): Column =
    md5(concat(lit(salt), id.cast("string")).cast("binary"))

  /** The first 4 hex chars as the comparison bucket: 65536-way
    * granularity, compared as a string on both engines.
    */
  private def bucket(id: Column, salt: String): Column =
    substring(hashKey(id, salt), 1, 4)

  /** The 4-hex-digit boundary strings for cumulative weights, computed
    * ONCE driver-side (so neither engine does floating-point at query
    * time): split i gets bucket range [b(i-1), b(i)).
    */
  def splitBoundaries(weights: Seq[Double]): Seq[String] = {
    val total = weights.sum
    require(total > 0, "split weights must sum to a positive value")
    val cums = weights.scanLeft(0.0)(_ + _).tail
    cums.init.map(c =>
      f"${math.min(65535, math.round(c / total * 65536)).toInt}%04x") :+ "ffff~"
    // "ffff~" sorts after every 4-hex bucket: the last split takes the
    // remainder exactly, so coverage is total by construction
  }

  /** Deterministic train/val/test (or any N-way) split: every row is
    * assigned exactly one split label from the hash of its id — stable
    * across runs, partitionings, and engines. Narrow map, zero shuffle.
    *
    * @param splits ordered (name, weight) pairs; weights are normalized
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft"): DataFrame =
    df.withColumn("split", splitExpr(col(idCol), splits, salt))

  /** The split assignment as a pure COLUMN over any id expression — the
    * form consumers use when the split must be recomputed where the id
    * already is (e.g. on a pair table) instead of joined in: split
    * membership is a hash function of the id, so carrying it through a
    * join is never necessary.
    */
  def splitExpr(
      id: Column,
      splits: Seq[(String, Double)],
      salt: String = "graft"): Column = {
    require(splits.nonEmpty)
    val bounds = splitBoundaries(splits.map(_._2))
    val b = bucket(id, salt)
    splits.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), bound), rest) => when(b < bound, name).otherwise(rest)
    }
  }

  /** The DuckDB CASE expression equivalent of [[hashSplit]]'s assignment
    * column, for oracle construction.
    */
  def hashSplitOracleCase(
      idSql: String,
      splits: Seq[(String, Double)],
      salt: String = "graft"): String = {
    val bounds = splitBoundaries(splits.map(_._2))
    val b = s"substring(md5('$salt' || CAST($idSql AS VARCHAR)), 1, 4)"
    splits.zip(bounds).map { case ((name, _), bound) =>
      s"WHEN $b < '$bound' THEN '$name'"
    }.mkString("CASE ", " ", " END")
  }

  /** Exact stratified sample: from every stratum, keep exactly
    * floor(|stratum| * num/den) rows, chosen by hash order (deterministic,
    * engine-portable). The num/den rational keeps the keep-decision in
    * INTEGER arithmetic — `rank * den <= count * num` — so no float ever
    * decides a boundary row. One shuffle (stratum key), rank + count in
    * the same window pass.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      num: Int,
      den: Int,
      salt: String = "graft"): DataFrame = {
    require(num >= 0 && den > 0)
    val w = Window.partitionBy(col(stratumCol))
    val order = w.orderBy(hashKey(col(idCol), salt), col(idCol))
    // _rn is IntegerType: widen before multiplying or strata beyond
    // Int.MaxValue/den rows overflow (ANSI failure / wraparound keep).
    // row_number itself caps a single stratum at 2^31 rows — beyond that
    // the stratum needs sub-keying before sampling.
    df.withColumn("_rn", row_number().over(order))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_rn").cast("long") * den <= col("_n") * num)
      .drop("_rn", "_n")
  }

  /** Weighted multi-source mix: keep each row with its source's rate,
    * deterministically by id hash — the "mix Wikipedia at 3 epochs,
    * CommonCrawl at 0.3" assembly step. Per-row narrow op; rates > 1 are
    * clamped to 1 (upsampling is a separate `explode`-style op).
    *
    * @param rates    per-source keep rate; sources absent from the map
    *                 use `defaultRate`
    */
  def weightedMix(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    val b = bucket(col(idCol), salt)
    val bound = rates.toSeq.sortBy(_._1).foldRight(lit(boundHexOf(defaultRate))) {
      case ((src, rate), rest) =>
        when(col(sourceCol) === src, boundHexOf(rate)).otherwise(rest)
    }
    df.filter(b < bound)
  }

  /** DuckDB WHERE-clause twin of [[weightedMix]]'s keep predicate. */
  def weightedMixOracleWhere(
      sourceSql: String,
      idSql: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "graft"): String = {
    val b = s"substring(md5('$salt' || CAST($idSql AS VARCHAR)), 1, 4)"
    val cases = rates.toSeq.sortBy(_._1).map { case (src, rate) =>
      s"WHEN $sourceSql = '$src' THEN '${boundHexOf(rate)}'"
    }.mkString("CASE ", " ", s" ELSE '${boundHexOf(defaultRate)}' END")
    s"$b < $cases"
  }

  private def boundHexOf(rate: Double): String =
    if (rate >= 1.0) "ffff~"
    else f"${math.max(0, math.min(65535, math.round(rate * 65536))).toInt}%04x"

  /** Temperature-controlled source mixing — the alpha-sampling rule the
    * multilingual/multi-corpus training mixes use (GPT-3, NLLB, mT5):
    * source s gets mixture weight ∝ n_s^(1/T), so T=1 reproduces natural
    * proportions and T→∞ approaches uniform-over-sources; the per-source
    * keep rate is min(1, budget·w_s/n_s) against a `targetFraction`
    * budget of the corpus. Rates derive from per-source COUNTS, so this
    * is a two-pass op: one count aggregation (collected driver-side —
    * state is source-cardinality-bounded, the dataset/domain-bucket
    * granularity real mixes use, NOT per-doc), then [[weightedMix]]'s
    * narrow deterministic hash filter with the computed rates.
    *
    * Oracle note: the rate arithmetic (pow, sum, divide) is recomputed
    * in SQL; both engines round to the same 4-hex bucket boundary, so a
    * disagreement requires a rate within ~1e-11 of a 1/65536 boundary —
    * checked against the static corpus, where it is observably not the
    * case (and any regeneration re-verifies via the hash gate).
    */
  def temperatureMix(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      temperature: Double = 2.0,
      targetFraction: Double = 0.5,
      salt: String = "graft"): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val counts = df.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val wPow = counts.map { case (s, n) =>
      s -> math.pow(n.toDouble, 1.0 / temperature) }
    val z = wPow.toSeq.sortBy(_._1).map(_._2).sum
    val budget = targetFraction * total
    val rates = counts.map { case (s, n) =>
      s -> math.min(1.0, budget * (wPow(s) / z) / n.toDouble) }
    weightedMix(df, sourceCol, idCol, rates, defaultRate = 0.0, salt)
  }

  /** Weighted mix WITH upsampling — the "this source for 2.5 epochs"
    * assembly step: rate r yields floor(r) guaranteed copies of every row
    * plus one more for the deterministic hash-selected frac(r) fraction.
    * Each copy is tagged 0..n-1 in `copy` so downstream shuffles can
    * separate replicas. Narrow generator (explode of a tiny sequence) —
    * no shuffle, and the copy count never depends on partition layout.
    */
  def weightedMixEpochs(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    def base(rate: Double): Int = math.floor(rate).toInt
    def fracHex(rate: Double): String = boundHexOf(rate - base(rate))
    val b = bucket(col(idCol), salt)
    val sorted = rates.toSeq.sortBy(_._1)
    val baseCol = sorted.foldRight(lit(base(defaultRate))) {
      case ((src, r), rest) =>
        when(col(sourceCol) === src, base(r)).otherwise(rest)
    }
    val fracBound = sorted.foldRight(lit(fracHex(defaultRate))) {
      case ((src, r), rest) =>
        when(col(sourceCol) === src, fracHex(r)).otherwise(rest)
    }
    val nCopies = (baseCol + when(b < fracBound, 1).otherwise(0)).as("n_copies")
    df.withColumn("n_copies", nCopies)
      .filter(col("n_copies") > 0)
      .withColumn("copy",
        explode(sequence(lit(0), (col("n_copies") - 1).cast("int"))))
      .drop("n_copies")
  }

  /** DuckDB n_copies expression twin of [[weightedMixEpochs]]. */
  def weightedMixEpochsOracleCopies(
      sourceSql: String,
      idSql: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "graft"): String = {
    def base(rate: Double): Int = math.floor(rate).toInt
    def fracHex(rate: Double): String = boundHexOf(rate - base(rate))
    val b = s"substring(md5('$salt' || CAST($idSql AS VARCHAR)), 1, 4)"
    val sorted = rates.toSeq.sortBy(_._1)
    val baseSql = sorted.map { case (src, r) =>
      s"WHEN $sourceSql = '$src' THEN ${base(r)}"
    }.mkString("CASE ", " ", s" ELSE ${base(defaultRate)} END")
    val fracSql = sorted.map { case (src, r) =>
      s"WHEN $sourceSql = '$src' THEN '${fracHex(r)}'"
    }.mkString("CASE ", " ", s" ELSE '${fracHex(defaultRate)}' END")
    s"($baseSql) + (CASE WHEN $b < ($fracSql) THEN 1 ELSE 0 END)"
  }

  /** Deterministic global shuffle: every row gets a unique position
    * 0..n-1 in hash-of-id order — the "shuffle the corpus once, read it
    * sequentially forever" training-data step. Implemented as a
    * range-partitioned sort on the hash key followed by zipWithIndex
    * (per-partition counts → cumulative offsets → local enumeration):
    * both passes are linear and distributed; nothing funnels through one
    * partition. Output adds `pos` (long, dense from 0).
    */
  def globalShuffle(
      df: DataFrame,
      idCol: String,
      salt: String = "graft"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .withColumn("_hkey", hashKey(col(idCol), salt))
      .orderBy(col("_hkey"), col(idCol))
    val outSchema = StructType(sorted.schema.fields)
      .add("pos", LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, outSchema).drop("_hkey")
  }

  /** Balanced-shard assignment + audit manifest — the layout step that
    * hands a curated corpus to the training loader: deterministic
    * hash-shuffled dense positions ([[globalShuffle]]) cut into
    * `docsPerShard`-sized shards, with one manifest row per shard
    * (docs, payload size, id range). Every shard is exactly full except
    * the last, the assignment is replay-stable under any partitioning,
    * and the manifest is the thing a loader checksums before an epoch.
    *
    * Scale shape: globalShuffle's two linear passes + one shard-keyed
    * aggregation; the manifest is shard-cardinality-sized. The actual
    * write ([[writeShardsWithManifest]]) partitions by the shard column
    * so each shard lands as its own directory.
    */
  def shardManifest(
      df: DataFrame,
      idCol: String,
      docsPerShard: Int,
      sizeCol: String): DataFrame =
    withShards(df, idCol, docsPerShard)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("n_bytes"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
      .orderBy(col("shard"))

  /** The shard assignment itself: dense hash position / docsPerShard. */
  def withShards(
      df: DataFrame, idCol: String, docsPerShard: Int): DataFrame = {
    require(docsPerShard > 0, s"docsPerShard must be > 0, got $docsPerShard")
    globalShuffle(df, idCol)
      .withColumn("shard",
        floor(col("pos") / lit(docsPerShard.toDouble)).cast("long"))
  }

  /** Write the sharded corpus (one directory per shard via partitionBy)
    * and return the manifest for the caller to persist alongside.
    */
  def writeShardsWithManifest(
      df: DataFrame,
      idCol: String,
      docsPerShard: Int,
      sizeCol: String,
      path: String): DataFrame = {
    withShards(df, idCol, docsPerShard)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    shardManifest(df, idCol, docsPerShard, sizeCol)
  }

  /** Curriculum ordering: a dense global training order that presents
    * documents easiest-first (difficulty ascending) while SHUFFLING within
    * each difficulty level (md5 tiebreak — the determinism contract above),
    * so the loader reads a curriculum, not a sorted-by-length artifact.
    * `rank` is dense from 1 over the unique total order
    * (difficulty, md5(doc_id·salt), doc_id).
    *
    * 100 TB shape: identical to [[globalShuffle]] — a range-partitioned
    * sort on the (difficulty, tie) key plus the zipWithIndex offset pass;
    * both passes linear and distributed, no single-partition window. The
    * oracle recomputes the rank as a `row_number` over the same total
    * order, pinning the distributed enumeration to the sequential
    * definition.
    */
  def curriculumOrder(
      docs: DataFrame,
      difficulty: Column,
      salt: String = "curriculum"): DataFrame = {
    val spark = docs.sparkSession
    val sorted = docs
      .select(
        col("doc_id"),
        difficulty.cast("long").as("difficulty"),
        md5(concat(lit(salt), col("doc_id").cast("string")).cast("binary"))
          .as("tie"))
      .orderBy(col("difficulty"), col("tie"), col("doc_id"))
    val outSchema = StructType(sorted.schema.fields)
      .add("rank", LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, outSchema)
      .select(col("doc_id"), col("difficulty"), col("rank"))
  }

  /** Greedy sequence packing: walk each source's docs in doc_id order and
    * append to the current training sequence until the token budget would
    * overflow, then start the next one — the standard "pack short docs
    * into fixed-length contexts" step before tokenizer/loader handoff.
    * A doc longer than the budget gets a sequence of its own (it will be
    * truncated downstream; the packer never splits a doc).
    *
    * Greedy packing is inherently sequential PER GROUP — seq_id(i) depends
    * on every earlier doc in the same source — so the source is the
    * parallelism unit: one hash repartition on `source`, a per-partition
    * (source, doc_id) sort, and a single forward pass with O(1) state per
    * partition (mapPartitions; state resets on source change, so many
    * sources per partition are fine). At 100 TB the unit would be
    * (source, shard) with shards cut on ingest boundaries — the pass and
    * its guarantees are unchanged.
    *
    * Output: (doc_id, source, n_tokens, seq_id) with seq_id dense from 1
    * per source. Deterministic under any partition count: the order the
    * fold sees is fixed by the sort, and assignment depends only on it.
    */
  def packSequences(docs: DataFrame, tokenBudget: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("source"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        var cur: String = null
        var seq = 0L
        var acc = 0L
        it.map { case (id, src, n) =>
          if (src != cur) { cur = src; seq = 1L; acc = n }
          else if (acc + n > tokenBudget) { seq += 1L; acc = n }
          else acc += n
          (id, src, n, seq)
        }
      }
      .toDF("doc_id", "source", "n_tokens", "seq_id")
  }

  /** Packing-efficiency audit over [[packSequences]]: one row per packed
    * bin — `(source, seq_id, n_docs, tokens_used, budget, overflow)` —
    * the loader-utilization report a training run logs before committing
    * to a packing (wasted budget = padding FLOPs; `overflow` marks bins
    * holding a single over-budget doc that downstream truncation will
    * cut). All integers/booleans, so the audit hash-matches the oracle's
    * replay of the same greedy fold.
    *
    * 100 TB shape: the packer's own (source-keyed) exchange plus one
    * partial-aggregated groupBy on (source, seq_id) — bin count rows, not
    * doc rows, reach the reducers.
    */
  def packEfficiency(docs: DataFrame, tokenBudget: Int = 256): DataFrame =
    packSequences(docs, tokenBudget)
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_used"))
      .select(col("source"), col("seq_id"), col("n_docs"),
        col("tokens_used"), lit(tokenBudget.toLong).as("budget"),
        (col("tokens_used") > tokenBudget.toLong).as("overflow"))
      .orderBy(col("source"), col("seq_id"))

  /** Context-window chunking: cut each document's word stream into
    * fixed-size windows of `window` words advancing by `stride` words
    * (overlap = window - stride) — the standard prep step between
    * curation and tokenization when documents exceed the model's context
    * length. Start positions are 0, stride, 2·stride, … while the start
    * is inside the document, so every word is covered, the tail chunk may
    * be short, and a document shorter than one window still yields
    * exactly one chunk; empty docs yield none.
    *
    * Output: (doc_id, chunk_idx, chunk_start, n_tokens, chunk_md5) —
    * position, length, and content fingerprint per chunk, ordered.
    *
    * 100 TB shape: narrow — tokenize, sequence-of-starts explode, and
    * HOF slice all pipeline into the scan; no shuffle, no state. The
    * chunk TEXT never leaves the row (the output carries its md5), so
    * the result is manifest-sized even when the corpus is not. A caller
    * that wants the chunk bodies materialized swaps the md5 projection
    * for `concat_ws(" ", chunk)` — the plan shape is identical.
    */
  def chunkWindows(
      docs: DataFrame,
      window: Int = 50,
      stride: Int = 40): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride")
    docs
      .select(col("doc_id"),
        TextAnalysis.wordArray(col("text")).as("ws"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("ws"), col("n_words"),
        explode(sequence(lit(0L),
          floor((col("n_words") - 1) / lit(stride)).cast("long")))
          .as("chunk_idx"))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .withColumn("chunk",
        slice(col("ws"), (col("chunk_start") + 1).cast("int"), lit(window)))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("chunk_start"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }
}
