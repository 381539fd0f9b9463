package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RollingHash

/** North-star text-analysis operators over the `documents` table (mandated
  * by BASELINE.json; absent from the reference — SURVEY.md §2D): token
  * counting, quality scoring, language-ID heuristic, and document
  * fingerprinting.
  *
  * Everything except the rolling-hash fingerprint is pure built-in column
  * expressions (regexp counts, arithmetic) — single scan, no shuffle, fully
  * pushdown/pruning-friendly: the shape you want for a 100 TB corpus pass.
  * The regex dialect is restricted to constructs Java regex and RE2 share,
  * so the DuckDB oracle runs the identical patterns.
  */
object TextAnalysis {

  private def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Whitespace tokens (runs of non-space). */
  def tokenCountWs(text: Column): Column = countMatches(text, "\\S+")

  /** BPE-ish sub-word tokens: letter runs, digit runs, single punctuation —
    * the classic pre-tokenizer split.
    */
  def tokenCountBpe(text: Column): Column =
    countMatches(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  /** Language-ID by marker-token frequency (n-gram/stopword heuristic).
    * Deterministic argmax with fixed precedence on ties.
    */
  val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of)\\b",
    "data" -> "\\b(data|table|row|column)\\b",
    "query" -> "\\b(query|join|filter|agg)\\b")

  def langScores(text: Column): Seq[(String, Column)] =
    langProfiles.map { case (lang, pat) => lang -> countMatches(text, pat) }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    // argmax with precedence = profile order (strictly-greater comparison)
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Quality features + composite score: length, token stats, punctuation
    * and stopword ratios — the standard cheap pre-filter for training-data
    * curation.
    */
  def withQuality(docs: DataFrame): DataFrame = {
    val text = col("text")
    val nChars = length(text).cast("double")
    val nTokens = tokenCountWs(text)
    val nPunct = countMatches(text, "[^A-Za-z0-9\\s]").cast("double")
    val nStop = countMatches(text, "\\b(the|a|of|and|or|in)\\b").cast("double")
    docs
      .withColumn("n_tokens", nTokens)
      .withColumn("n_tokens_bpe", tokenCountBpe(text))
      .withColumn("avg_token_len",
        when(nTokens > 0, nChars / nTokens.cast("double")).otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(nTokens > 0, nStop / nTokens.cast("double")).otherwise(lit(0.0)))
      .withColumn("quality_score",
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4
          + (lit(1.0) - col("punct_ratio")) * 0.3
          + least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3)
  }

  /** Fingerprints: exact-content md5 plus the rolling hash (custom codegen
    * Expression) over whitespace-normalized text.
    */
  def withFingerprints(docs: DataFrame): DataFrame = {
    val norm = regexp_replace(trim(col("text")), "\\s+", " ")
    docs
      .withColumn("fp_md5", md5(norm))
      .withColumn("fp_rolling", RollingHash.rolling_hash(norm))
  }

  // ------------------------------------------------- term statistics

  /** One row per token occurrence (normalized, whitespace-tokenized).
    * The generator for the term-statistics operators below: explode is
    * narrow; all reduction happens in the consumers' aggregates.
    */
  def tokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(split(Dedup.normText(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")

  /** Per-doc term counts — the single corpus-touching pass both term-
    * statistics operators build on: explode (narrow) + one (doc_id,
    * token) shuffle with map-side partial counts. Everything downstream
    * (global tf, df, rankings) derives from this vocabulary-×-doc-sized
    * table: df(token) is exactly its row count per token (rows = docs
    * containing the token), so no second corpus explode is ever needed.
    */
  def docTermCounts(docs: DataFrame): DataFrame =
    tokens(docs)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus token-frequency head (the Zipf table): term frequency +
    * document frequency, top `topN` by (tf desc, token) — a unique total
    * order, so LIMIT is deterministic. One corpus pass (docTermCounts) +
    * one token-key re-aggregation of the small per-doc table (tf = sum,
    * df = row count — exact, no countDistinct state), then
    * TakeOrderedAndProject for the head — no full sort.
    */
  def tokenFrequencies(docs: DataFrame, topN: Int = 50): DataFrame =
    docTermCounts(docs)
      .groupBy(col("token"))
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(topN)

  /** Per-doc top-k distinctive terms: rank by (tf desc, df asc, token) —
    * the TF-IDF ordering with an INTEGER-EXACT key (df-ascending is
    * monotone in idf; no float log, so the ranking is bit-reproducible
    * across engines and cluster sizes — a deliberate determinism choice
    * over a float score).
    *
    * Shape: ONE corpus pass (docTermCounts), then df attached as a
    * plain count window over the token partition — not a self-join: the
    * aggregate-then-join form re-scanned the corpus (Catalyst prunes the
    * df branch's tf column, the subtrees stop canonicalizing equal, and
    * ReuseExchange drops out — measured 2 full scans). Window form =
    * one scan + two small shuffles on the vocabulary-×-doc table.
    */
  def distinctiveTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val wDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("token"))
    docTermCounts(docs)
      .withColumn("df", count(lit(1)).over(wDf))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"))
  }
}
