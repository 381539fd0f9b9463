package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-update audit a long-lived
  * training corpus needs: given yesterday's snapshot and today's, report
  * per-document what was added, removed, changed, or unchanged, by
  * content fingerprint. The reference engine appends rows forever
  * (`/root/reference/internal/db/db.go` INSERT path) and leaves "what
  * changed between loads" to the operator; this is that operator,
  * Spark-first.
  *
  * 100 TB shape: one key-partitioned shuffle per side feeding a
  * sort-merge full-outer join — the minimum data movement any diff can
  * do. Only (key, 16-byte fingerprint) crosses the network: text is
  * hashed in place at the scan, so the join carries ~24 bytes/doc
  * regardless of document size. When both snapshots are written bucketed
  * by the key (Sink.writeBucketed), the exchange disappears entirely and
  * the diff is a zero-shuffle zip of co-located buckets.
  */
object Snapshot {

  /** Per-document diff of two corpus snapshots keyed by `keyCol`,
    * comparing md5 of `textCol`. Output: (keyCol, old_md5, new_md5,
    * status) with status ∈ added | removed | changed | unchanged,
    * ordered by key. `added` = only in `newDf`, `removed` = only in
    * `oldDf`.
    */
  def corpusDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val o = oldDf.select(col(keyCol).as("k"), md5(col(textCol)).as("old_md5"))
    val n = newDf.select(col(keyCol).as("k"), md5(col(textCol)).as("new_md5"))
    o.join(n, Seq("k"), "full_outer")
      .select(
        col("k").as(keyCol),
        col("old_md5"),
        col("new_md5"),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .orderBy(col(keyCol))
  }

  /** Roll-up of [[corpusDiff]]: rows and distinct-content counts per
    * status — the one-line health check before promoting a snapshot.
    */
  def diffSummary(diff: DataFrame, keyCol: String = "doc_id"): DataFrame =
    diff.groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(coalesce(col("new_md5"), col("old_md5")))
          .as("n_distinct_contents"))
      .orderBy(col("status"))

  /** Vocabulary drift between two corpus snapshots — the TERM-level
    * companion to [[corpusDiff]]'s document-level view: the topK tokens
    * whose relative frequency moved most between snapshots (crawl shift,
    * new spam family, a source turning over, a tokenizer regression all
    * show up here before any model metric does).
    *
    * Rates live on an integer ppm lattice (`count·10⁶ div total` per
    * side), drift = |rate_a − rate_b| — exact longs end to end, so the
    * topK cut (drift desc, token asc — a total order) is
    * bit-reproducible and the oracle replays it.
    *
    * Output: `(token, count_a, count_b, rate_a_ppm, rate_b_ppm,
    * drift_ppm)`, topK rows.
    *
    * 100 TB shape: one tokenize pass per snapshot into (token, count)
    * aggregates with map-side partials (vocabulary-sized results), a
    * vocabulary-keyed full-outer join, broadcast 1-row totals, and a
    * TakeOrderedAndProject topK — per-partition heaps, no global sort.
    * Tokens absent from one side count 0 there (drift = the full rate).
    */
  def vocabDrift(
      a: DataFrame,
      b: DataFrame,
      topK: Int = 50,
      scale: Long = 1000000L): DataFrame = {
    def counts(df: DataFrame, side: String) =
      df.select(explode(TextAnalysis.wordArray(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as(s"count_$side"))
    val ca = counts(a, "a")
    val cb = counts(b, "b")
    val totals = ca.agg(sum(col("count_a")).as("total_a"))
      .crossJoin(cb.agg(sum(col("count_b")).as("total_b")))
    ca.join(cb, Seq("token"), "full_outer")
      .na.fill(0L, Seq("count_a", "count_b"))
      .crossJoin(broadcast(totals))
      // count·scale through DECIMAL(38,0): a long product would overflow
      // for counts beyond ~9.2e12 (web-scale stopwords) — silently under
      // non-ANSI Spark while DuckDB errors, breaking both the exactness
      // and the oracle contract right where the 100 TB claim lives. The
      // decimal `div` floors like the oracle's HUGEINT `//`; the RATE
      // always fits a long (≤ scale)
      .withColumn("rate_a_ppm",
        expr(s"(CAST(count_a AS DECIMAL(38,0)) * ${scale}L)" +
          " div greatest(1L, total_a)").cast("long"))
      .withColumn("rate_b_ppm",
        expr(s"(CAST(count_b AS DECIMAL(38,0)) * ${scale}L)" +
          " div greatest(1L, total_b)").cast("long"))
      .withColumn("drift_ppm", abs(col("rate_a_ppm") - col("rate_b_ppm")))
      .select(col("token"), col("count_a"), col("count_b"),
        col("rate_a_ppm"), col("rate_b_ppm"), col("drift_ppm"))
      .orderBy(col("drift_ppm").desc, col("token"))
      .limit(topK)
  }
}
