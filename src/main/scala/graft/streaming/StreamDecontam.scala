package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming benchmark decontamination — the ingest-time twin of
  * [[Dedup.crossCorpusNewBloom]]: admit a stream document only if its
  * normalized content key does NOT exist in the static reference set
  * (the eval-benchmark corpus, or the already-ingested archive). The
  * pass a live training-data feed runs so benchmark material never
  * lands in the mix in the first place, instead of being scrubbed later
  * by the batch `pipeline_decontaminate` sweep.
  *
  * Scale shape, per micro-batch: the reference key set folds ONCE (at
  * plan build, before the query starts) into a Bloom sketch via the
  * mergeable `stat.bloomFilter` tree-aggregate and is broadcast;
  * bloom-clear rows — the overwhelming majority of a healthy feed — are
  * admitted by a NARROW filter and never join. Only bloom-positives
  * (true benchmark hits + the `fpp` sliver) enter the stream-static
  * left-anti join for exact confirmation, and that join's static side
  * is the reduced 16-byte key set, never reference text. No false
  * negatives is a Bloom theorem, so admit-set ≡ the plain stream-static
  * anti-join exactly (spec-asserted); `fpp` only prices broadcast bytes
  * against suspect-join size.
  */
object StreamDecontam {

  /** THE normalized content key every decontam stage matches on — shared
    * with [[StreamBuildReport.censusFlags]]'s flag variant so the admit
    * rule cannot drift between the filtering and flagging forms.
    */
  def contentKey: org.apache.spark.sql.Column =
    md5(Dedup.normText(col("text")))

  /** `stream` must carry (doc_id, text, …); `reference` is a static
    * DataFrame with a `text` column. Returns the admitted stream rows
    * (original columns + `content_key`).
    */
  def cleanStream(
      stream: DataFrame,
      reference: DataFrame,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    val key = contentKey
    val refKeys = reference.select(key.as("content_key")).distinct()
    val bloom = refKeys.stat.bloomFilter("content_key", expectedItems, fpp)
    val bc = stream.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: String) => bc.value.mightContainString(k))
    val keyed = stream.withColumn("content_key", key)
    val clear = keyed.filter(!might(col("content_key")))
    val confirmedClean = keyed.filter(might(col("content_key")))
      .join(refKeys, Seq("content_key"), "left_anti")
    clear.unionByName(confirmedClean)
  }
}
