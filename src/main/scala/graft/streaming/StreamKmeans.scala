package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Online corpus-drift monitoring: assign an incoming embedding stream to
  * OFFLINE-trained k-means cells and aggregate windowed per-cell counts —
  * the streaming twin of [[graft.operators.Clustering]].
  *
  * The production shape: [[Clustering.lloyd]] trains on yesterday's corpus
  * (oracle-replayable, so the centroid snapshot is auditable and
  * byte-identical on any engine); the k×dim long centroids travel to the
  * stream as PLAN LITERALS — the assignment is a stateless narrow map
  * (codegen'd [[graft.functions.VectorOps.SqDistLongExpr]] argmin, zero
  * shuffle, zero per-key state), and the only stateful stage is an
  * ordinary watermarked window count with k rows of state per window.
  * A shifting cell-occupancy profile between the training snapshot and
  * the live windows is the drift signal (new content domain, upstream
  * encoder change, ingestion bug) — cheap enough to run on every
  * ingestion stream because the monitor never touches more than
  * (window, cell, count) tuples past the scan.
  *
  * Determinism contract: for the same rows, assignment is IDENTICAL in
  * batch and streaming (same literals, same integer argmin — spec'd by
  * StreamKmeansSpec), so a drift alert replays exactly under the batch
  * engine.
  */
object StreamKmeans {

  /** Stateless per-row assignment against pinned centroids: `(… , cluster)`.
    * Works identically on a batch or streaming DataFrame — there is no
    * shuffle and no state to diverge.
    */
  def assign(
      embeddings: DataFrame,
      centroids: Array[Array[Long]],
      embeddingCol: String = "embedding"): DataFrame = {
    val q = transform(
      col(embeddingCol),
      x => round((x.cast("double") + lit(Clustering.Shift)) *
        lit(Clustering.Scale)).cast("long"))
    embeddings.withColumn("cluster", nearestCluster(q, centroids))
  }

  /** argmin over centroid distances of an already-quantized vector column —
    * ties to the lowest cluster id, matching [[Clustering]] exactly.
    */
  private def nearestCluster(
      q: Column, centroids: Array[Array[Long]]): Column = {
    val cands = centroids.zipWithIndex.map { case (c, j) =>
      struct(
        graft.functions.VectorOps.vec_l2sq_long(q, typedLit(c.toSeq))
          .as("dist"),
        lit(j).as("cluster"))
    }
    array_min(array(cands.toIndexedSeq: _*)).getField("cluster")
  }

  /** Windowed per-cell occupancy: `(window_start, cluster, n)` — the drift
    * profile to compare against the training snapshot's cell sizes
    * ([[Clustering.kmeansSummary]] column `n`). Watermarked, so state is
    * windows-in-horizon × k rows regardless of stream rate.
    */
  def windowedCellCounts(
      embeddings: DataFrame, // (ts timestamp, embedding array<float>)
      centroids: Array[Array[Long]],
      watermark: String = "10 minutes",
      bucket: String = "1 hour"): DataFrame =
    assign(embeddings, centroids)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), bucket), col("cluster"))
      .count()
      .select(
        col("window.start").as("window_start"),
        col("cluster"),
        col("count").as("n"))
}
