package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.streaming.StreamKmeans

/** Online drift monitor: streaming cell assignment must equal the batch
  * assignment row for row (same centroid literals, same integer argmin),
  * and the windowed occupancy must accumulate across micro-batches while
  * keeping windows separate.
  */
class StreamKmeansSpec extends SparkSpec {
  import spark.implicits._

  final case class Emb(ts: Timestamp, vec_id: Long, embedding: Array[Float])

  private val h0 = 1700000000000L
  private val h1 = h0 + 3600000L

  lazy val corpus = Tables.embeddings(spark, sf)
  lazy val centroids = Clustering.lloyd(
    Clustering.quantized(corpus), k = 4, iters = 2)

  private def emb(base: Long, i: Int, v: Array[Float]) =
    Emb(new Timestamp(base + i * 1000L), i.toLong, v)

  test("streaming assignment ≡ batch assignment on the same rows") {
    val batchAssigned = StreamKmeans.assign(corpus, centroids)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    // the operator's own batch path must agree with Clustering's
    val viaClustering = Clustering.kmeansAssign(corpus, k = 4, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(batchAssigned === viaClustering)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Emb]
    val q = StreamKmeans.assign(in.toDF(), centroids)
      .select("vec_id", "cluster")
      .writeStream.outputMode("append")
      .format("memory").queryName("km_assign").start()
    val rows = corpus.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    // two micro-batches: assignment must not depend on batch boundaries
    val (b1, b2) = rows.splitAt(rows.length / 2)
    in.addData(b1.zipWithIndex.map { case ((id, v), i) =>
      Emb(new Timestamp(h0 + i), id, v) }.toIndexedSeq: _*)
    q.processAllAvailable()
    in.addData(b2.zipWithIndex.map { case ((id, v), i) =>
      Emb(new Timestamp(h0 + 100000 + i), id, v) }.toIndexedSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("km_assign")
      .as[(Long, Int)].collect().toMap
    q.stop()
    assert(streamed === batchAssigned)
  }

  test("windowed cell counts accumulate within a window, split across") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Emb]
    val q = StreamKmeans
      .windowedCellCounts(in.toDF(), centroids, bucket = "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("km_drift").start()

    val vs = corpus.select("embedding").as[Array[Float]].head(6)
    // window A: 4 vectors over two batches; window B: 2 vectors
    in.addData(emb(h0, 0, vs(0)), emb(h0, 1, vs(1)))
    q.processAllAvailable()
    in.addData(emb(h0, 100, vs(2)), emb(h0, 101, vs(3)))
    in.addData(emb(h1, 0, vs(4)), emb(h1, 1, vs(5)))
    q.processAllAvailable()

    val rows = spark.table("km_drift")
      .as[(Timestamp, Int, Long)].collect()
    q.stop()
    val starts = rows.map(_._1.getTime).distinct.sorted
    assert(starts.size === 2)
    assert(rows.filter(_._1.getTime == starts(0)).map(_._3).sum === 4L)
    assert(rows.filter(_._1.getTime == starts(1)).map(_._3).sum === 2L)
    assert(rows.forall { case (_, c, _) => c >= 0 && c < 4 })
  }
}
