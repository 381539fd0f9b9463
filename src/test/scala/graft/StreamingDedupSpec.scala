package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming exact dedup: `dropDuplicates` on the content key with a
  * watermark bounding the dedup state — the streaming twin of
  * Dedup.exactDedup, and the shape used to dedup an unbounded ingest feed
  * (state holds only keys newer than the watermark).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  final case class Doc(doc_id: Long, text: String, ts: Timestamp)

  test("streaming dropDuplicates on normalized content key with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val deduped = in.toDF()
      .withColumn("content_key", md5(Dedup.normText(col("text"))))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("content_key")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    def doc(id: Long, text: String, minute: Int) =
      Doc(id, text, new Timestamp(1700000000000L + minute * 60000L))
    in.addData(
      doc(1, "the quick brown fox", 0),
      doc(2, "The  quick brown FOX", 1), // dup of 1 after normalization
      doc(3, "something else", 2))
    q.processAllAvailable()
    in.addData(
      doc(4, "the quick brown fox", 3), // still within state -> dropped
      doc(5, "a third thing", 4))
    q.processAllAvailable()
    val kept = spark.table("dedup_stream").select("doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(kept === Set(1L, 3L, 5L))
  }
}
