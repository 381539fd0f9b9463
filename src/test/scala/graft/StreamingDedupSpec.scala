package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming exact dedup: `dropDuplicatesWithinWatermark` on the content
  * key — the streaming twin of Dedup.exactDedup for an unbounded ingest
  * feed. The `WithinWatermark` variant matters: plain
  * `dropDuplicates("content_key")` keeps every key FOREVER when the
  * event-time column is not part of the dedup keys (the watermark does not
  * evict that state), so on a real stream the state store grows without
  * bound; `dropDuplicatesWithinWatermark` guarantees dedup among events
  * within the watermark delay AND evicts expired keys.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  final case class Doc(doc_id: Long, text: String, ts: Timestamp)

  test("streaming dropDuplicatesWithinWatermark on normalized content key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val deduped = in.toDF()
      .withColumn("content_key", md5(Dedup.normText(col("text"))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_key")
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
