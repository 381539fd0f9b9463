package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamDecontam

/** Streaming decontamination: bloom-prefiltered stream-static anti-join
  * against the benchmark key set must equal the plain exact anti-join
  * (no-false-negative theorem), across micro-batches.
  */
class StreamDecontamSpec extends SparkSpec {
  import spark.implicits._

  final case class Doc(doc_id: Long, text: String, ts: Timestamp)

  test("stream decontamination admits exactly the non-benchmark docs") {
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq(
      (100L, "the forbidden benchmark passage"),
      (101L, "another held out eval document")
    ).toDF("doc_id", "text")

    val in = MemoryStream[Doc]
    // tiny filter + high fpp so false positives traverse the confirm join
    val cleaned = StreamDecontam.cleanStream(in.toDF(), reference,
      expectedItems = 10L, fpp = 0.5)
    val q = cleaned.writeStream.outputMode("append")
      .format("memory").queryName("decontam_stream").start()

    def doc(id: Long, text: String, minute: Int) =
      Doc(id, text, new Timestamp(1700000000000L + minute * 60000L))
    in.addData(
      doc(1, "a perfectly clean crawl document", 0),
      doc(2, "The  FORBIDDEN benchmark passage", 1), // normalizes to ref 100
      doc(3, "something else entirely", 2))
    q.processAllAvailable()
    in.addData(
      doc(4, "another held out eval document", 3),   // exact ref 101
      doc(5, "late but clean arrival", 4))
    q.processAllAvailable()
    val admitted = spark.table("decontam_stream").select("doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(admitted === Set(1L, 3L, 5L))

    // equivalence vs the plain batch anti-join on the same rows
    val batch = Seq(
      (1L, "a perfectly clean crawl document"),
      (2L, "The  FORBIDDEN benchmark passage"),
      (3L, "something else entirely"),
      (4L, "another held out eval document"),
      (5L, "late but clean arrival")).toDF("doc_id", "text")
    val exact = batch
      .withColumn("content_key", md5(Dedup.normText(col("text"))))
      .join(reference.select(md5(Dedup.normText(col("text")))
        .as("content_key")).distinct(), Seq("content_key"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === exact)
  }
}
