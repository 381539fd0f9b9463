package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** Streaming SimHash near-dup suppression: admit a doc only when no
  * already-seen doc within the watermark horizon is Hamming-close. The
  * crafted corpus's pairwise Hamming distances are PREMISE-CHECKED with
  * the batch simhash (not assumed), so the assertions pin the streaming
  * operator's behavior, not text luck.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  final case class Doc(doc_id: Long, text: String, ts: Timestamp)

  private val tA = "the quick brown fox jumps over the lazy dog every single morning"
  private val tC = "completely unrelated content about distributed query engines and shuffles"
  private val tE = "yet another disjoint document concerning streaming watermarks and state stores"

  private def doc(id: Long, text: String, minute: Int) =
    Doc(id, text, new Timestamp(1700000000000L + minute * 60000L))

  private def hamming(x: String, y: String): Int = {
    val sigs = Seq(x, y).toDF("text")
      .select(Dedup.simhash(col("text"))).as[Long].collect()
    java.lang.Long.bitCount(sigs(0) ^ sigs(1))
  }

  test("suppresses near-dups across micro-batches, admits distinct docs") {
    // premise: the distinct texts really are far apart in simhash space
    assert(hamming(tA, tC) > 3, "premise: A and C must not be near-dups")
    assert(hamming(tA, tE) > 3, "premise: A and E must not be near-dups")
    assert(hamming(tC, tE) > 3, "premise: C and E must not be near-dups")

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val admitted = mutable.Set[Long]()
    val q = StreamingNearDup.suppressedWriter(in.toDF()) { df =>
      admitted ++= df.select("doc_id").as[Long].collect()
      ()
    }.start()
    in.addData(
      doc(1, tA, 0),
      doc(2, tA, 1), // identical to 1 (hamming 0) -> suppressed in-batch
      doc(3, tC, 2))
    q.processAllAvailable()
    in.addData(
      doc(4, tA, 3), // near-dup of 1, state held across batches -> suppressed
      doc(5, tE, 4))
    q.processAllAvailable()
    q.stop()
    assert(admitted.toSet === Set(1L, 3L, 5L))
  }

  test("band flags: an identical doc hits in all four bands") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingNearDup.bandFlags(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("band_flags").start()
    in.addData(doc(1, tA, 0), doc(2, tA, 1))
    q.processAllAvailable()
    val hits = spark.table("band_flags")
      .groupBy("doc_id").agg(sum(when(col("hit"), 1).otherwise(0)).as("n"))
      .as[(Long, Long)].collect().toMap
    q.stop()
    assert(hits(1L) === 0L, "first arrival must not be suppressed")
    assert(hits(2L) === 4L, "hamming-0 dup must hit in every band")
  }

  test("state evicts at the watermark: an old near-dup is forgotten") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val admitted = mutable.Set[Long]()
    val q = StreamingNearDup
      .suppressedWriter(in.toDF(), delayMinutes = 10) { df =>
        admitted ++= df.select("doc_id").as[Long].collect()
        ()
      }.start()
    in.addData(doc(1, tA, 0))
    q.processAllAvailable()
    // advance the watermark far past doc 1's bucket timeout (minute 10)
    in.addData(doc(2, tC, 100))
    q.processAllAvailable()
    // trigger an empty-ish batch so the timeout fires and state evicts,
    // then replay A: with doc 1's claim evicted it must be ADMITTED
    in.addData(doc(3, tE, 101))
    q.processAllAvailable()
    in.addData(doc(4, tA, 102))
    q.processAllAvailable()
    q.stop()
    assert(admitted.contains(4L),
      "bucket state older than the watermark delay must be evicted")
    assert(admitted.toSet === Set(1L, 2L, 3L, 4L))
  }
}
