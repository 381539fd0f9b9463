package graft

import java.nio.file.{Files, Path}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Sessionize
import graft.operators.Sessionize.{Event, Session}

/** Checkpoint recovery for stateful streaming: kill `streamingSessions`
  * mid-stream and resume from the checkpoint — open-session state must
  * survive the restart (sessions opened before the kill still emit, exactly
  * once, when the watermark later closes them). This is the production
  * property a long-lived ingestion pipeline rests on: a driver restart
  * loses no sessions and duplicates none.
  *
  * The source is a file stream (replayable — offsets in the checkpoint name
  * files+positions; the socket source deliberately can't do this), the sink
  * is foreachBatch keyed by batchId, the standard idempotent-sink idiom: a
  * replayed epoch overwrites itself instead of double-counting.
  */
class StreamingRecoverySpec extends SparkSpec {

  private val t0 = 1767225600000L // 2026-01-01 00:00:00 UTC, ms

  private def writeLines(dir: Path, name: String, rows: Seq[String]): Unit = {
    val tmp = dir.resolve(s".$name.tmp")
    Files.write(tmp, String.join("\n", rows: _*).getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(name)) // atomic visibility to the source
  }

  private def eventStream(dir: Path): Dataset[Event] = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("ts_ms", LongType),
      StructField("event_type", StringType)))
    spark.readStream.schema(schema).json(dir.toString)
      .select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"),
        col("event_type"))
      .as[Event]
  }

  private def row(user: Long, tsMs: Long): String =
    s"""{"user_id":$user,"ts_ms":$tsMs,"event_type":"click"}"""

  test("sessions survive a kill + checkpoint restart, exactly once") {
    val input = Files.createTempDirectory("recovery-in")
    val checkpoint = Files.createTempDirectory("recovery-ckpt")
    // idempotent sink: batchId -> emitted sessions; a replayed batch after
    // recovery overwrites its own slot rather than appending duplicates
    val emitted = TrieMap.empty[Long, Seq[Session]]

    def run(): Unit = {
      import spark.implicits._
      val q = Sessionize.streamingSessions(eventStream(input), gapMinutes = 30)
        .writeStream
        .option("checkpointLocation", checkpoint.toString)
        .outputMode("append")
        .foreachBatch { (batch: Dataset[Session], batchId: Long) =>
          emitted.put(batchId, batch.collect().toSeq)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // epoch 1: two users open sessions; watermark stays behind their
    // timeouts so nothing emits — ALL session state lives in the store
    writeLines(input, "batch1.json", Seq(
      row(1, t0), row(1, t0 + 10 * 60 * 1000), // user 1: 2-event session
      row(2, t0)))                             // user 2: 1-event session
    run() // ...then the "driver dies": the query is stopped
    val afterFirst = emitted.values.flatten.toSeq
    assert(afterFirst.isEmpty,
      s"watermark never passed a timeout, nothing should emit: $afterFirst")

    // epoch 2, NEW query instance from the same checkpoint: a far-future
    // event pushes the watermark past both stored timeouts
    writeLines(input, "batch2.json", Seq(row(3, t0 + 3 * 3600 * 1000)))
    run()
    // one more watermark push so any straggling timeout fires too
    writeLines(input, "batch3.json", Seq(row(3, t0 + 6 * 3600 * 1000)))
    run()

    val sessions = emitted.values.flatten.toSeq
      .filter(s => s.user_id == 1L || s.user_id == 2L)
    assert(sessions.toSet === Set(
      Session(1L, new java.sql.Timestamp(t0),
        new java.sql.Timestamp(t0 + 10 * 60 * 1000), 2),
      Session(2L, new java.sql.Timestamp(t0), new java.sql.Timestamp(t0), 1)),
      s"pre-kill sessions must emit after recovery: $sessions")
    assert(sessions.size === 2,
      s"recovered sessions must emit exactly once: $sessions")
  }
}
