package graft

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._

import graft.model.Envelope
import graft.operators.{Route, Router}
import graft.streaming.StreamRoutes

/** A1's streaming form against a REAL file source: the events table copied
  * into a directory consumed by readStream (the stand-in for the MQTT feed
  * in a file-landing architecture), routed through the same Router as
  * batch, fanned out per table via foreachBatch.
  */
class StreamFileSourceSpec extends SparkSpec {

  test("file-source stream routes identically to the batch pipeline") {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    // land the events as microsecond timestamps (the adapter's canonical
    // form — streaming schema must be explicit anyway)
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(dir)
    val messages = Envelope.messagesFromEvents(stream)

    val router = new Router(Seq(
      Route("purchases", "events/purchase/#", table = "purchase_raw"),
      Route("clicks", "events/click/#", table = "click_raw")))
    val counts = TrieMap.empty[String, Long]
    val writer = StreamRoutes.routedWriter(messages, router) { (table, df) =>
      counts.updateWith(table)(c => Some(c.getOrElse(0L) + df.count()))
    }
    val q = StreamRoutes.runOnce(writer)
    q.stop()

    val batchCounts = router
      .tag(Envelope.messagesFromEvents(batchEvents))
      .groupBy("target_table").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.toMap === batchCounts)
    assert(counts.values.sum === batchEvents.count())
  }
}
