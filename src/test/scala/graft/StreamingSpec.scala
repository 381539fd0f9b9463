package graft

import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Message
import graft.operators.{Route, Router}
import graft.streaming.StreamRoutes

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def msg(topic: String, payload: String, minute: Int): Message =
    Message(topic, payload.getBytes("UTF-8"), 0, retain = false,
      new Timestamp(1700000000000L + minute * 60000L))

  test("continuous aggregate: windowed stats maintained incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Message]
    val withValue = in.toDF()
      .withColumn("value",
        get_json_object(col("payload").cast("string"), "$.v").cast("double"))
    val agg = StreamRoutes.continuousAggregate(withValue, bucket = "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("cagg").start()
    in.addData(
      msg("s/1", """{"v": 10}""", 0),
      msg("s/1", """{"v": 20}""", 30),
      msg("s/1", """{"v": 30}""", 90), // second hour bucket
      msg("s/2", """{"v": 5}""", 10))
    q.processAllAvailable()
    val rows = spark.table("cagg")
      .select(col("topic"), col("avg_value"), col("n")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set(("s/1", 15.0, 2L), ("s/1", 30.0, 1L), ("s/2", 5.0, 1L)))
  }

  test("streaming route fan-out: per-table slices delivered per epoch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Message]
    val router = new Router(Seq(
      Route("sensors", "sensors/#", table = "sensor_raw"),
      Route("devices", "devices/#", table = "device_raw")))
    val counts = TrieMap.empty[String, Long]
    val writer = StreamRoutes.routedWriter(in.toDF(), router) { (table, df) =>
      counts.updateWith(table)(c => Some(c.getOrElse(0L) + df.count()))
    }
    in.addData(
      msg("sensors/a", "{}", 0),
      msg("sensors/b", "{}", 1),
      msg("devices/x", "{}", 2),
      msg("other/y", "{}", 3))
    val q = StreamRoutes.runOnce(writer)
    q.stop()
    assert(counts.toMap === Map(
      "sensor_raw" -> 2L, "device_raw" -> 1L, Router.RawTable -> 1L))
  }
  test("stream-static enrichment: broadcast dim join, stateless, left-extends") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Message]
    val dim = Seq(("sensors/a", "room1"), ("sensors/b", "room2"))
      .toDF("topic", "location")
    val enriched = StreamRoutes.enrichStream(in.toDF(), dim, "topic")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    in.addData(msg("sensors/a", "{}", 0), msg("sensors/c", "{}", 1))
    q.processAllAvailable()
    val got = spark.table("enriched")
      .select("topic", "location").as[(String, Option[String])]
      .collect().toMap
    q.stop()
    assert(got === Map("sensors/a" -> Some("room1"), "sensors/c" -> None))
    assert(enriched.isStreaming)
  }
}
