package graft

import java.io.PrintWriter
import java.net.ServerSocket

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._

import graft.model.Envelope
import graft.operators.{Route, Router}
import graft.streaming.StreamRoutes

/** A1 against a LIVE socket: a real TCP server (the broker stand-in) feeds
  * `topic payload` lines over the wire; `messagesFromSocket` adapts them to
  * the envelope and the same Router fans them out per table — the full path
  * a migrating Hermod user needs, with only the `format(...)` differing
  * from a production MQTT/Kafka connector
  * (`/root/reference/internal/mqtt/mqtt.go:73-106`).
  */
class StreamSocketSourceSpec extends SparkSpec {

  /** Single-client line server: accepts one connection, writes all lines,
    * then holds the socket open until closed (Spark's socket source treats
    * a remote close as end-of-stream mid-test otherwise).
    */
  private final class LineServer(lines: Seq[String]) extends AutoCloseable {
    private val server = new ServerSocket(0) // ephemeral port
    val port: Int = server.getLocalPort
    @volatile private var client: java.net.Socket = _
    private val thread = new Thread(() => {
      try {
        client = server.accept()
        val out = new PrintWriter(client.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
      } catch { case _: Throwable => () }
    })
    thread.setDaemon(true)
    thread.start()
    override def close(): Unit = {
      try if (client != null) client.close() catch { case _: Throwable => () }
      try server.close() catch { case _: Throwable => () }
    }
  }

  test("socket stream routes lines through the fan-out end-to-end") {
    val lines = Seq(
      "sensors/temp/1 {\"celsius\":21.5}",
      "sensors/temp/2 {\"celsius\":19.0}",
      "sensors/humidity/1 {\"rh\":40}",
      "alerts/fire payload-not-json",
      "heartbeat", // no space: all topic, empty payload
      "sensors/temp/1 {\"celsius\":22.0}")

    val server = new LineServer(lines)
    try {
      val messages = Envelope.messagesFromSocket(spark, "localhost", server.port)
      val router = new Router(Seq(
        Route("temps", "sensors/temp/#", table = "temp_raw"),
        Route("humidity", "sensors/humidity/#", table = "humidity_raw"),
        Route("alerts", "alerts/#", table = "alert_raw")))

      val byTable = TrieMap.empty[String, Vector[(String, String)]]
      val writer = StreamRoutes.routedWriter(messages, router) { (table, df) =>
        // passthrough projection: the envelope payload lands as `raw`
        val rows = df
          .select(col("topic"), col("raw"))
          .collect()
          .toVector
          .map(r => (r.getString(0), r.getString(1)))
        if (rows.nonEmpty)
          byTable.updateWith(table)(v => Some(v.getOrElse(Vector.empty) ++ rows))
      }
      val q = writer.start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        while (byTable.values.map(_.size).sum < lines.size &&
            System.currentTimeMillis() < deadline) {
          Thread.sleep(100)
        }
      } finally q.stop()

      assert(byTable.values.map(_.size).sum === lines.size,
        s"expected ${lines.size} rows, got $byTable")
      assert(byTable("temp_raw").map(_._1).sorted ===
        Vector("sensors/temp/1", "sensors/temp/1", "sensors/temp/2"))
      assert(byTable("temp_raw").map(_._2).sorted ===
        Vector("{\"celsius\":19.0}", "{\"celsius\":21.5}", "{\"celsius\":22.0}"))
      assert(byTable("humidity_raw") === Vector(("sensors/humidity/1", "{\"rh\":40}")))
      assert(byTable("alert_raw") === Vector(("alerts/fire", "payload-not-json")))
      // the spaceless line matched no route -> raw capture, empty payload
      assert(byTable(Router.RawTable) === Vector(("heartbeat", "")))
    } finally server.close()
  }
}
