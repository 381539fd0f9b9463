package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's stream element and canonical raw-capture format.
  *
  * Mirrors the reference's `Message` (`/root/reference/internal/router/
  * router.go:24-30`) and the 6-column passthrough record
  * (`router.go:402-418`, documented README.md:313-321).
  */
final case class Message(
    topic: String,
    payload: Array[Byte],
    qos: Int,
    retain: Boolean,
    time: Timestamp)

object Envelope {

  /** struct<topic,payload,qos,retain,time> — the unit every route consumes. */
  val messageSchema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("qos", IntegerType, nullable = false),
    StructField("retain", BooleanType, nullable = false),
    StructField("time", TimestampType, nullable = false)))

  /** Canonical passthrough: time, topic, qos, retain, raw, json
    * (router.go:402-418). `json` is populated only when the payload parses
    * as JSON — the columnar analog of Go's "add json field only if
    * json.Unmarshal succeeds".
    */
  val passthroughSchema: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("topic", StringType),
    StructField("qos", IntegerType),
    StructField("retain", BooleanType),
    StructField("raw", StringType),
    StructField("json", StringType)))

  /** JSON-validity probe with DuckDB `json_valid` parity (accepts objects,
    * arrays, and scalars — matching Go's `json.Unmarshal` into interface{}).
    */
  def isValidJson(c: Column): Column = try_parse_json(c).isNotNull

  /** The canonical passthrough projection (operator A7). A fixed, fully
    * codegen'd `select` — no shuffle, no UDF.
    */
  def passthrough(messages: DataFrame): DataFrame = {
    val raw = col("payload").cast("string")
    messages.select(
      col("time"),
      col("topic"),
      col("qos"),
      col("retain"),
      raw.as("raw"),
      when(isValidJson(raw), raw).as("json"))
  }

  /** Adapt the driver's `events` table to the message envelope. The events
    * stream stands in for the MQTT feed (TESTDATA.md): the routing key is a
    * synthesized `events/<event_type>/<user_id>` topic, the JSON `props`
    * column is the payload, and `ts` is the (event-time) timestamp — the
    * reference only ever has arrival time (cmd/hermod/main.go:125); using
    * event time is the documented, strictly-better delta (SURVEY.md §7).
    */
  def messagesFromEvents(events: DataFrame): DataFrame =
    events.select(
      concat(lit("events/"), col("event_type"), lit("/"),
        col("user_id").cast("string")).as("topic"),
      col("props").cast("binary").as("payload"),
      (col("event_id") % 3).cast("int").as("qos"),
      lit(false).as("retain"),
      col("ts").as("time"),
      // carried alongside the envelope for analytics parity with the source
      col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** A1 live connector: adapt a SOCKET-shaped unbounded source — an actual
    * TCP stream an external process feeds line by line — to the envelope.
    * This is the closest sandbox analog of the reference's broker
    * subscription (`/root/reference/internal/mqtt/mqtt.go:73-106`: delivery
    * callback hands (topic, payload) to the router); here the wire framing
    * is one message per line, `topic<space>payload`, with arrival time
    * stamped by the source (the reference's processing-time semantics,
    * cmd/hermod/main.go:125). A production MQTT/Kafka connector swaps ONLY
    * the `format(...)` + the first projection; routing, transforms,
    * fan-out, and watermarked aggregates downstream are source-agnostic.
    *
    * A line without a space is all topic, empty payload — mirroring a
    * broker message with an empty body.
    */
  def messagesFromSocket(
      spark: org.apache.spark.sql.SparkSession,
      host: String,
      port: Int): DataFrame = {
    val stream = spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .option("includeTimestamp", "true")
      .load() // (value string, timestamp) — one line per message
    val topic = substring_index(col("value"), " ", 1)
    // everything after the first space; start index beyond the string
    // length yields "" (the empty-payload contract above)
    val payload = col("value").substr(
      length(substring_index(col("value"), " ", 1)) + 2, length(col("value")))
    stream.select(
      topic.as("topic"),
      payload.cast("binary").as("payload"),
      lit(0).as("qos"),
      lit(false).as("retain"),
      col("timestamp").as("time"))
  }

  /** A1 beyond files: adapt an UNBOUNDED non-file source — Spark's
    * rate-micro-batch generator, the stand-in for a live broker in this
    * sandbox — to the same envelope. The adapter is the whole point: a
    * Kafka/MQTT connector differs only in the `format(...)` + column
    * mapping on the first two lines; everything downstream (routing,
    * transforms, fan-out, watermarked aggregates) is source-agnostic.
    * Message content derives deterministically from the sequence number so
    * specs can predict routing exactly.
    */
  def messagesFromRate(
      spark: org.apache.spark.sql.SparkSession,
      rowsPerBatch: Int = 100): DataFrame = {
    val stream = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .load() // (timestamp, value) — value is a monotonic sequence number
    val eventType = element_at(
      typedLit(Seq("purchase", "click", "view")),
      (col("value") % 3).cast("int") + 1)
    stream.select(
      concat(lit("events/"), eventType, lit("/"),
        (col("value") % 7).cast("string")).as("topic"),
      to_json(struct(col("value").as("k"))).cast("binary").as("payload"),
      (col("value") % 3).cast("int").as("qos"),
      lit(false).as("retain"),
      col("timestamp").as("time"))
  }
}
