package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Codecs
import graft.model.Envelope

/** The reference's three example Lua transforms
  * (`/root/reference/examples/{transform,routing_transform,multi_table}.lua`)
  * re-expressed as declarative DataFrame transforms (operator A5/A6).
  *
  * The whole example corpus — unit conversion, field picking, regex extract,
  * `or`-defaulting, JSON re-emit — is expressible as column expressions, so
  * none of these need a UDF: Catalyst sees through every one (pushdown,
  * pruning, codegen), which is the point of the re-design (SURVEY.md §2 A5).
  *
  * Each transform consumes the message envelope (topic, payload, qos,
  * retain, time) and produces sink-shaped rows.
  */
object Transforms {

  /** examples/transform.lua (legacy 1→1 contract, A6): copy topic, stamp a
    * unix-seconds timestamp, C→F conversion (0→32 vector, lua_test.go:128),
    * rot13/base64 helper demos, `processed_by` metadata.
    */
  def unitConversion(messages: DataFrame): DataFrame = {
    val payloadSchema = StructType(Seq(
      StructField("temperature", DoubleType),
      StructField("text", StringType)))
    val parsed = from_json(col("payload").cast("string"), payloadSchema)
    messages
      .withColumn("j", parsed)
      .select(
        col("topic"),
        unix_timestamp(col("time")).as("timestamp"),
        col("j.temperature").as("temperature_celsius"),
        (col("j.temperature") * 9 / 5 + 32).as("temperature_fahrenheit"),
        col("j.text").as("original_text"),
        Codecs.rot13(col("j.text")).as("text_rot13"),
        lit("hermod").as("processed_by"))
  }

  /** examples/routing_transform.lua: JSON-only filter (`if msg.json`), one
    * `iot_metrics` record per message: time, device=topic,
    * value = json.temperature or json.value or 0, raw = the JSON itself.
    */
  def iotMetrics(messages: DataFrame): DataFrame = {
    val raw = col("payload").cast("string")
    val payloadSchema = StructType(Seq(
      StructField("temperature", DoubleType),
      StructField("value", DoubleType)))
    messages
      .filter(Envelope.isValidJson(raw))
      .withColumn("j", from_json(raw, payloadSchema))
      .select(
        col("time"),
        col("topic").as("device"),
        coalesce(col("j.temperature"), col("j.value"), lit(0.0)).as("value"),
        raw.as("raw"))
  }

  /** examples/multi_table.lua: one message fans out to `sensor_readings`
    * and/or `sensor_events` (operator A5's 0..N contract). Returned as a
    * single tagged DataFrame (`table` discriminator column) — the columnar
    * fan-out shape; split per sink with a filter on `table`.
    */
  def multiTable(messages: DataFrame): DataFrame = {
    val raw = col("payload").cast("string")
    val payloadSchema = StructType(Seq(
      StructField("temperature", DoubleType),
      StructField("humidity", DoubleType),
      StructField("battery", DoubleType),
      StructField("alert", StringType)))
    val base = messages
      .filter(Envelope.isValidJson(raw))
      .withColumn("j", from_json(raw, payloadSchema))
      .withColumn("sensor_id",
        coalesce(nullif(regexp_extract(col("topic"), "sensors/([^/]+)", 1),
          lit("")), lit("unknown")))
    val readings = base
      .filter(col("j.temperature").isNotNull || col("j.humidity").isNotNull)
      .select(
        lit("sensor_readings").as("table"),
        col("time"),
        col("sensor_id"),
        coalesce(col("j.temperature"), lit(0.0)).as("temperature"),
        coalesce(col("j.humidity"), lit(0.0)).as("humidity"),
        coalesce(col("j.battery"), lit(100.0)).as("battery"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("string").as("details"))
    val events = base
      .filter(col("j.alert").isNotNull)
      .select(
        lit("sensor_events").as("table"),
        col("time"),
        col("sensor_id"),
        lit(null).cast("double").as("temperature"),
        lit(null).cast("double").as("humidity"),
        lit(null).cast("double").as("battery"),
        lit("alert").as("event_type"),
        raw.as("details"))
    readings.unionByName(events)
  }
}
