package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.EngineConfig

/** `-sql` mode golden tests (reference expectations from
  * cmd/hermod/main.go:202-237 and schema_test.go's sorted-DDL goldens).
  * No SparkSession needed — schema generation is pure.
  */
class GenerateSqlSpec extends AnyFunSuite {

  test("multi-script config merges to the golden sorted DDL") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "sensors/#"
        |script = "examples/multi_table.lua"
        |
        |[[routes]]
        |filter = "events/#"
        |script = "examples/routing_transform.lua"
        |table = "iot_metrics"
        |""".stripMargin)
    val golden =
      """CREATE TABLE IF NOT EXISTS iot_metrics (
        |  device text,
        |  raw jsonb,
        |  time timestamptz,
        |  value double precision
        |);
        |
        |CREATE TABLE IF NOT EXISTS sensor_events (
        |  details jsonb,
        |  event_type text,
        |  sensor_id text,
        |  time timestamptz
        |);
        |
        |CREATE TABLE IF NOT EXISTS sensor_readings (
        |  battery double precision,
        |  humidity double precision,
        |  sensor_id text,
        |  temperature double precision,
        |  time timestamptz
        |);""".stripMargin
    assert(GenerateSql.generate(cfg) === golden)
  }

  test("legacy [pipeline] lua_script contributes its schema") {
    val cfg = EngineConfig.fromToml(
      """[pipeline]
        |lua_script = "examples/routing_transform.lua"
        |table_name = "iot_metrics"
        |""".stripMargin)
    val out = GenerateSql.generate(cfg)
    assert(out.startsWith("CREATE TABLE IF NOT EXISTS iot_metrics ("))
    assert(out.contains("value double precision"))
  }

  test("no scripts -> the reference's no-schema banner") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "#"
        |select = ["topic"]
        |table = "topics"
        |""".stripMargin)
    assert(GenerateSql.generate(cfg) === "-- No schemas defined in Lua scripts")
    // a script with no schema block behaves the same (transform.lua)
    val legacy = EngineConfig.fromToml(
      """[pipeline]
        |lua_script = "examples/transform.lua"
        |""".stripMargin)
    assert(GenerateSql.generate(legacy) ===
      "-- No schemas defined in Lua scripts")
  }

  test("unknown script fails loudly, naming the script") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "#"
        |script = "mystery.lua"
        |""".stripMargin)
    val e = intercept[IllegalArgumentException] { GenerateSql.generate(cfg) }
    assert(e.getMessage.contains("mystery.lua"))
  }

  test("main prints the DDL for a config file") {
    val dir = java.nio.file.Files.createTempDirectory("gensql")
    val p = dir.resolve("config.toml")
    java.nio.file.Files.write(p,
      """[[routes]]
        |filter = "sensors/#"
        |script = "multi_table.lua"
        |""".stripMargin.getBytes("UTF-8"))
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(buf) { GenerateSql.main(Array(p.toString)) }
    val out = buf.toString("UTF-8")
    assert(out.contains("CREATE TABLE IF NOT EXISTS sensor_events ("))
    assert(out.contains("CREATE TABLE IF NOT EXISTS sensor_readings ("))
  }
}
