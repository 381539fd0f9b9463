package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{DatabaseConfig, EngineConfig}
import graft.operators.Router

/** Ports the reference config tests (config_test.go) against the TOML
  * subset the reference's examples use.
  */
class ConfigSpec extends AnyFunSuite {

  val routingToml: String =
    """# Hermod-style routing config (examples/config_routing.toml shape)
      |[mqtt]
      |broker = "tcp://localhost:1883"
      |client_id = "hermod"
      |qos = 1
      |
      |[database]
      |host = "localhost"
      |port = 5432
      |user = "hermod"
      |password = "secret"
      |database = "iot"
      |sslmode = "disable"
      |pool_size = 10
      |
      |[[routes]]
      |filter = "ruuvi/+"
      |script = "transform.lua"
      |workers = 2
      |queue_size = 100
      |table = "ruuvi_data"
      |
      |[[routes]]
      |filter = "p1ib/#"
      |workers = 1
      |queue_size = 50
      |table = "p1ib_raw"
      |""".stripMargin

  test("TOML parse: sections, arrays of tables, types") {
    val cfg = EngineConfig.fromToml(routingToml)
    assert(cfg.mqtt.broker === "tcp://localhost:1883")
    assert(cfg.mqtt.qos === 1)
    assert(cfg.database.port === 5432)
    assert(cfg.routes.length === 2)
    assert(cfg.routes(0).filter === "ruuvi/+")
    assert(cfg.routes(0).workers === 2)
    assert(cfg.routes(1).script === "")
    assert(cfg.routes(1).table === "p1ib_raw")
  }

  test("connection string exact format (config_test.go:112-163)") {
    val db = DatabaseConfig("localhost", 5432, "hermod", "secret",
      "iot", "disable", 10)
    assert(db.connectionString ===
      "host=localhost port=5432 user=hermod password=secret dbname=iot sslmode=disable pool_max_conns=10")
  }

  test("legacy pipeline wraps as a single route (main.go:180-195)") {
    val legacy = EngineConfig.fromToml(
      """[mqtt]
        |topics = ["sensors/data"]
        |[pipeline]
        |lua_script = "transform.lua"
        |table_name = "sensor_data"
        |""".stripMargin)
    val rcs = legacy.buildRouteConfigs
    assert(rcs.length === 1)
    assert(rcs.head.filter === "sensors/data")
    assert(rcs.head.table === "sensor_data")
    assert(rcs.head.workers === 1 && rcs.head.queueSize === 100)
  }

  test("legacy with multiple topics falls back to # filter") {
    val legacy = EngineConfig.fromToml(
      """[mqtt]
        |topics = ["a/b", "c/d"]
        |[pipeline]
        |lua_script = "t.lua"
        |table_name = "t"
        |""".stripMargin)
    assert(legacy.buildRouteConfigs.head.filter === "#")
  }

  test("no routes and no pipeline means empty route list") {
    assert(EngineConfig.fromToml("[mqtt]\nbroker = \"x\"\n")
      .buildRouteConfigs.isEmpty)
  }

  test("buildRouter resolves scripts via the transform registry") {
    val cfg = EngineConfig.fromToml(routingToml)
    val router = cfg.buildRouter(Map(
      "transform.lua" -> graft.operators.Transforms.unitConversion _))
    assert(router.routes.length === 2)
    assert(router.routes(0).transform.isDefined)
    assert(router.routes(1).transform.isEmpty) // passthrough
    assert(router.routes(1).table === "p1ib_raw")
    intercept[IllegalArgumentException] {
      cfg.buildRouter(Map.empty)
    }
  }

  test("comments after section headers and quoted commas parse correctly") {
    val cfg = EngineConfig.fromToml(
      """[mqtt] # broker settings
        |broker = "tcp://h:1883"  # inline comment
        |topics = ["a,b/c", "d/#"]
        |""".stripMargin)
    assert(cfg.mqtt.broker === "tcp://h:1883")
    assert(cfg.mqtt.topics === Seq("a,b/c", "d/#"))
  }

  test("[validation] strict_types parses; default stays presence-only") {
    val cfg = EngineConfig.fromToml(
      """[validation]
        |strict_types = true
        |""".stripMargin)
    assert(cfg.validation.strictTypes)
    assert(!EngineConfig.fromToml("[mqtt]\nqos = 1\n").validation.strictTypes,
      "default stays reference-parity presence-only")
  }

  test("malformed TOML line rejected (config_test.go bad-syntax case)") {
    intercept[IllegalArgumentException] {
      EngineConfig.fromToml("not a toml line\n")
    }
  }

  test("escaped quotes and # inside strings survive parsing") {
    // a password with an escaped quote, a backslash, and a # — the
    // classic victims of naive quote-state toggling
    val cfg = EngineConfig.fromToml(
      """[database]
        |host = "h"
        |password = "p\"w#x\\y"  # comment after the tricky value
        |""".stripMargin)
    assert(cfg.database.password === "p\"w#x\\y")
    val parsed = EngineConfig.fromToml(
      """[mqtt]
        |topics = ["a\"b", "c#d"]
        |""".stripMargin)
    assert(parsed.mqtt.topics === Seq("a\"b", "c#d"))
  }
}
