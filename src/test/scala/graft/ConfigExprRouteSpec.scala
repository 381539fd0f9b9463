package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.model.Message
import graft.operators.Transforms

/** Config-DEPLOYABLE transforms: a route whose transform is Spark SQL
  * expression strings in TOML (`select` + `where`), compiled via `expr()`
  * at plan build — no registry entry, no recompile. This is the Spark
  * analog of the reference's drop-a-Lua-file deployment
  * (`/root/reference/README.md:184-221`): editing config alone changes
  * what a route computes.
  */
class ConfigExprRouteSpec extends SparkSpec {

  private def msgs = {
    import spark.implicits._
    Seq(
      Message("sensors/a", """{"temperature":21.5}""".getBytes("UTF-8"),
        0, retain = false, Timestamp.valueOf("2026-01-01 00:00:00")),
      Message("sensors/b", """{"value":7.0}""".getBytes("UTF-8"),
        0, retain = false, Timestamp.valueOf("2026-01-01 00:00:01")),
      Message("sensors/c", """{"other":true}""".getBytes("UTF-8"),
        0, retain = false, Timestamp.valueOf("2026-01-01 00:00:02")),
      Message("sensors/d", "not json".getBytes("UTF-8"),
        0, retain = false, Timestamp.valueOf("2026-01-01 00:00:03"))
    ).toDF()
  }

  private val exprToml =
    """[[routes]]
      |filter = "sensors/#"
      |where = "try_parse_json(cast(payload as string)) is not null"
      |select = ["time", "topic as device", "coalesce(cast(get_json_object(cast(payload as string), '$.temperature') as double), cast(get_json_object(cast(payload as string), '$.value') as double), 0.0d) as value", "cast(payload as string) as raw"]
      |table = "iot_metrics"
      |""".stripMargin

  test("TOML select/where route equals the registry-based transform") {
    val router = EngineConfig.fromToml(exprToml).buildRouter(Map.empty)
    val fromConfig = router.fanOut(msgs)("iot_metrics")
      .orderBy(col("device")).collect().toSeq
    val fromRegistry = Transforms.iotMetrics(msgs)
      .orderBy(col("device")).collect().toSeq
    assert(fromConfig === fromRegistry)
    // the non-JSON message fell through the where to... nowhere: the route
    // matched it (sensors/#) but the transform filtered it out
    assert(router.fanOut(msgs)("iot_metrics").count() === 3)
  }

  test("select expressions keep Catalyst in charge: no UDF in the plan") {
    val router = EngineConfig.fromToml(exprToml).buildRouter(Map.empty)
    val plan = router.fanOut(msgs)("iot_metrics")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"config-deployed transform must stay expression-only:\n$plan")
  }

  test("script and select on one route are rejected") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "#"
        |script = "t.lua"
        |select = ["topic"]
        |""".stripMargin)
    intercept[IllegalArgumentException] {
      cfg.buildRouter(Map("t.lua" -> identity[org.apache.spark.sql.DataFrame] _))
    }
  }

  test("where-only route filters the passthrough capture, never silently drops the predicate") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "sensors/#"
        |where = "topic <> 'sensors/c'"
        |table = "kept"
        |""".stripMargin)
    val out = cfg.buildRouter(Map.empty).fanOut(msgs)("kept")
    // passthrough projection (canonical 6 columns), minus the filtered row
    assert(out.columns.toSeq ===
      Seq("time", "topic", "qos", "retain", "raw", "json"))
    assert(out.count() === 3)
    assert(out.filter(col("topic") === "sensors/c").count() === 0)
  }

  test("where composes with a registry script as a pre-filter") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "sensors/#"
        |script = "metrics"
        |where = "topic <> 'sensors/b'"
        |table = "iot_metrics"
        |""".stripMargin)
    val out = cfg.buildRouter(Map("metrics" -> Transforms.iotMetrics _))
      .fanOut(msgs)("iot_metrics")
    assert(out.filter(col("device") === "sensors/b").count() === 0)
    assert(out.count() === 2) // a and c parse as JSON; b pre-filtered; d not JSON
  }

  test("scalar select string is accepted as a one-element select list") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "#"
        |select = "topic as t"
        |table = "topics"
        |""".stripMargin)
    val out = cfg.buildRouter(Map.empty).fanOut(msgs)("topics")
    assert(out.columns.toSeq === Seq("t"))
    assert(out.count() === 4)
  }

  test("non-string non-array select fails with a route-naming error") {
    val e = intercept[IllegalArgumentException] {
      EngineConfig.fromToml(
        """[[routes]]
          |filter = "#"
          |select = 42
          |""".stripMargin)
    }
    assert(e.getMessage.contains("route 0"))
    assert(e.getMessage.contains("select"))
  }

  test("[[routes.records]]: one message emits records to N tables from pure TOML") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "sensors/#"
        |
        |[[routes.records]]
        |table = "readings"
        |where = "get_json_object(cast(payload as string), '$.temperature') is not null or get_json_object(cast(payload as string), '$.value') is not null"
        |select = ["topic as sensor", "coalesce(cast(get_json_object(cast(payload as string), '$.temperature') as double), cast(get_json_object(cast(payload as string), '$.value') as double)) as reading"]
        |
        |[[routes.records]]
        |table = "raw_json"
        |where = "try_parse_json(cast(payload as string)) is not null"
        |select = ["topic", "cast(payload as string) as raw"]
        |""".stripMargin)
    assert(cfg.routes.head.records.map(_.table) === Seq("readings", "raw_json"))
    val out = cfg.buildRouter(Map.empty).fanOut(msgs)
    // message a: both records; b: both; c: raw_json only; d: neither —
    // the 0..N-records-per-message contract, driven by config alone
    val readings = out("readings").orderBy("sensor")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(readings === Seq(("sensors/a", 21.5), ("sensors/b", 7.0)))
    val raw = out("raw_json").select("topic").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(raw === Set("sensors/a", "sensors/b", "sensors/c"))
  }

  test("records route is mutually exclusive with select/script") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "#"
        |select = ["topic"]
        |
        |[[routes.records]]
        |table = "t"
        |select = ["topic"]
        |""".stripMargin)
    val e = intercept[IllegalArgumentException] { cfg.buildRouter(Map.empty) }
    assert(e.getMessage.contains("records"))
  }

  test("[[routes.records]] before any [[routes]] is a parse error") {
    intercept[IllegalArgumentException] {
      EngineConfig.parseToml(
        """[[routes.records]]
          |table = "t"
          |""".stripMargin)
    }
  }

  test("malformed select expression surfaces as an analysis error at use") {
    val cfg = EngineConfig.fromToml(
      """[[routes]]
        |filter = "#"
        |select = ["this is not ( valid sql"]
        |table = "t"
        |""".stripMargin)
    val router = cfg.buildRouter(Map.empty) // building is lazy, legal
    intercept[Exception] {
      router.fanOut(msgs)("t").collect()
    }
  }
}
