package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Envelope
import graft.operators.{Analytics, Route, Router, Transforms}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that this engine implements is exposed
  * here as a named query over the driver's parquet corpus, with (where
  * SQL-expressible) an equivalent DuckDB oracle in [[oracleSql]]. Column
  * names are aligned between the Spark plan and the oracle SQL because the
  * driver's comparator sorts columns by name before hashing.
  *
  * Determinism: every query ends in an explicit ORDER BY on a unique key so
  * row order is stable across engines; double-typed aggregates are computed
  * via exact DECIMAL sums cast back to DOUBLE so both engines produce
  * bit-identical values regardless of partitioning/accumulation order.
  */
object SparkEntry {

  /** The standard route table used by routing-shaped queries: the events
    * stream adapted to the message envelope (Envelope.messagesFromEvents),
    * routed through a first-match router mirroring the reference examples
    * (examples/config_routing.toml): a transform route, a passthrough
    * route, and the unmatched fall-through.
    */
  private def messages(s: SparkSession, dir: String): DataFrame =
    Envelope.messagesFromEvents(Tables.events(s, dir))

  /** Routes used by the routing queries; first-match order is semantic. */
  private val demoRoutes = Seq(
    Route("purchases", "events/purchase/#", table = "purchase_metrics"),
    Route("user13", "events/+/13", table = "user13_raw"),
    Route("clicks_views", "events/click/#", table = "click_raw"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full route pipeline — envelope → first-match routing → canonical
    * passthrough capture of everything (A3 + A7).
    */
  def entry(spark: SparkSession): DataFrame = {
    val r = new Router(demoRoutes)
    r.tag(messages(spark, "/root/testdata/sf0.001"))
      .select("time", "topic", "route", "target_table")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A7 — canonical passthrough capture (router.go:402-418)
    "passthrough_raw" -> ((s, dir) =>
      Envelope.passthrough(messages(s, dir))
        .withColumn("time_us", unix_micros(col("time")))
        .drop("time")
        .orderBy(col("topic"), col("time_us"), col("raw"))),

    // A2 — MQTT topic-filter predicate compiled to an anchored regex
    "topic_filter_match" -> ((s, dir) =>
      messages(s, dir)
        .filter(graft.functions.MqttFunctions.topicMatchesCol("events/+/13", col("topic")))
        .select(col("event_id"), col("topic"))
        .orderBy(col("event_id"))),

    // A3 — first-match routing over overlapping filters (order semantic)
    "route_first_match" -> ((s, dir) => {
      val r = new Router(demoRoutes)
      r.tag(messages(s, dir))
        .groupBy(col("route"), col("target_table"))
        .agg(count(lit(1)).as("n_messages"))
        .orderBy(col("route").asc_nulls_first)
    }),

    // A5/A6 — routing_transform.lua as column expressions
    "transform_iot_metrics" -> ((s, dir) =>
      Transforms.iotMetrics(messages(s, dir))
        .withColumn("time_us", unix_micros(col("time")))
        .drop("time")
        .orderBy(col("device"), col("time_us"))),

    // B1-B5 — codec scalar surface on the documents table
    "codec_functions" -> ((s, dir) => {
      import graft.functions.Codecs
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          Codecs.rot13(substring(col("text"), 1, 32)).as("head_rot13"),
          Codecs.base64Encode(substring(col("text"), 1, 32)).as("head_b64"),
          Codecs.hexEncode(substring(col("text"), 1, 16)).as("head_hex"))
        .orderBy(col("doc_id"))
    }),

    // C1 — recent-N top-k scan (TakeOrderedAndProject, never a full sort)
    "q_recent_topk" -> ((s, dir) =>
      Analytics.recentTopK(Tables.events(s, dir), 10)),

    // C2 — time-range filter + grouped aggregate
    "q_timerange_agg" -> ((s, dir) =>
      Analytics.timeRangeAgg(Tables.events(s, dir),
        "2024-01-10 00:00:00", "2024-01-20 00:00:00")),

    // C3 — JSON field extraction
    "q_json_extract" -> ((s, dir) =>
      Analytics.jsonExtract(Tables.events(s, dir))),

    // C4 — time-bucketed continuous aggregate (batch/backfill shape)
    "q_time_bucket_agg" -> ((s, dir) =>
      Analytics.timeBucketAgg(Tables.events(s, dir))),

    // TPC-H Q1 shape — hash agg with partial combine, decimal-exact sums
    "q1_pricing_summary" -> ((s, dir) =>
      Analytics.pricingSummary(Tables.lineitem(s, dir))),

    // TPC-H Q5 shape — 5-way join, broadcast dims
    "q5_region_revenue" -> ((s, dir) => Analytics.regionRevenue(s, dir)),

    // ranking window — top-3 orders per customer
    "q_top_orders_per_customer" -> ((s, dir) =>
      Analytics.topOrdersPerCustomer(Tables.orders(s, dir), 3)),

    // EXISTS via left-semi join — order priority count
    "q_order_priority" -> ((s, dir) =>
      Analytics.orderPriorityCount(Tables.orders(s, dir), Tables.lineitem(s, dir))))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "passthrough_raw" ->
      """SELECT epoch_us(ts) AS time_us,
        |       'events/' || event_type || '/' || user_id AS topic,
        |       CAST(event_id % 3 AS INT) AS qos,
        |       FALSE AS retain,
        |       props AS raw,
        |       CASE WHEN json_valid(props) THEN props END AS json
        |FROM events
        |ORDER BY topic, time_us, raw""".stripMargin,

    "topic_filter_match" ->
      """SELECT event_id, 'events/' || event_type || '/' || user_id AS topic
        |FROM events
        |WHERE regexp_matches('events/' || event_type || '/' || user_id,
        |                     '^events/[^/]*/13$')
        |ORDER BY event_id""".stripMargin,

    "route_first_match" ->
      """WITH tagged AS (
        |  SELECT CASE
        |           WHEN regexp_matches(t, '^events/purchase(/.*)?$') THEN 'purchases'
        |           WHEN regexp_matches(t, '^events/[^/]*/13$') THEN 'user13'
        |           WHEN regexp_matches(t, '^events/click(/.*)?$') THEN 'clicks_views'
        |         END AS route,
        |         CASE
        |           WHEN regexp_matches(t, '^events/purchase(/.*)?$') THEN 'purchase_metrics'
        |           WHEN regexp_matches(t, '^events/[^/]*/13$') THEN 'user13_raw'
        |           WHEN regexp_matches(t, '^events/click(/.*)?$') THEN 'click_raw'
        |           ELSE 'iot_raw'
        |         END AS target_table
        |  FROM (SELECT 'events/' || event_type || '/' || user_id AS t FROM events))
        |SELECT route, target_table, COUNT(*) AS n_messages
        |FROM tagged GROUP BY route, target_table
        |ORDER BY route ASC NULLS FIRST""".stripMargin,

    "transform_iot_metrics" ->
      """SELECT 'events/' || event_type || '/' || user_id AS device,
        |       COALESCE(CAST(json_extract(props, '$.temperature') AS DOUBLE),
        |                CAST(json_extract(props, '$.value') AS DOUBLE),
        |                0.0) AS value,
        |       props AS raw,
        |       epoch_us(ts) AS time_us
        |FROM events
        |WHERE json_valid(props)
        |ORDER BY device, time_us""".stripMargin,

    "codec_functions" ->
      """SELECT doc_id,
        |       translate(substring(text, 1, 32),
        |         'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
        |         'NOPQRSTUVWXYZABCDEFGHIJKLMnopqrstuvwxyzabcdefghijklm') AS head_rot13,
        |       to_base64(CAST(substring(text, 1, 32) AS BLOB)) AS head_b64,
        |       lower(hex(substring(text, 1, 16))) AS head_hex
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_recent_topk" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events
        |ORDER BY ts_us DESC, event_id DESC
        |LIMIT 10""".stripMargin,

    "q_timerange_agg" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
        |       COUNT(*) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_time_bucket_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
        |       event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
        |       MIN(value) AS min_value,
        |       MAX(value) AS max_value,
        |       COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_us, event_type""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
