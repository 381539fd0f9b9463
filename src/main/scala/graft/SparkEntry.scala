package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Envelope
import graft.sinks.Sink
import graft.operators.{Analytics, Assembly, Behavior, Clustering, Curation,
  Dedup, Multimodal, Route, Router, Sessionize, Similarity, Transforms,
  TextAnalysis}

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

  /** Deterministically-MESSY URL for the url-dedup query (the corpus has
    * no URL column): scheme/host case noise, a default port, a trailing
    * slash, utm_* tracking params, and a fragment are each switched on by
    * doc_id residues so every canonicalization rule fires on some rows and
    * distinct raw URLs collapse to shared canonical keys. The oracle
    * derives the identical string in SQL.
    */
  private[graft] def derivedUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      when(id % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
      lit("://"),
      when(id % 3 === 0,
        concat(lit("WWW."), col("source"), lit(".Example.COM")))
        .when(id % 3 === 1, concat(col("source"), lit(".example.com")))
        .otherwise(concat(lit("www."), upper(col("source")),
          lit(".EXAMPLE.com"))),
      when(id % 4 === 0, lit(":443")).otherwise(lit("")),
      concat(lit("/docs/"), (id % 40).cast("string")),
      when(id % 2 === 1, lit("/")).otherwise(lit("")),
      when(id % 4 === 0,
        concat(lit("?utm_source=feed&id="), (id % 7).cast("string")))
        .when(id % 4 === 1,
          concat(lit("?id="), (id % 7).cast("string"),
            lit("&utm_campaign=x&ref=a")))
        .otherwise(lit("")),
      when(id % 5 === 0, concat(lit("#sec"), (id % 3).cast("string")))
        .otherwise(lit("")))
  }

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

    // A13+A5 — config-DEPLOYABLE transform: the same iot_metrics route
    // built from pure TOML (select/where Spark SQL expression strings, no
    // registry entry, no recompile — the reference's drop-a-Lua-file
    // deployment path, README.md:184-221). Must hash-match the
    // registry-based transform_iot_metrics above.
    "transform_config_expr" -> ((s, dir) => {
      val toml =
        """[[routes]]
          |filter = "events/#"
          |where = "try_parse_json(cast(payload as string)) is not null"
          |select = ["time", "topic as device", "coalesce(cast(get_json_object(cast(payload as string), '$.temperature') as double), cast(get_json_object(cast(payload as string), '$.value') as double), 0.0d) as value", "cast(payload as string) as raw"]
          |table = "iot_metrics"
          |""".stripMargin
      val router = graft.config.EngineConfig.fromToml(toml)
        .buildRouter(Map.empty)
      router.fanOut(messages(s, dir))("iot_metrics")
        .withColumn("time_us", unix_micros(col("time")))
        .drop("time")
        .orderBy(col("device"), col("time_us"))
    }),

    // A13+A5 FULL contract from pure TOML — multi-RECORD fan-out
    // ([[routes.records]]): one message emits records to N tables with a
    // per-record table override and per-record predicate, compiled from
    // config alone (the complete Lua parseRecords contract,
    // router.go:291-341, examples/multi_table.lua:30 — zero recompile).
    // Must hash-match transform_generic_multi_table, which computes the
    // same records through the precompiled GenericTransform escape hatch.
    "transform_config_multi_table" -> ((s, dir) => {
      // fanned before the JSON encode/decode chain (r17, [[Fanout]])
      val m = graft.operators.Fanout.bySessionCores(
          Tables.events(s, dir), col("event_id")).select(
        concat(lit("sensors/s"), col("user_id").cast("string")).as("topic"),
        to_json(struct(
          col("value").as("temperature"),
          when(col("user_id") % 2 === 0, col("value") * 0.5).as("humidity"),
          when(col("event_type") === "click", lit("high")).as("alert")))
          .cast("binary").as("payload"),
        lit(0).as("qos"), lit(false).as("retain"), col("ts").as("time"))
      val toml =
        """[[routes]]
          |filter = "sensors/#"
          |
          |[[routes.records]]
          |table = "sensor_readings"
          |where = "get_json_object(cast(payload as string), '$.temperature') is not null or get_json_object(cast(payload as string), '$.humidity') is not null"
          |select = ["time", "coalesce(nullif(regexp_extract(topic, 'sensors/([^/]+)', 1), ''), 'unknown') as sensor_id", "coalesce(cast(get_json_object(cast(payload as string), '$.temperature') as double), 0.0d) as temperature", "coalesce(cast(get_json_object(cast(payload as string), '$.humidity') as double), 0.0d) as humidity", "coalesce(cast(get_json_object(cast(payload as string), '$.battery') as double), 100.0d) as battery"]
          |
          |[[routes.records]]
          |table = "sensor_events"
          |where = "get_json_object(cast(payload as string), '$.alert') is not null"
          |select = ["time", "coalesce(nullif(regexp_extract(topic, 'sensors/([^/]+)', 1), ''), 'unknown') as sensor_id", "'alert' as event_type", "cast(payload as string) as details"]
          |""".stripMargin
      val tables = graft.config.EngineConfig.fromToml(toml)
        .buildRouter(Map.empty).fanOut(m)
      val r = tables("sensor_readings").select(
        lit("sensor_readings").as("rec_table"),
        unix_micros(col("time")).as("time_us"),
        col("sensor_id"), col("temperature"), col("humidity"), col("battery"),
        lit(null).cast("string").as("event_type"),
        lit(false).as("has_details"))
      val e = tables("sensor_events").select(
        lit("sensor_events").as("rec_table"),
        unix_micros(col("time")).as("time_us"),
        col("sensor_id"),
        lit(null).cast("double").as("temperature"),
        lit(null).cast("double").as("humidity"),
        lit(null).cast("double").as("battery"),
        col("event_type"), col("details").isNotNull.as("has_details"))
      r.unionByName(e)
        .orderBy(col("rec_table"), col("time_us"), col("sensor_id"))
    }),

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
      Analytics.orderPriorityCount(Tables.orders(s, dir), Tables.lineitem(s, dir))),

    // NOT EXISTS via left-anti join + uncorrelated scalar subquery
    // (TPC-H Q22 shape)
    "q_dormant_customers" -> ((s, dir) =>
      Analytics.dormantHighBalance(Tables.customer(s, dir), Tables.orders(s, dir))),

    // correlated scalar subquery decorrelated to agg+join (TPC-H Q17
    // shape); integer-exact threshold compare
    "q_small_qty_revenue" -> ((s, dir) =>
      Analytics.smallQuantityRevenue(Tables.lineitem(s, dir), Tables.part(s, dir))),

    // conditional-aggregation ratio in ONE pass (TPC-H Q14 shape)
    "q_promo_share" -> ((s, dir) =>
      Analytics.promoRevenueShare(Tables.lineitem(s, dir), Tables.part(s, dir))),

    // NOT IN as broadcast anti join + COUNT DISTINCT (TPC-H Q16 shape)
    "q_supplier_count" -> ((s, dir) =>
      Analytics.supplierCountByBrand(Tables.lineitem(s, dir),
        Tables.part(s, dir), Tables.supplier(s, dir))),

    // PIVOT — per-user event-type count matrix (explicit value list:
    // single grouping pass, deterministic schema)
    "q_event_pivot" -> ((s, dir) =>
      Analytics.userActivityPivot(Tables.events(s, dir))),

    // CUBE — all four grouping sets in one shuffle, GROUPING markers
    "q_revenue_cube" -> ((s, dir) =>
      Analytics.revenueCube(Tables.lineitem(s, dir))),

    // TPC-H Q6 shape — pure scan-filter-aggregate with full pushdown
    "q6_forecast_revenue" -> ((s, dir) =>
      Analytics.forecastRevenue(Tables.lineitem(s, dir))),

    // TPC-H Q3 shape — selective join + aggregate + top-k
    "q3_shipping_priority" -> ((s, dir) =>
      Analytics.shippingPriority(Tables.lineitem(s, dir),
        Tables.orders(s, dir), Tables.customer(s, dir))),

    // cumulative window aggregate — running total per customer
    "q_running_total" -> ((s, dir) =>
      Analytics.runningOrderTotal(Tables.orders(s, dir))),

    // ROLLUP grouping sets — hierarchical revenue subtotals
    "q_revenue_rollup" -> ((s, dir) => Analytics.revenueRollup(s, dir)),

    // set operation (INTERSECT as semi-join) — repeat customers
    "q_repeat_customers" -> ((s, dir) =>
      Analytics.repeatCustomers(Tables.orders(s, dir))),

    // lag window + epoch arithmetic — inter-shipment gaps per supplier
    "q_shipment_gaps" -> ((s, dir) =>
      Analytics.shipmentGaps(Tables.lineitem(s, dir))),

    // TPC-H Q7 shape — nation×nation trade-volume matrix by ship year;
    // nation broadcast twice under different aliases
    "q7_trade_volume" -> ((s, dir) =>
      Analytics.nationTradeVolume(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir))),

    // TPC-H Q8 shape — market share via conditional aggregation in the
    // same shuffle as the denominator
    "q8_market_share" -> ((s, dir) =>
      Analytics.marketShare(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir),
        Tables.region(s, dir), Tables.part(s, dir))),

    // TPC-H Q9 shape (adapted: no partsupp in this corpus) — profit by
    // supplier nation × order year over name-matched parts
    "q9_product_profit" -> ((s, dir) =>
      Analytics.productTypeProfit(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir), Tables.part(s, dir))),

    // TPC-H Q10 shape — top-20 customers by returned revenue in a window
    "q10_returned_items" -> ((s, dir) =>
      Analytics.returnedItemLosses(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir))),

    // TPC-H Q13 shape — order-count distribution over a LEFT join
    "q13_order_distribution" -> ((s, dir) =>
      Analytics.orderCountDistribution(Tables.customer(s, dir),
        Tables.orders(s, dir))),

    // TPC-H Q15 shape — top supplier(s) by quarterly revenue, ties kept
    // via a broadcast scalar-max join (no single-partition window)
    "q15_top_supplier" -> ((s, dir) =>
      Analytics.topSupplier(Tables.lineitem(s, dir), Tables.supplier(s, dir))),

    // TPC-H Q18 shape — HAVING on a per-order aggregate, then enrich
    "q18_large_orders" -> ((s, dir) =>
      Analytics.largeVolumeOrders(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir))),

    // TPC-H Q11 shape — per-part value with a global-threshold scalar
    // subquery derived from the same aggregate (one lineitem scan)
    "q11_important_parts" -> ((s, dir) =>
      Analytics.importantPartValue(Tables.lineitem(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),

    // TPC-H Q12 shape — conditional high/low-priority counts per flag
    "q12_priority_distribution" -> ((s, dir) =>
      Analytics.shipPriorityDistribution(Tables.lineitem(s, dir),
        Tables.orders(s, dir))),

    // TPC-H Q20 shape — semi-join against an aggregated subquery
    "q20_heavy_suppliers" -> ((s, dir) =>
      Analytics.heavyPartSuppliers(Tables.lineitem(s, dir),
        Tables.supplier(s, dir), Tables.part(s, dir))),

    // TPC-H Q21 shape — EXISTS/NOT-EXISTS self-joins decorrelated into
    // one per-order aggregate
    "q21_waiting_suppliers" -> ((s, dir) =>
      Analytics.waitingSuppliers(Tables.lineitem(s, dir),
        Tables.orders(s, dir), Tables.supplier(s, dir))),

    // exact interpolated percentiles per event type (order statistics)
    "q_percentiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile(value, 0.99)").as("p99"))
        .orderBy(col("event_type"))),

    // sketch aggregate — HLL distinct users per event type, made
    // ORACLE-CHECKABLE: the exact count is SQL-recomputable and the HLL
    // error claim is reduced to an in-plan boolean (|approx−exact| ≤
    // 3·rsd·exact, rsd = Spark's 0.05 default) that the oracle pins to
    // TRUE — a drifting sketch now hash-mismatches instead of hiding
    // behind a rows-only check
    "q_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast("double")
            <= col("exact_users").cast("double") * 0.15)
            .as("approx_within_3rsd"))
        .orderBy(col("event_type"))),

    // A6 — transform.lua's legacy 1→1 contract (C→F conversion, rot13,
    // unix-seconds stamping) driven by a payload synthesized from the
    // events value column
    "transform_unit_conversion" -> ((s, dir) => {
      val m = messages(s, dir)
        .withColumn("payload",
          to_json(struct(col("value").as("temperature"))).cast("binary"))
      Transforms.unitConversion(m)
        .orderBy(col("topic"), col("timestamp"), col("temperature_celsius"))
    }),

    // A5 FULL contract — the generic row-level transform escape hatch:
    // multi_table.lua re-implemented as arbitrary Scala (JSON parse,
    // per-record table override, dynamic column maps) through
    // GenericTransform, fanned out typed via the declared catalog, and
    // hash-checked against SQL recomputing the same records. Payloads are
    // synthesized from events columns so both sensor tables are exercised.
    "transform_generic_multi_table" -> ((s, dir) => {
      import graft.operators.{GenericTransform => GT}
      // fanned before the JSON encode/decode chain (r17, [[Fanout]])
      val m = graft.operators.Fanout.bySessionCores(
          Tables.events(s, dir), col("event_id")).select(
        concat(lit("sensors/s"), col("user_id").cast("string")).as("topic"),
        to_json(struct(
          col("value").as("temperature"),
          when(col("user_id") % 2 === 0, col("value") * 0.5).as("humidity"),
          when(col("event_type") === "click", lit("high")).as("alert")))
          .cast("binary").as("payload"),
        lit(0).as("qos"), lit(false).as("retain"), col("ts").as("time"))
      val tables = GT.fanOut(
        GT(m, "iot_data", GT.multiTableExample), GT.multiTableCatalog)
      val r = tables("sensor_readings").select(
        lit("sensor_readings").as("rec_table"),
        unix_micros(col("time")).as("time_us"),
        col("sensor_id"), col("temperature"), col("humidity"), col("battery"),
        lit(null).cast("string").as("event_type"),
        lit(false).as("has_details"))
      val e = tables("sensor_events").select(
        lit("sensor_events").as("rec_table"),
        unix_micros(col("time")).as("time_us"),
        col("sensor_id"),
        lit(null).cast("double").as("temperature"),
        lit(null).cast("double").as("humidity"),
        lit(null).cast("double").as("battery"),
        col("event_type"), col("details").isNotNull.as("has_details"))
      r.unionByName(e)
        .orderBy(col("rec_table"), col("time_us"), col("sensor_id"))
    }),

    // B6 — HMAC-SHA256 payload signing; oracled via the RFC 2104
    // decomposition for the fixed key (see [[hmacOracleSql]])
    "codec_hmac" -> ((s, dir) => {
      import graft.functions.Codecs
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Codecs.hmacSha256(lit("graft-key"), substring(col("text"), 1, 64))
            .as("sig"))
        .orderBy(col("doc_id"))
    }),

    // ---- north-star: text analysis ----
    "text_stats" -> ((s, dir) =>
      TextAnalysis.withQuality(Tables.documents(s, dir))
        .select("doc_id", "lang", "n_tokens", "n_tokens_bpe",
          "avg_token_len", "punct_ratio", "stopword_ratio", "quality_score")
        .orderBy(col("doc_id"))),

    "text_langid" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val scored = TextAnalysis.langScores(col("text"))
        .foldLeft(d) { case (df, (lang, score)) =>
          df.withColumn(s"s_$lang", score) }
      scored
        .withColumn("lang_pred", TextAnalysis.langId(col("text")))
        .select("doc_id", "s_en", "s_data", "s_query", "lang_pred")
        .orderBy(col("doc_id"))
    }),

    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.withFingerprints(Tables.documents(s, dir))
        .select("doc_id", "fp_md5", "fp_rolling")
        .orderBy(col("doc_id"))),

    // corpus Zipf head: term + document frequency, deterministic top-50
    "text_token_freq" -> ((s, dir) =>
      TextAnalysis.tokenFrequencies(Tables.documents(s, dir), topN = 50)),

    // PMI co-occurrence pairs on the integer ratio lattice: ppm ratio
    // whose log is PMI (log-monotone ⇒ same rankings, hash-exact cells);
    // minDf prunes the tail BEFORE the doc-keyed pair join
    "text_pmi" -> ((s, dir) =>
      TextAnalysis.pmiPairs(Tables.documents(s, dir))),

    // TextRank keywords: integer PageRank over the PMI presence-pair
    // graph with md5-prefix node ids — the whole composition (graph
    // build + 10 unrolled rounds) replayed by the oracle
    "text_keywords_textrank" -> ((s, dir) =>
      TextAnalysis.textRankKeywords(Tables.documents(s, dir))),

    // per-doc distinctive terms: integer-exact TF-IDF ordering
    "text_top_terms" -> ((s, dir) =>
      TextAnalysis.distinctiveTerms(Tables.documents(s, dir), k = 3)
        .orderBy(col("doc_id"), col("token"))),

    // integer-lattice Flesch readability: pure regexp counts, one scan,
    // zero shuffle; every division a floor `div` so both engines agree
    "text_readability" -> ((s, dir) =>
      TextAnalysis.readability(Tables.documents(s, dir))),

    // cross-doc duplicated-n-gram share per doc (inverted-posting shape:
    // only (gram hash, doc_id) pairs shuffle) — the corpus-common-text
    // signal pairwise Jaccard dedup misses
    "text_dup_gram_fraction" -> ((s, dir) =>
      TextAnalysis.dupGramFraction(Tables.documents(s, dir))),

    // ---- north-star: dedup ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir))
        .orderBy(col("content_key"))),

    // MinHash-LSH near-dup pairs, registered as the HASH-VERIFIABLE
    // recall audit (the signature/banding hashes are not SQL-expressible,
    // but the exact word-shingle pair set IS — wordShingleJaccardPairs,
    // recomputed by the oracle from string shingles): one row carrying
    // the exact pair count plus claims the oracle pins TRUE — LSH found
    // ≥90% of the exact pairs (s-curve at 16×4 gives ~99.98%; spec
    // measures 100%) and every reported pair is exact-verified (no false
    // positives, structural: the pipeline filters on the same exact
    // Jaccard). The per-doc partner summary stays available from
    // minhashLshPairs; recall is ALSO spec-tested at the tighter floor.
    "dedup_minhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val lsh = Dedup.minhashLshPairs(docs, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      val exact = Dedup.wordShingleJaccardPairs(docs, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nHit = lsh.join(exact, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      val nFp = lsh.join(exact, Seq("doc_a", "doc_b"), "left_anti")
        .agg(count(lit(1)).as("n_fp"))
      nExact.crossJoin(nHit).crossJoin(nFp)
        .select(
          col("n_exact").as("n_exact_pairs"),
          (col("n_hit").cast("double") >= col("n_exact").cast("double") * 0.9)
            .as("recall_ge_floor"),
          (col("n_fp") === 0L).as("no_false_positives"))
    }),

    // SimHash banded near-dup, registered as the HASH-VERIFIABLE audit.
    // The 64-bit fingerprint itself is not SQL-expressible (seeded
    // xxhash64), but a THEOREM about the pipeline is: identical
    // normalized text => identical token array => identical simhash =>
    // hamming 0 => the 4x16-bit banding MUST report the pair (all four
    // bands agree). So the audit row carries the exact-duplicate pair
    // count (recomputed by the oracle from normalized text alone) plus
    // the detected-at-hamming-0 completeness claim the oracle pins TRUE.
    // Deliberately NOT claimed: recall vs J>=0.8 shingle pairs — at
    // hamming<=3 simhash only catches J≳0.95 (expected hamming at
    // J=0.8 is ~10 bits), so that claim would be corpus-luck, not
    // design. Brute-force-equality of the banding and hamming-closeness
    // of near-dups stay spec-verified (DedupSpec).
    "dedup_simhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // exact-dup pairs from a 16-byte key groupBy-join — one shuffle on
      // md5(normText), never on text; the same key discipline as
      // Dedup.exactGroups
      val keyed = docs.select(col("doc_id"),
        md5(Dedup.normText(col("text"))).as("k"))
      val dup = keyed.as("a")
        .join(keyed.as("b"),
          col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val det0 = Dedup.simhashPairs(docs, maxDist = 3)
        .filter(col("hamming") === 0)
        .select(col("doc_a"), col("doc_b"))
      val nDup = dup.agg(count(lit(1)).as("n_dup"))
      val nMiss = dup.join(det0, Seq("doc_a", "doc_b"), "left_anti")
        .agg(count(lit(1)).as("n_miss"))
      nDup.crossJoin(nMiss).select(
        col("n_dup").as("n_exact_dup_pairs"),
        (col("n_miss") === 0L).as("dups_all_detected_hamming0"))
    }),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), threshold = 0.8)
        .orderBy(col("doc_a"), col("doc_b"))),

    // directional partial-copy pairs: |A∩B|/|A| ≥ 60% over word
    // 3-shingles via the postings self-join (see containmentPairs —
    // Jaccard's size band can't block the asymmetric ratio)
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), pct = 60)),

    // exact path: dedupe-first (identical vectors collapse before any
    // pairwise work) + partial-aggregating argmax so pair rows never
    // shuffle — hash-checked against the all-pairs SQL oracle
    "dedup_embedding_nn" -> ((s, dir) =>
      Similarity.nnWithinLabel(Tables.embeddings(s, dir))),

    // threshold form of embedding near-dup: all within-label pairs with
    // cosine >= tau (pair ids only — the cosine VALUE is op-order
    // sensitive vs DuckDB's list_cosine_similarity, the SET is not).
    // PARITY ASSUMPTION: no within-label pair's cosine sits within ~1 ulp
    // of tau (Spark dots pre-normalized units; DuckDB list_cosine_
    // similarity normalizes inline on raw doubles — a boundary pair could
    // cross tau differently). Holds on the driver corpus (min observed
    // gap to 0.35 is ~1e-3); regenerated data should re-verify no pair
    // lies within a ~1e-12 band of the threshold.
    "dedup_embedding_pairs" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, dir), threshold = 0.35)
        .select(col("label"), col("vec_a"), col("vec_b"))
        .orderBy(col("vec_a"), col("vec_b"))),

    // approximate twin: COVERAGE-AWARE DISPATCH — prices the SRP-LSH
    // bucket path (probe⋈candidate join size, band-0 histogram) against
    // the exact dedupe-first path and runs whichever is cheaper. On this
    // isotropic corpus that is the exact path (round 5 measured the raw
    // bucket path at 491 s vs 5 s at 20×); a clustered corpus takes the
    // buckets (spec-asserted). ORACLE-CHECKED against the exact-NN SQL:
    // on this corpus a correct dispatch MUST produce the exact answer
    // bit-for-bit, so a wrong dispatch decision (or a bucket-path
    // divergence) breaks the hash — the dispatch itself is verified.
    "dedup_embedding_nn_ann" -> ((s, dir) =>
      Similarity.nnWithinLabelAnn(Tables.embeddings(s, dir))),

    // SemDeDup: within-label cosine pairs -> connected components ->
    // keep each component's min vec_id; every vector labeled with its
    // component + survivor flag (the semantic-dedup mask)
    "dedup_semantic" -> ((s, dir) =>
      Dedup.semanticDedup(Tables.embeddings(s, dir), threshold = 0.35)),

    // integer-exact SemDeDup: oracle-replayable k-means cells + quantized-
    // cosine near-dup pairs (long-only predicate, no float boundary) + CC
    // + survivor mask — the ENTIRE semantic-dedup composition hash-checked
    // end to end, closing the float-twin's property-spec-only caveat
    "dedup_semdedup_kmeans" -> ((s, dir) =>
      Dedup.semanticDedupExact(Tables.embeddings(s, dir))),

    // pairs -> CLUSTERS: connected components of the ngram near-dup graph
    // (large-star/small-star), every doc labeled with its component's min
    // doc_id — the survivor-selection step of a real corpus dedup.
    // Oracle = DuckDB recursive CTE reachability over the same brute-force
    // pair set (threshold 0.7 for a denser, transitive-chain-bearing graph)
    "dedup_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.7)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      graft.operators.Graph.componentsFor(docs, "doc_id", pairs)
        .orderBy(col("doc_id"))
    }),

    // dedup threshold calibration: pair/affected-doc counts at each
    // candidate Jaccard cut, ONE pair pass at the loosest threshold
    "dedup_threshold_sweep" -> ((s, dir) =>
      Dedup.thresholdSweep(Tables.documents(s, dir))),

    // duplicate-cluster size histogram over the same near-dup graph as
    // dedup_clusters — the post-dedup audit (fat tail = template/mirror
    // content or a loose threshold)
    "dedup_cluster_sizes" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.7)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      graft.operators.Graph.componentSizeHistogram(docs, "doc_id", pairs)
    }),

    // synchronous min-tie label-propagation communities over the sliced
    // part co-purchase graph — cap 20 with the CONVERGENCE STOP doing
    // the work: this graph reaches its label fixed point at round 11
    // (both sf0.01 and sf0.1), so the engine stops there while the
    // oracle unrolls all 20 rounds — the hash match IS the proof that
    // early stop never changes the answer (fixed points persist; 2-cycles
    // resolve by cap parity)
    "graph_communities" -> ((s, dir) =>
      graft.operators.Graph.labelPropagation(
        slicedCoPurchasePairs(s, dir), iterations = 20)),

    // integer-mass PageRank over the customer–supplier trade graph
    // (customers = even node ids, suppliers = odd; symmetric edges from
    // distinct order↔supplier pairs); 10 fixed iterations, long
    // arithmetic throughout so the DuckDB unrolled recurrence matches
    // bit for bit
    "graph_pagerank" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("a"),
          (col("l_suppkey") * 2 + 1).cast("long").as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      graft.operators.Graph.pageRankInt(edges, iterations = 10)
    }),

    // dangling-mass PageRank on the DIRECTED customer→supplier graph:
    // every supplier is a sink, so standard PageRank's uniform
    // redistribution of dangling mass is exercised for real — D crosses
    // the driver as one long per round; the oracle replays the identical
    // integer recurrence (dangling scalar per unrolled step)
    "graph_pagerank_dangling" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        .distinct()
      graft.operators.Graph.pageRankInt(edges, iterations = 10,
        redistributeDangling = true)
    }),

    // triangle census over the part co-purchase graph (parts sharing an
    // order): degree-oriented wedge counting — O(√m) out-degree bound
    // kills the last-reducer hub problem; all equi-joins, exact integers.
    // The registered census runs on a deterministic 1-in-4 order slice:
    // triangle counting's floor is Ω(wedges), and the FULL sf0.1
    // co-purchase graph is wedge-dense enough (~1.2M edges over 20k
    // parts) to dominate the whole bench (measured 17.8 s; ScaleCheck
    // keeps the full-graph probe as the honest receipt) — sampling the
    // graph, not weakening the operator
    "graph_triangles" -> ((s, dir) =>
      graft.operators.Graph.triangleStats(slicedCoPurchasePairs(s, dir))),

    // DOULION edge-sampled triangle ESTIMATE over the FULL co-purchase
    // graph (no order slice): each canonical edge survives iff the top
    // 16 bits of md5("u:v") ≡ 0 (mod 4) — a pure-hash coin, so the
    // sample is deterministic and the oracle replays the identical
    // sparsified census; estimate = sampled · 4³. This is the
    // full-graph affordability path the exact census (wedge-bound,
    // SCALING.md receipt) runs next to: ~p² of the wedge cost on the
    // whole graph vs exact on the 1-in-4 slice.
    "graph_triangles_approx" -> ((s, dir) => {
      val items = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = items.as("a")
        .join(items.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst"))
      graft.operators.Graph.triangleStatsSampled(pairs, sampleDenom = 4)
    }),

    // 3-core of the weight-≥2 co-purchase graph (Matula–Beck peel): the
    // engine stops at the edge-count fixed point (11 peel rounds at
    // sf0.01); the oracle unrolls 16 — the peel is monotone, so any cap
    // ≥ rounds-to-convergence replays the exact core (no parity case)
    "graph_kcore" -> ((s, dir) => {
      val (core, rounds) = graft.operators.Graph
        .kCoreWithRounds(weightedCoPurchasePairs(s, dir), k = 3)
      // the oracle unrolls 16 rounds; a corpus whose peel runs deeper
      // would hash-mismatch with the blame on the wrong side — fail HERE
      require(rounds <= 16,
        s"graph_kcore oracle unrolls 16 peel rounds but the corpus needed $rounds")
      core
    }),

    // common-neighbor / Jaccard link scores over the same weighted
    // graph — the neighborhood link-prediction features; minCommon=2
    // cuts wedge noise inside the partial aggregate
    "graph_common_neighbors" -> ((s, dir) =>
      graft.operators.Graph.commonNeighborScores(
        weightedCoPurchasePairs(s, dir))),

    // stateful-shape analytics: gap-based sessionization (batch twin of
    // the flatMapGroupsWithState streaming operator)
    "q_sessionize" -> ((s, dir) =>
      Sessionize.batchSessions(Tables.events(s, dir), gapMinutes = 30)),

    // AS-OF join: for every event, the user's most recent purchase at or
    // before it — the tagged-union + last-non-null-window operator (one
    // shuffle, no inequality-join pair explosion); oracle = DuckDB's
    // native ASOF LEFT JOIN
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"),
          col("value").as("purchase_value"))
      graft.operators.AsOf.asOf(
        ev, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_id", "purchase_value"),
        rightTieBreak = "purchase_id")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("asof_purchase_id"), col("asof_purchase_value"))
        .orderBy(col("event_id"))
    }),

    // RANGE join: for every event, how many same-user ±5-minute purchase
    // windows contain it — bucketized interval containment (equi-join on
    // time buckets + containment filter; never a nested-loop cross
    // product); oracle = DuckDB non-equi BETWEEN join
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("t_us", unix_micros(col("ts")))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          (col("t_us") - 300000000L).as("w_start_us"),
          (col("t_us") + 300000000L).as("w_end_us"))
      val matched = graft.operators.RangeJoin.bucketedRangeJoin(
        ev.select(col("user_id"), col("event_id"), col("t_us")),
        windows, keys = Seq("user_id"),
        pointTimeUs = "t_us", startUs = "w_start_us", endUs = "w_end_us",
        bucketWidthUs = 600000000L)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_windows"))
      ev.select(col("event_id"), col("t_us").as("ts_us"), col("user_id"))
        .join(matched, Seq("event_id"), "left")
        .na.fill(0L, Seq("n_windows"))
        .orderBy(col("event_id"))
    }),

    // ---- north-star: similarity search ----
    "similarity_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir),
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
        .select("query_id", "vec_id", "rank")),

    // ANN path: bucketed candidates, exact rerank, registered as the
    // HASH-VERIFIABLE recall audit (the listing's hash planes are not
    // SQL-expressible, but per-query result count and recall-vs-exact
    // claims are — the oracle recomputes the exact top-k and pins
    // n_results = k, recall_ge_floor = TRUE). Raw listing stays
    // spec-tested at the tighter floor. The signature index is prebuilt
    // once per corpus (IndexCache); the query only probes buckets.
    "similarity_ann_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      Similarity.annRecallAudit(
        Similarity.lshQuery(Similarity.IndexCache.lsh(emb), qids, k = 10),
        Similarity.bruteForceTopK(emb, qids, k = 10),
        k = 10, floor = 0.7)
    }),

    // IVF ANN: k-means coarse quantizer + multi-probe + exact rerank,
    // registered as the recall audit like the LSH twin. nprobe is high
    // (12/16) because THIS corpus is isotropic — labels are not
    // geometric clusters, so cell quantization carries little signal and
    // recall ≈ probe fraction; on clustered corpora nprobe=4 reaches the
    // same recall (spec-demonstrated on a synthetic clustered corpus).
    // Floor 0.6 per query: conservative under k-means sampling wobble at
    // whatever sf the driver runs (measured ≥0.8 per query at sf0.01).
    "similarity_ann_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      Similarity.annRecallAudit(
        Similarity.ivfQuery(
          Similarity.IndexCache.ivf(emb, nlist = 16), qids, k = 10,
          nprobe = 12),
        Similarity.bruteForceTopK(emb, qids, k = 10),
        k = 10, floor = 0.6)
    }),

    // deterministic-build IVF twin: coarse quantizer = oracle-replayable
    // integer Lloyd's (identical corpus => identical index bytes), float
    // probe+rerank unchanged; same in-plan recall-floor audit as the
    // float-trained build
    "similarity_ann_ivf_exact" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      Similarity.annRecallAudit(
        Similarity.ivfQuery(
          Similarity.IndexCache.ivfExact(emb, nlist = 16), qids, k = 10,
          nprobe = 12),
        Similarity.bruteForceTopK(emb, qids, k = 10),
        k = 10, floor = 0.6)
    }),

    // IVF-PQ (the FAISS billion-scale layout): exact-Lloyd coarse cells
    // restrict the scan, PQ codes rank candidates by ADC, float rerank
    // of the top-64 shortlist only; in-plan recall-floor audit vs the
    // exact top-k (the ann_ivf contract — booleans pinned by the oracle)
    "similarity_ann_ivfpq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      Similarity.annRecallAudit(
        Similarity.ivfPqQuery(emb, qids),
        Similarity.bruteForceTopK(emb, qids, k = 10),
        k = 10, floor = 0.6)
    }),

    // residual IVF-PQ (the FAISS default refinement): codes trained on
    // q − coarse_centroid(cell), per-(query, cell) ADC tables, integer
    // cell probing. On THIS isotropic corpus residual ≈ flat (cells
    // explain nothing — floor 0.5 with margin, min measured 0.6); the
    // refinement's win is proven on the clustered-corpus spec
    // (SimilaritySpec: 24 vs 15 hits at identical parameters)
    "similarity_ann_ivfpq_residual" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      Similarity.annRecallAudit(
        Similarity.ivfPqResidualQuery(emb, qids),
        Similarity.bruteForceTopK(emb, qids, k = 10),
        k = 10, floor = 0.5)
    }),

    // the SERVING path: external query vectors (request payloads, not
    // corpus members — here corpus embeddings re-badged under fresh ids)
    // against the cached IVF index via the same static-pruned probe the
    // streaming twin (StreamAnnServe) runs per micro-batch; in-plan
    // recall audit vs the exact external-vector top-k
    "similarity_ann_serve" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
      Similarity.annRecallAudit(
        Similarity.ivfQueryVectors(
          Similarity.IndexCache.ivfExact(emb, nlist = 16), queries,
          k = 10, nprobe = 12),
        Similarity.bruteForceTopKVectors(emb, queries, k = 10),
        k = 10, floor = 0.6)
    }),

    // the PQ serving path, now on the PERSISTED layout: external query
    // vectors against the ON-DISK IVF-PQ index (celled + codes
    // partitioned by cell, centroids, codebooks — write-if-absent via
    // persistedPqServeDir, reloaded through readIvfPqIndex) via the same
    // static-pruned, code-only-ADC probe production serving runs
    // (StreamAnnServe.servedPqWriter per micro-batch — kill/recover
    // spec-asserted on this exact layout in StreamAnnServeSpec); in-plan
    // recall audit vs the exact external-vector top-k. Queries are
    // corpus vectors re-badged under fresh ids, so the exact duplicate
    // must surface at rank 1 through the ADC shortlist — a quantization
    // regression shows up as a recall break, not just slower answers
    "similarity_ann_serve_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
      val (loaded, cents) =
        Sink.readIvfPqIndex(s, persistedPqServeDir(s, dir))
      Similarity.annRecallAudit(
        Similarity.ivfPqQueryVectors(loaded, cents, queries,
          nprobe = 12, rerank = 64, k = 10),
        Similarity.bruteForceTopKVectors(emb, queries, k = 10),
        k = 10, floor = 0.6)
    }),

    // the LSH serving path, completing the serving family (IVF, IVF-PQ,
    // LSH): external query vectors signed with the index's persisted
    // hyperplanes, multi-probed through the static combined-key bucket
    // predicate (StreamAnnServe.servedLshWriter per micro-batch);
    // in-plan recall audit vs the exact external-vector top-k
    "similarity_ann_serve_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
      Similarity.annRecallAudit(
        Similarity.lshQueryVectors(
          Similarity.lshIndexView(Similarity.IndexCache.lsh(emb)),
          queries, k = 10),
        Similarity.bruteForceTopKVectors(emb, queries, k = 10),
        k = 10, floor = 0.7)
    }),

    // the residual refinement's WIN, driver-proven: on a corpus with
    // strong cell structure (16 tight md5-derived clusters built
    // deterministically from the embeddings table — centers from md5
    // digits, original vectors shrunk to 5% as intra-cluster noise),
    // residual codes must out-recall flat codes at identical parameters
    // AND clear an absolute floor. The spec measures 24 vs 15 hits on
    // its own fixture; this registers the same claim on a driver-
    // replayable corpus so the hash match (both booleans TRUE) is the
    // machine-checked proof, not a commit message
    "similarity_ann_residual_clustered" -> ((s, dir) => {
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val clustered = clusteredEmbeddings(Tables.embeddings(s, dir))
      val exact = Similarity.bruteForceTopK(clustered, qids, k = 10)
        .select(col("query_id"), col("vec_id"))
      def hitCount(ann: org.apache.spark.sql.DataFrame, as: String) =
        ann.join(exact, Seq("query_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as(as))
      hitCount(Similarity.ivfPqQuery(clustered, qids,
          nprobe = 4, kCodes = 16, rerank = 16), "flat_hits")
        .crossJoin(hitCount(Similarity.ivfPqResidualQuery(clustered, qids,
          nprobe = 4, kCodes = 16, rerank = 16), "resid_hits"))
        .select(lit("clustered").as("corpus"),
          (col("resid_hits") > col("flat_hits")).as("residual_wins"),
          (col("resid_hits") >= 20L).as("residual_recall_ge_20"))
    }),

    // flat-PQ ADC top-k (Jégou TPAMI'11), integer-exact end to end:
    // lattice quantization → per-subspace integer Lloyd codebooks (md5
    // seeds, 2 rounds) → 8×4-bit codes → asymmetric-distance ranking
    // via broadcast per-probe lookup tables. The oracle replays
    // training, encoding, AND the ADC ranking bit for bit — a
    // hash-checked PQ pipeline, not just a recall floor
    "similarity_ann_pq" -> ((s, dir) =>
      Similarity.pqTopK(Tables.embeddings(s, dir))),

    // ---- north-star: multimodal columns ----
    // the DECODE pass (mapPartitions, codec-per-partition): on this
    // text-bytes corpus no codec applies, so every row surfaces NULL
    // dimensions + decoded=false — honest "the decoder did not run",
    // not the deterministic pseudo-dims earlier rounds fabricated (the
    // real-image branch — true pixels, decoded=true — is spec-proven on
    // generated PNGs in MultimodalSpec)
    "multimodal_metadata" -> ((s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.asMedia(Tables.documents(s, dir)))
        .toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("checksum"), col("width"), col("height"), col("n_frames"),
          col("decoded"))
        .orderBy(col("doc_id"))),

    "multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.asMedia(Tables.documents(s, dir)))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // header-only dims, driver-proven on REAL encoders: per doc < 40 a
    // genuine PNG/GIF/BMP (cycling by id % 3) is encoded via ImageIO at
    // dims planted from the id, and headerProbe recovers format + dims
    // from the CONTAINER HEADER alone — no pixel decode (the metadata
    // pass a 100 TB corpus can afford; a wrong parser, a wrong
    // endianness, or a fabricated fallback all break the hash match).
    // Torn-header and unknown-bytes nulls are spec-pinned
    "multimodal_header_probe" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 8 + (id % 8).toInt
          val fmt = (id % 3) match {
            case 0 => "png"; case 1 => "gif"; case _ => "bmp"
          }
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, baos)
          val bytes = baos.toByteArray
          Multimodal.MediaRow(id, s"image/$fmt", bytes.length.toLong, bytes)
        }
      }.toDF()
      Multimodal.headerProbe(media).toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("probed"))
        .orderBy(col("doc_id"))
    }),

    // aspect-fit resize plan: integer-exact target dims, no bytes
    // touched (the pixel stage is resize(), spec-tested on real PNGs).
    // Input dims are an EXPLICIT synthetic fixture (n_bytes-derived) —
    // they stand in for decodeFeatures output on a decodable corpus and
    // are labeled as fixture, not reported as measured metadata
    "multimodal_resize_plan" -> ((s, dir) => {
      val fixtureDims = Multimodal.asMedia(Tables.documents(s, dir))
        .select(col("doc_id"),
          ((col("n_bytes") % 640) + 1).cast("int").as("width"),
          (((col("n_bytes") * 7) % 480) + 1).cast("int").as("height"))
      Multimodal.resizePlan(fixtureDims)
        .select(col("doc_id"), col("width"), col("height"),
          col("target_w"), col("target_h"))
        .orderBy(col("doc_id"))
    }),

    // VIDEO near-dup by frame-hash-set Jaccard, driver-proven on planted
    // re-cut clips: per doc, clip A = 8 fixed 32-char text chunks packed
    // as container frames, clip B = the same clip with the last frame
    // dropped (a re-cut) — the container walk, per-frame hashing, minhash
    // LSH candidate generation, and exact sorted-merge Jaccard verify all
    // run for real; text frames take the md5-stub branch so DuckDB
    // replays the identical frame hashes and the exact pair set + ppm
    // values hash-match (the REAL-pixel path — dHash per decodable
    // keyframe, brightness-invariant across a re-encode — is spec-proven
    // on generated PNG containers, same split as multimodal_phash_pairs)
    "multimodal_videohash_pairs" -> ((s, dir) =>
      Multimodal.videoNearDupPairs(videoClipsFixture(s, dir),
          minJaccardPpm = 700000L, k = 32, bands = 16, rowsPerBand = 2)
        .orderBy(col("doc_a"), col("doc_b"))),

    // REAL audio near-dup, driver-proven: per-doc 8-note melodies
    // synthesized as PCM WAV (Multimodal.fixtureMelody: notes at the
    // EXACT Goertzel band centers selected by doc_id's base-4 digits —
    // injective over id < 64, any two distinct ids differ in ≥2 notes
    // that jump between band centers, and MultimodalSpec asserts all
    // fixture melodies sit pairwise beyond the Hamming≤3 banding
    // radius). Twin = the SAME material at exactly half gain: halving
    // is a power-of-two scale, every Goertzel intermediate scales
    // exactly, and the twin's 64 bits are IDENTICAL (hamming 0, pinned
    // by the oracle). The planted pairs are the ONLY output — the
    // oracle is the literal planted-pair list: a broken decoder,
    // fingerprint, or banding produces extra/missing rows and a hash
    // mismatch. (Round 10's fixture drew 40 ids from a 25-id two-digit
    // base-5 space — ids 25–39 duplicated 0–14's melodies exactly and
    // 150 Hz steps left near-collisions inside the banding radius.)
    "multimodal_audiohash_pairs" -> ((s, dir) =>
      Multimodal.audioNearDupPairs(audioClipsFixture(s, dir), maxDist = 3)
        .orderBy(col("doc_a"), col("doc_b"))),

    // the UNIFIED media-duplicate surface: image dHash pairs, video
    // frame-set Jaccard pairs, and audio fingerprint pairs — each from
    // the SAME fixture its per-modality query audits — union into one
    // graph (nodes namespaced clip_id*4 + modality code) and connected
    // components label every media item with its duplicate cluster:
    // the dedup_clusters shape applied to multimodal, what a pipeline
    // user actually consumes ("give me media dup clusters", not three
    // pair lists). Modality namespaces are disjoint, so clusters never
    // leak across modalities; singletons carry their own node id
    "multimodal_dup_clusters" -> ((s, dir) => {
      val img = Multimodal
        .imageNearDupPairs(phashMediaFixture(s, dir), maxDist = 3)
        .select((col("doc_a") * 4).as("src"), (col("doc_b") * 4).as("dst"))
      val vid = Multimodal.videoNearDupPairs(videoClipsFixture(s, dir),
          minJaccardPpm = 700000L, k = 32, bands = 16, rowsPerBand = 2)
        .select((col("doc_a") * 4 + 1).as("src"),
          (col("doc_b") * 4 + 1).as("dst"))
      val aud = Multimodal
        .audioNearDupPairs(audioClipsFixture(s, dir), maxDist = 3)
        .select((col("doc_a") * 4 + 2).as("src"),
          (col("doc_b") * 4 + 2).as("dst"))
      val edges = img.unionByName(vid).unionByName(aud)
      val nodes = phashMediaFixture(s, dir)
        .select((col("doc_id") * 4).as("node"))
        .unionByName(videoClipsFixture(s, dir)
          .select((col("doc_id") * 4 + 1).as("node")))
        .unionByName(audioClipsFixture(s, dir)
          .select((col("doc_id") * 4 + 2).as("node")))
      graft.operators.Graph.componentsFor(nodes, "node", edges)
        .select(expr("node div 4").as("doc_id"),
          when(col("node") % 4 === 0, "image")
            .when(col("node") % 4 === 1, "video")
            .otherwise("audio").as("modality"),
          col("component").as("cluster_id"))
        .orderBy(col("modality"), col("doc_id"))
    }),

    // the pipeline owner's FINAL dup question, per DOCUMENT: "is doc X
    // a duplicate of doc Y in ANY modality, and by which evidence?" —
    // the three modality pair sets roll up to doc level (clip ids strip
    // their +100000 re-encode namespace), connected components run ONCE
    // over the unioned doc edges, and each evidenced doc reports its
    // cluster plus the sorted modality list backing the verdict. Docs
    // whose only evidence is a self-pair (the re-encoded twin of the
    // SAME doc — video re-cuts, audio re-gains) are their own cluster:
    // dup-of-itself is evidence about re-encodes, not cross-doc
    // duplication. Only evidenced docs appear — the unevidenced corpus
    // would add rows, not information
    "multimodal_doc_dup_rollup" -> ((s, dir) => {
      val img = Multimodal
        .imageNearDupPairs(phashMediaFixture(s, dir), maxDist = 3)
        .select(col("doc_a").as("a"), col("doc_b").as("b"),
          lit("image").as("modality"))
      val vid = Multimodal.videoNearDupPairs(videoClipsFixture(s, dir),
          minJaccardPpm = 700000L, k = 32, bands = 16, rowsPerBand = 2)
        .select((col("doc_a") % 100000L).as("a"),
          (col("doc_b") % 100000L).as("b"), lit("video").as("modality"))
      val aud = Multimodal
        .audioNearDupPairs(audioClipsFixture(s, dir), maxDist = 3)
        .select((col("doc_a") % 100000L).as("a"),
          (col("doc_b") % 100000L).as("b"), lit("audio").as("modality"))
      val evidence = img.unionByName(vid).unionByName(aud)
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"), col("modality"))
        .localCheckpoint(true) // one pair computation feeds CC AND audit
      val edges = evidence.filter(col("u") =!= col("v"))
        .select(col("u").as("src"), col("v").as("dst"))
      val nodes = evidence.select(col("u").as("node"))
        .unionByName(evidence.select(col("v").as("node")))
        .distinct()
      val mods = evidence
        .select(explode(array(col("u"), col("v"))).as("node"),
          col("modality"))
        .distinct()
        .groupBy(col("node"))
        .agg(array_join(array_sort(collect_set(col("modality"))), ",")
          .as("modalities"))
      graft.operators.Graph.componentsFor(nodes, "node", edges)
        .join(mods, "node")
        .select(col("node").as("doc_id"),
          col("component").as("cluster_id"), col("modalities"))
        .orderBy(col("doc_id"))
    }),

    // ---- north-star: dataset assembly (training-data pipeline) ----
    // deterministic N-way split: md5-bucket per id, stable across runs,
    // partitionings, and engines; narrow map — zero shuffle
    "assembly_hash_split" -> ((s, dir) =>
      Assembly.hashSplit(Tables.documents(s, dir), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))),

    // exact per-stratum sampling: floor(|stratum|/5) rows per lang chosen
    // by hash order; keep-decision in pure integer arithmetic
    "assembly_stratified_sample" -> ((s, dir) =>
      Assembly.stratifiedSample(Tables.documents(s, dir), "lang", "doc_id",
          num = 1, den = 5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // weighted multi-source mixing: per-source deterministic keep rates
    "assembly_weighted_mix" -> ((s, dir) =>
      Assembly.weightedMix(Tables.documents(s, dir), "source", "doc_id",
          rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.5),
          defaultRate = 0.25)
        .select(col("source"), col("doc_id"))
        .orderBy(col("doc_id"))),

    // temperature-controlled mixing (alpha sampling): keep rates derive
    // from per-source counts via n^(1/T) reweighting at a 0.5 budget
    "assembly_temperature_mix" -> ((s, dir) =>
      Assembly.temperatureMix(Tables.documents(s, dir), "source", "doc_id",
          temperature = 2.0, targetFraction = 0.5)
        .select(col("source"), col("doc_id"))
        .orderBy(col("doc_id"))),

    // balanced-shard manifest: hash positions cut into 100-doc shards,
    // one audit row per shard (docs, payload, id range)
    "assembly_shard_manifest" -> ((s, dir) =>
      Assembly.shardManifest(Tables.documents(s, dir), "doc_id",
        docsPerShard = 100, sizeCol = "n_chars")),

    // deterministic global shuffle: dense position 0..n-1 in hash order
    // (range-partitioned sort + offset enumeration — fully distributed)
    "assembly_global_shuffle" -> ((s, dir) =>
      Assembly.globalShuffle(Tables.documents(s, dir), "doc_id")
        .select(col("pos"), col("doc_id"))
        .orderBy(col("pos"))),

    // upsampling mix: rate 2.5 = 2 guaranteed copies + hash-selected
    // half get a third ("train this source for 2.5 epochs")
    "assembly_mix_epochs" -> ((s, dir) =>
      Assembly.weightedMixEpochs(Tables.documents(s, dir), "source", "doc_id",
          rates = Map("src0" -> 2.5, "src1" -> 1.0), defaultRate = 0.25)
        .select(col("source"), col("doc_id"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))),

    // term-level corpus drift between two snapshots (md5 halves stand in
    // for yesterday/today): top-50 tokens by |rate shift| on the integer
    // ppm lattice — the monitoring companion to corpus_diff
    "corpus_vocab_drift" -> ((s, dir) => {
      val halves = Seq("a" -> 0.5, "b" -> 0.5)
      val withSplit = Tables.documents(s, dir).withColumn("split",
        Assembly.splitExpr(col("doc_id"), halves, "vocab"))
      graft.operators.Snapshot.vocabDrift(
        withSplit.filter(col("split") === "a"),
        withSplit.filter(col("split") === "b"))
    }),

    // composed curation pipeline: quality filter -> exact dedup ->
    // deterministic split; one shuffle over the surviving fraction
    "pipeline_curate" -> ((s, dir) =>
      graft.operators.Curation.curate(Tables.documents(s, dir))
        .orderBy(col("doc_id"))),

    // the full corpus-BUILD census: input -> quality -> URL dedup ->
    // exact dedup -> per-source cap -> splits, one survivor count per
    // stage — each stage an already-oracled operator; the whole funnel
    // is ONE lazy plan
    "pipeline_build_report" -> ((s, dir) =>
      graft.operators.Curation.buildReport(
        Tables.documents(s, dir), derivedUrl, maxPerSource = 5)),

    // decontamination pass: corpus docs whose word-5-gram overlap with
    // the benchmark set (doc_id % 20 == 0 stand-in) stays under 0.5 —
    // the APPLY side of text_contamination, survivors carry the ratio
    "pipeline_decontaminate" -> ((s, dir) =>
      graft.operators.Curation.decontaminate(
        Tables.documents(s, dir), isBenchmark = col("doc_id") % 20 === 0)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("contamination_ratio"))
        .orderBy(col("doc_id"))),

    // interval join (batch twin of the watermarked stream-stream join):
    // purchases within 30 min after each click, per user — equi-join on
    // the key, time window as inline post-filter, µs-long arithmetic
    "q_follow_within" -> ((s, dir) =>
      graft.streaming.StreamJoin
        .followWithinBatch(Tables.events(s, dir), "click", "purchase", 30)
        .orderBy(col("first_id"), col("second_id"))),

    // groupwise-min (TPC-H Q2 shape): min-cost supplier per part via a
    // single struct-min aggregation pass (decorrelated argmin)
    "q_min_cost_supplier" -> ((s, dir) =>
      Analytics.minCostSupplier(Tables.lineitem(s, dir),
        Tables.part(s, dir), Tables.supplier(s, dir))),

    // EXCEPT: customers active in 1995 but gone in 1996 (distinct
    // left-anti plan, pre-aggregated key sets)
    "q_lapsed_customers" -> ((s, dir) =>
      Analytics.lapsedCustomers(Tables.orders(s, dir), 1995, 1996)),

    // built-in session_window twin of the custom sessionizer (STRICT gap:
    // an event exactly gap after the last starts a NEW session — Spark's
    // [start, last+gap) window semantics; the oracle uses >= breaks)
    "q_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("max_ts"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("max_ts")).as("session_end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start_us"))),

    // per-vector symmetric int8 quantization (the 4× ANN-index
    // compression pass) — bit-exact vs the DuckDB oracle. The vector is
    // JSON-serialized for the compare: the oracle harness hashes scalar
    // cells, and both engines print int arrays compactly ([1,-2,...])
    "embedding_quantize" -> ((s, dir) =>
      Similarity.quantizeInt8(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("scale"),
          to_json(col("qvec")).as("qvec_json"))
        .orderBy(col("vec_id"))),

    // batch occupancy-drift audit (training-serving skew): cells trained
    // on the md5 train half only, both halves assigned in one scan,
    // per-cell occupancy side by side — integer-exact, the oracle twin
    // of the streaming drift monitor
    "embedding_occupancy_drift" -> ((s, dir) =>
      Clustering.occupancyDrift(Tables.embeddings(s, dir))),

    // the PERSISTED index's drift-and-retrain valve, driver-proven end
    // to end: build + persist an exact-Lloyd IVF index, stream in a
    // pathologically skewed ADD batch (500 clones of one vector — every
    // one lands in a single cell, the balance failure mode), read the
    // occupancy-drift census off disk, fire rebuildIvfIndex past its
    // threshold, and pin the lifecycle claims as oracle booleans:
    // drift detected, rebuild fired, post-rebuild drift exactly zero,
    // and exhaustive-probe answers bit-identical across the rebuild
    // (a rebuild relocates rows, never changes them)
    "embedding_index_drift_rebuild" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_drift_${new java.io.File(dir).getName}").toString
      val idx = Similarity.buildIvfIndexExact(emb, nlist = 16, iters = 2)
      Sink.writeIvfIndex(idx, path)
      idx.unpersist()
      val skew = emb.filter(col("vec_id") === 0L)
        .select(col("embedding"))
        .crossJoin(s.range(1000000L, 1000500L).toDF("vec_id"))
        .select(col("vec_id"), col("embedding"))
      Sink.appendIvfIndex(s, path, skew, batchId = 0L)
      val queries = emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 2000000L).as("query_id"), col("embedding"))
      def exhaustive() = Similarity.ivfQueryVectors(
        Sink.readIvfIndex(s, path), queries, k = 10, nprobe = 16)
      val before = exhaustive().localCheckpoint(true)
      val (rebuilt, maxPpm) =
        Sink.rebuildIvfIndex(s, path, nlist = 16, thresholdPpm = 200000L)
      val after = exhaustive().localCheckpoint(true)
      // ONE census read answers both post-rebuild probes (r17): the
      // drift max AND the live row count (Σ n_now ≡ celled.count —
      // the census's live side IS the masked celled view), replacing
      // a second full readIvfIndex + count pass; the before/after
      // parity triple (matched, |before|, |after|) similarly folds
      // into ONE full-outer-join aggregate over the two checkpointed
      // top-k tables. Same booleans, same output row — fewer jobs.
      val postRow = Sink.ivfOccupancyDrift(s, path)
        .agg(max(col("growth_ppm")), sum(col("n_now"))).head
      val (postMax, nTotal) = (postRow.getLong(0), postRow.getLong(1))
      val parity = before.withColumn("b", lit(1))
        .join(after.withColumn("a", lit(1)),
          Seq("query_id", "vec_id", "cosine", "rank"), "full_outer")
        .agg(count(col("b")), count(col("a")),
          count(when(col("b").isNotNull && col("a").isNotNull, lit(1))))
        .head
      val (nBefore, nAfter, matched) =
        (parity.getLong(0), parity.getLong(1), parity.getLong(2))
      import s.implicits._
      Seq((nTotal, maxPpm >= 200000L, rebuilt, postMax == 0L,
          matched == nBefore && nAfter == nBefore))
        .toDF("n_total", "drift_exceeded", "rebuilt",
          "post_drift_zero", "query_parity")
    }),

    // the IVF-PQ lifecycle valve, driver-proven end to end (the PQ twin
    // of embedding_index_drift_rebuild): persist an IVF-PQ index on a
    // 500-vector slice, skewed CODED ingest (appendIvfIndex encodes with
    // the persisted codebooks), drift census off disk, rebuildIvfPqIndex
    // past threshold retrains coarse quantizer AND codebooks, re-encodes
    // from the corpus, and commits a gen-N generation — pins: drift
    // detected, rebuild fired, post-rebuild drift zero, and
    // exhaustive-probe FULL-RERANK answers bit-identical across the
    // rebuild (codes and ADC order change with the codebooks; the exact
    // cosine rerank over the full candidate set must not)
    "embedding_pq_drift_rebuild" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_pqdrift_${new java.io.File(dir).getName}").toString
      val idx = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
      val model = Similarity.buildPqModel(emb, m = 8, k = 16, iters = 1)
      Sink.writeIvfPqIndex(idx, model.cents, model.codes, path)
      idx.unpersist(); model.unpersist()
      val skew = emb.filter(col("vec_id") === 0L)
        .select(col("embedding"))
        .crossJoin(s.range(1000000L, 1000300L).toDF("vec_id"))
        .select(col("vec_id"), col("embedding"))
      Sink.appendIvfIndex(s, path, skew, batchId = 0L)
      val queries = emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 2000000L).as("query_id"), col("embedding"))
      def exhaustive() = {
        val (loaded, cents) = Sink.readIvfPqIndex(s, path)
        Similarity.ivfPqQueryVectors(loaded, cents, queries,
          nprobe = 8, rerank = 1000000, k = 10)
      }
      val before = exhaustive().localCheckpoint(true)
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .unionByName(skew)
      val (rebuilt, maxPpm) = Sink.rebuildIvfPqIndex(s, path, corpus,
        nlist = 8, m = 8, k = 16, thresholdPpm = 200000L,
        iters = 2, pqIters = 1)
      val after = exhaustive().localCheckpoint(true)
      // fused post-rebuild probes + parity triple — see
      // embedding_index_drift_rebuild (r17): same values, fewer passes
      val postRow = Sink.ivfOccupancyDrift(s, path)
        .agg(max(col("growth_ppm")), sum(col("n_now"))).head
      val (postMax, nTotal) = (postRow.getLong(0), postRow.getLong(1))
      val parity = before.withColumn("b", lit(1))
        .join(after.withColumn("a", lit(1)),
          Seq("query_id", "vec_id", "cosine", "rank"), "full_outer")
        .agg(count(col("b")), count(col("a")),
          count(when(col("b").isNotNull && col("a").isNotNull, lit(1))))
        .head
      val (nBefore, nAfter, matched) =
        (parity.getLong(0), parity.getLong(1), parity.getLong(2))
      import s.implicits._
      Seq((nTotal, maxPpm >= 200000L, rebuilt, postMax == 0L,
          matched == nBefore && nAfter == nBefore))
        .toDF("n_total", "drift_exceeded", "rebuilt",
          "post_drift_zero", "query_parity")
    }),

    // the LSH bucket-balance census, driver-proven: persist an SRP-LSH
    // index on the same 500-vector slice, skew-ingest 300 clones of one
    // vector (clones share ALL the source's band buckets — SRP skew is
    // intrinsic to data concentration, which is why the census, not a
    // hyperplane resample, is the LSH health valve), read the drift
    // census off disk and pin: exactly `bands` (band, bucket) entries
    // grew, growth clears the floor, and compaction folds the ingested
    // postings back WITHOUT changing the census (live counts and build
    // baseline both survive the swap)
    "embedding_lsh_bucket_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_lshdrift_${new java.io.File(dir).getName}").toString
      // 8 bands × 16 buckets: half the directory churn of the default
      // 16-band layout — the lifecycle proof is band-count-invariant
      // and the write/append/compact passes each touch every directory
      val idx = Similarity.buildLshIndex(emb, nBits = 32, bands = 8)
      Sink.writeLshIndex(idx, path)
      idx.unpersist()
      val skew = emb.filter(col("vec_id") === 0L)
        .select(col("embedding"))
        .crossJoin(s.range(1000000L, 1000300L).toDF("vec_id"))
        .select(col("vec_id"), col("embedding"))
      Sink.appendLshIndex(s, path, skew, batchId = 0L)
      val drift = Sink.lshOccupancyDrift(s, path).localCheckpoint(true)
      // fused probes (r17): nGrown + maxGrow in ONE aggregate over the
      // pinned census, and the across-compaction stability triple
      // (matched, |drift|, |drift2|) in ONE full-outer-join aggregate —
      // identical booleans, three fewer count passes
      val gRow = drift.agg(
        count(when(col("growth_ppm") > 0L, lit(1))),
        max(col("growth_ppm"))).head
      val (nGrown, maxGrow) = (gRow.getLong(0), gRow.getLong(1))
      Sink.compactLshIndex(s, path)
      val drift2 = Sink.lshOccupancyDrift(s, path)
      val sRow = drift.withColumn("l", lit(1))
        .join(drift2.withColumn("r", lit(1)),
          Seq("band", "bucket", "n_build", "n_now", "growth_ppm"),
          "full_outer")
        .agg(count(col("l")), count(col("r")),
          count(when(col("l").isNotNull && col("r").isNotNull, lit(1))))
        .head
      val (nRows, nRows2, nStable) =
        (sRow.getLong(0), sRow.getLong(1), sRow.getLong(2))
      import s.implicits._
      Seq((nGrown, nGrown == 8L, maxGrow >= 500000L,
          nStable == nRows && nRows2 == nRows))
        .toDF("n_buckets_grown", "grown_eq_bands", "growth_exceeds",
          "census_stable_across_compaction")
    }),

    // the TEXT-index bucket-balance census, driver-proven — completes
    // the maintenance-census symmetry across all four index families
    // (IVF/IVF-PQ occupancy → gated rebuild, LSH bucket balance, text
    // bucket balance → compaction + bucket-count-at-rebuild): persist a
    // 16-bucket inverted index, skew-ingest 300 single-token docs
    // (every posting hashes to ONE bucket — token skew is intrinsic to
    // the data, exactly the SRP argument), read the drift census off
    // disk and pin: exactly one bucket grew, by exactly the 300
    // ingested postings, and compaction folds the ingested layout back
    // WITHOUT changing the census (the build baseline rides into the
    // committed generation)
    "text_index_bucket_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"))
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_textdrift_${new java.io.File(dir).getName}").toString
      Sink.writeTextIndex(docs, path, buckets = 16)
      val skew = s.range(2000000L, 2000300L).toDF("doc_id")
        .withColumn("text", lit("graftdriftterm"))
      Sink.appendTextIndex(s, path, skew, batchId = 0L)
      val drift = Sink.textOccupancyDrift(s, path).localCheckpoint(true)
      // fused probes (r17): three aggregates over the pinned census in
      // ONE job, and the across-compaction stability triple in ONE
      // full-outer-join aggregate — identical values, four fewer passes
      val gRow = drift.agg(
        count(when(col("growth_ppm") > 0L, lit(1))),
        coalesce(sum(when(col("growth_ppm") > 0L,
          col("n_now") - col("n_build"))), lit(0L)),
        coalesce(sum(col("n_build")), lit(0L))).head
      val (nGrown, grownPostings, basePostings) =
        (gRow.getLong(0), gRow.getLong(1), gRow.getLong(2))
      Sink.compactTextIndex(s, path)
      val drift2 = Sink.textOccupancyDrift(s, path)
      val sRow = drift.withColumn("l", lit(1))
        .join(drift2.withColumn("r", lit(1)),
          Seq("bucket", "n_build", "n_now", "growth_ppm"), "full_outer")
        .agg(count(col("l")), count(col("r")),
          count(when(col("l").isNotNull && col("r").isNotNull, lit(1))))
        .head
      val (nRows, nRows2, nStable) =
        (sRow.getLong(0), sRow.getLong(1), sRow.getLong(2))
      import s.implicits._
      Seq((basePostings, nGrown, nGrown == 1L, grownPostings,
          nStable == nRows && nRows2 == nRows))
        .toDF("base_postings", "n_buckets_grown", "grown_is_one",
          "grown_postings", "census_stable_across_compaction")
    }),

    // cluster-vs-label agreement audit: contingency of learned cells
    // against the label column (+ per-cell majority flag) — the "do my
    // learned cells mean anything" encoder check, all integer-exact
    "embedding_cluster_purity" -> ((s, dir) =>
      Clustering.clusterLabelProfile(Tables.embeddings(s, dir))),

    // oracle-replayable distributed k-means: integer-quantized Lloyd's
    // (md5-pinned seeds, exact long arithmetic, ties → lowest cluster),
    // per-cluster n/inertia/centroid-checksum hash-matched against a
    // DuckDB replay of the identical 3 iterations. One scan per
    // iteration, k×64-long driver state — the Spark-ML-KMeans structure
    // with an audit-grade deterministic twist
    "embedding_kmeans" -> ((s, dir) =>
      Clustering.kmeansSummary(s, Tables.embeddings(s, dir))),

    // leave-one-out kNN majority-vote label audit over a pinned probe
    // sample: exact integer L2 on the quantization lattice, (dist,
    // vec_id) and (votes desc, label) tie-breaks make neighbor sets and
    // votes replayable — "are labels consistent with embedding space"
    "embedding_knn_label" -> ((s, dir) =>
      Similarity.knnLabelAudit(Tables.embeddings(s, dir))),

    // cluster-coverage diversity sample: equal per-cell quotas from the
    // replayable Lloyd cells, pinned (md5, id) picks; two-phase bounded
    // heap before the quota window (capPerSource's scale shape)
    "curation_diverse_sample" -> ((s, dir) =>
      Clustering.diverseSample(Tables.embeddings(s, dir))),

    // perceptual-hash media near-dup pairs through the banded-Hamming
    // engine. The corpus has no exact-dup docs, so duplicate media are
    // PLANTED deterministically (decade-shared synthetic content on
    // doc_id % 10 ∈ {6,7} — derived identically by the oracle, the
    // derivedUrl idiom); stub hashes are md5-derived, so pairs ≡ planted
    // exact dups at hamming 0 and the whole pipeline hash-checks. The
    // REAL-pixel dHash branch is spec-verified on generated PNGs
    // (MultimodalSpec).
    "multimodal_phash_pairs" -> ((s, dir) =>
      Multimodal.imageNearDupPairs(phashMediaFixture(s, dir), maxDist = 3)
        .orderBy(col("doc_a"), col("doc_b"))),

    // OHLC candlestick downsampling (TimescaleDB first/last parity):
    // one agg pass, struct-argmin open / struct-argmax close
    "q_ohlc" -> ((s, dir) =>
      Analytics.ohlcBuckets(Tables.events(s, dir))),

    // time_bucket_gapfill + locf parity: dense hourly axis, zero-filled
    // counts, last-observation-carried-forward averages
    "q_gapfill_locf" -> ((s, dir) =>
      Analytics.gapFillLocf(Tables.events(s, dir))),

    // equi-width histogram: broadcast 1-row bounds + one grouped count
    "q_value_histogram" -> ((s, dir) =>
      Analytics.valueHistogram(Tables.events(s, dir))),

    // TPC-H Q19 shape: disjunctive join predicates (OR of conjunctions)
    // over a broadcast equi-join
    "q_brand_revenue" -> ((s, dir) =>
      Analytics.brandRevenue(Tables.lineitem(s, dir), Tables.part(s, dir))),

    // ordered first-touch funnel: per stage a filtered scan + user-keyed
    // agg + shrinking user-frontier join (no per-user event sorting)
    "q_funnel" -> ((s, dir) =>
      Behavior.funnel(Tables.events(s, dir))),

    // cohort retention triangle on the integer day lattice — one distinct
    // (user, day) set reused for cohort assignment and activity cells
    "q_cohort_retention" -> ((s, dir) =>
      Behavior.cohortRetention(Tables.events(s, dir))),

    // robust anomaly audit: lower-median + MAD per event_type on the exact
    // cents lattice (histogram-walk medians — value-lattice windows, never
    // a corpus sort), outliers at |v − med| > 3·MAD
    "q_anomaly_mad" -> ((s, dir) =>
      Behavior.madOutliers(Tables.events(s, dir))),

    // linear multi-touch attribution on the integer ppm lattice: each
    // purchase splits 1e6 credit equally across the user's view/click
    // touches inside the prior 24 h — registered on the BUCKETED
    // (user, ⌊ts/window⌋)-keyed interval join (the dense-user scale
    // path), whose hash equals the user-keyed variant's by construction;
    // the oracle replays the plain user-keyed form, so the match is the
    // driver-proof the bucketing is answer-invariant
    "q_attribution" -> ((s, dir) =>
      Behavior.linearAttribution(Tables.events(s, dir), bucketed = true)),

    // dyadic-weight EWMA trend per event type on the hourly cents
    // lattice — the deterministic integer twin of exp-decay smoothing
    // (lag fan-out over the BUCKET table, never a raw-event window)
    "q_ewma" -> ((s, dir) =>
      Behavior.ewmaTrend(Tables.events(s, dir))),

    // k-anonymity / l-diversity release audit of the event log:
    // QI = (event_type, day, 10-unit value bucket), sensitive = user_id
    "audit_k_anonymity" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
        .withColumn("vb", expr(
          "cast(cast(value as decimal(18,2)) * 100 as long) div 1000"))
      graft.operators.Pii.kAnonymityAudit(e,
        Seq(col("event_type"), col("day_us"), col("vb")), col("user_id"))
    }),

    // HLL distinct-census lifecycle, driver-proven: per-(type, day)
    // sketches rolled up to per-type WITHOUT rescanning events must
    // estimate identically to a direct per-type sketch (register-max
    // merge is lossless) and land within 2% of exact — both shipped as
    // oracle-checked booleans next to the exact count itself
    "census_distinct_sketch" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
      val daily = graft.operators.Census.distinctSketch(
        e, "user_id", Seq("event_type", "day_us"))
      val rolled = graft.operators.Census.rollup(daily, Seq("event_type"))
        .withColumnRenamed("distinct_est", "rolled_est")
      val direct = graft.operators.Census.withEstimates(
          graft.operators.Census.distinctSketch(e, "user_id", Seq("event_type")))
        .select(col("event_type"), col("distinct_est").as("direct_est"))
      val exact = e.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      rolled.join(direct, "event_type").join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          (col("rolled_est") === col("direct_est")).as("rollup_consistent"),
          (abs(col("direct_est") - col("exact_users")) * 100 <=
            col("exact_users") * 2).as("within_tolerance"))
        .orderBy(col("event_type"))
    }),

    // theta-sketch set algebra (custom TypedImperativeAggregate — the
    // intersection HLL cannot do): overlap of two value-thresholded
    // user sets in one scan per side + sketch math on a single crossed
    // row, NO key-set join. Exact mode at driver scale → every count
    // hash-matches the oracle's DISTINCT-join truth
    "census_overlap_theta" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      graft.operators.Census.overlap(
        e.filter(col("event_type") === "purchase" && col("value") > 150),
        e.filter(col("event_type") === "error" && col("value") > 150),
        "user_id")
    }),

    // the INCREMENTAL theta lifecycle, driver-proven: the census table is
    // built in two day-parity deltas (exactly how the streaming twin
    // folds micro-batches in — StreamCensus.thetaCensusWriter), merged
    // via theta_union_agg, and the overlap question is then answered
    // from the CENSUS ROWS ALONE (overlapFromCensus — the corpus is
    // never rescanned and the key sets never join). Exact mode end to
    // end, so every count hash-matches the oracle's DISTINCT-join truth
    // — a broken delta merge or a downsampling union breaks the hash
    "census_overlap_incremental" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("day", (unix_micros(date_trunc("day", col("ts")))
          / 86400000000L).cast("long"))
      def delta(parity: Int) = graft.operators.Census.thetaSketchTable(
        e.filter(pmod(col("day"), lit(2)) === parity),
        "user_id", Seq("event_type"))
      val census = graft.operators.Census.mergeThetaCensus(
        delta(0), delta(1), Seq("event_type"))
      graft.operators.Census.overlapFromCensus(
        census.filter(col("event_type") === "purchase"),
        census.filter(col("event_type") === "error"))
    }),

    // KLL quantile census (custom TypedImperativeAggregate — the
    // percentile member of the sketch family): per-(type, day) deltas
    // merged through the census fold, then p10/p50/p90/p99 answered
    // from census rows alone. The hash-matched spine is kll_n (exact
    // summed counter — proves the merge tree saw every row once); the
    // estimates are gated by the corpus-exact rank of each returned
    // quantile staying within 5pp of its target (k=400 ⇒ ~0.9% rank
    // error — boolean pinned TRUE by the oracle, FALSE ⇒ hash mismatch)
    "census_quantile_sketch" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("cents",
          expr("cast(cast(value as decimal(18,2)) * 100 as long)"))
        .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
      val daily = graft.operators.Census.quantileSketchTable(
        e, "cents", Seq("event_type", "day_us"), k = 400)
      val est = graft.operators.Census.quantilesFromCensus(
        daily, Seq("event_type"),
        Seq(100000L, 500000L, 900000L, 990000L), k = 400)
      e.select(col("event_type"), col("cents"))
        .join(broadcast(est), "event_type")
        .groupBy("event_type", "rank_ppm", "n", "quantile_est")
        .agg(sum(when(col("cents") <= col("quantile_est"), 1L)
          .otherwise(0L)).as("n_le"))
        .select(col("event_type"), col("rank_ppm"), col("n"),
          (abs(expr("n_le * 1000000 div n") - col("rank_ppm")) <= 50000L)
            .as("within_tol"))
        .orderBy("event_type", "rank_ppm")
    }),

    // distribution DRIFT from census rows alone: two-sample KS between
    // persisted KLL sketches (kll_ks — CDFs evaluated on the union
    // quantile grid), for a same-distribution pair (even vs odd days of
    // clicks) and a genuinely shifted pair (cents vs 2·cents+1000).
    // n_a/n_b hash-match exactly; the drift verdicts (KS > 20%) and the
    // |KS_sketch − KS_exact| ≤ 6pp tolerance are booleans the oracle
    // pins — the exact KS replayed via the identical cumulative
    // floor-div lattice in SQL
    "census_distribution_drift" -> ((s, dir) => {
      val clicks = Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .withColumn("cents",
          expr("cast(cast(value as decimal(18,2)) * 100 as long)"))
        .withColumn("day", (unix_micros(date_trunc("day", col("ts")))
          / 86400000000L).cast("long"))
      val shifted = clicks.withColumn("cents",
        col("cents") * 2L + 1000L)
      def sketchOf(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Census.quantileSketchTable(
          df, "cents", Seq("day"), k = 400)
      def pairRow(name: String, a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame) =
        graft.operators.Census.distributionDrift(
            sketchOf(a), sketchOf(b), k = 400)
          .crossJoin(graft.operators.Census.exactKs(a, b, "cents"))
          .select(lit(name).as("pair"), col("n_a"), col("n_b"),
            (col("ks_ppm") > 200000L).as("drift"),
            (abs(col("ks_ppm") - col("ks_exact_ppm")) <= 60000L)
              .as("within_tol"))
      pairRow("same",
          clicks.filter(pmod(col("day"), lit(2)) === 0),
          clicks.filter(pmod(col("day"), lit(2)) === 1))
        .unionByName(pairRow("shifted", clicks, shifted))
        .orderBy("pair")
    }),

    // heavy-hitter census in EXACT mode (freq sketch, counter algebra):
    // doc-parity deltas merged through the census fold, report = every
    // token with count ≥ 500 — map 1024 ≫ the 31-token vocabulary, so
    // max_error = 0 and every estimate IS the true count for any merge
    // order: token, freq, and the total stream length all hash-match
    // the oracle's exact GROUP BY, and the exact_mode witness is pinned
    "census_heavy_hitters_sketch" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(Tables.documents(s, dir))
      def delta(p: Int) = graft.operators.Census.freqSketchTable(
        toks.filter(pmod(col("doc_id"), lit(2)) === p),
        "token", Seq(), maxMapSize = 1024)
      val census = graft.operators.Census.mergeFreqCensus(
        delta(0), delta(1), Seq(), maxMapSize = 1024)
      graft.operators.Census.heavyHittersFromCensus(
          census, Seq(), threshold = 500L, maxMapSize = 1024)
        .select(col("item").as("token"), col("freq"), col("stream_len"),
          (col("max_error") === 0L).as("exact_mode"))
        .orderBy(desc("freq"), col("token"))
    }),

    // z-order physical design, driver-proven: the per-tile min-max box
    // census of the Morton layout over (user, cents) plus the parquet
    // min-max pruning verdict a point scan would make from footer stats
    // — the whole chain (min-max normalize, 8-bit buckets, 16-term bit
    // interleave, prefix tiles, skip decision) replayed bit-exactly by
    // the oracle's identical integer arithmetic
    "layout_zorder_census" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"),
        expr("cast(cast(value as decimal(18,2)) * 100 as long)").as("cents"))
      graft.operators.Layout.zorderSkippingCensus(e, Seq("user_id", "cents"),
        Map("user_id" -> 42L, "cents" -> 2500L))
    }),

    // the quantile normalizer's WIN on a heavy-tailed column, driver-
    // proven: cents³ (cubing the already-skewed value column makes
    // median/max ≈ 3·10⁻⁴, so min-max normalization crushes ~97% of rows
    // into the bottom tile strip and a median-point probe must scan
    // nearly everything) — the equi-depth (approx_percentile-cut) layout
    // must scan STRICTLY less and at most a quarter of the corpus for
    // the same probe. The min-max scan fraction is replayed bit-exactly
    // by the oracle's identical integer chain; the quantile-vs-minmax
    // verdicts are booleans the oracle pins TRUE (FALSE ⇒ hash mismatch)
    "layout_zorder_skewed" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"),
          expr("cast(cast(value as decimal(18,2)) * 100 as long)").as("cents"))
        .select(col("user_id"),
          (col("cents") * col("cents") * col("cents")).as("skewed"))
      val zcols = Seq("user_id", "skewed")
      val probes = Map("skewed" -> 40000000000L) // ≈ the median of cents³
      val mm = graft.operators.Layout.scanFractionPpm(
          graft.operators.Layout.zorderSkippingCensus(e, zcols, probes))
        .withColumnRenamed("scan_ppm", "minmax_scan_ppm")
      val qt = graft.operators.Layout.scanFractionPpm(
          graft.operators.Layout
            .zorderSkippingCensusQuantile(e, zcols, probes))
        .withColumnRenamed("scan_ppm", "qt_scan_ppm")
      mm.crossJoin(qt).select(col("minmax_scan_ppm"),
        (col("qt_scan_ppm") < col("minmax_scan_ppm"))
          .as("quantile_beats_minmax"),
        (col("qt_scan_ppm") <= 250000L).as("quantile_scan_le_quarter"))
    }),

    // ntile + percent_rank window pass, partitioned by nation (a global
    // ntile would single-task; partitioned quantiles scale)
    "q_customer_quartiles" -> ((s, dir) =>
      Analytics.customerSpendQuartiles(Tables.orders(s, dir),
        Tables.customer(s, dir))),

    // edit-distance fuzzy near-dup pairs, (lang, prefix)-blocked — the
    // typo/OCR-noise dedup family; both engines run the identical
    // Levenshtein on identical 40-char prefixes
    "dedup_edit_distance" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),

    // GROUP-level MinHash signatures via the native TypedImperativeAggregate
    // (minhash_agg): one signature per source, pairwise estimated Jaccard
    // between sources from signature agreement alone — the
    // combine-without-touching-members property. Registered as the
    // HASH-VERIFIABLE audit: the hash family is not SQL-expressible, but
    // the EXACT Jaccard of the source shingle-set unions is (the oracle
    // recomputes it from string shingles), so every pair carries the
    // exact value plus an estimate-error claim (|est − exact| ≤ 0.25 =
    // 4σ for k=64, σ = √(J(1−J)/64) ≤ 1/16) the oracle pins TRUE. A
    // broken signature merge now hash-mismatches; the union/merge
    // properties remain spec-verified too.
    "dedup_group_minhash" -> ((s, dir) => {
      val sh = Tables.documents(s, dir).select(col("source"),
        graft.functions.MinHash
          .word_shingle_hashes(Dedup.normText(col("text")), 3).as("sh"))
      val sigs = sh.groupBy(col("source"))
        .agg(graft.functions.MinHashAgg.minhash_agg(col("sh")).as("sig"))
      val a = sigs.select(col("source").as("source_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("source").as("source_b"), col("sig").as("sig_b"))
      // K² in the number of SOURCES (groups), not documents: one signature
      // row per source, so the cross join is |sources|² — a handful here,
      // broadcast-sized for thousands. The explicit broadcast hint pins the
      // plan to BroadcastNestedLoopJoin so the planner never shuffles the
      // signature side as sources grow. Do NOT reuse this shape for
      // per-document groups — that K² is the thing LSH banding exists to
      // avoid (Dedup.lshCandidates).
      val est = a.crossJoin(broadcast(b))
        .filter(col("source_a") < col("source_b"))
        .select(col("source_a"), col("source_b"),
          (aggregate(
            zip_with(col("sig_a"), col("sig_b"),
              (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / 64.0)
            .as("est_jaccard"))
      // EXACT union-set Jaccard, scalably: distinct (source, shingle)
      // rows self-join on the shingle hash — intersection sizes come from
      // one equi-join + count, never a crossJoin of the big shingle
      // arrays. Source pairs with empty intersection are restored by the
      // left join against the (tiny) source-pair frame.
      val srcSh = Tables.documents(s, dir)
        .select(col("source"),
          explode(graft.functions.MinHash
            .word_shingle_hashes(Dedup.normText(col("text")), 3)).as("h"))
        .distinct()
      val sizes = srcSh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val inter = srcSh.select(col("source").as("source_a"), col("h"))
        .join(srcSh.select(col("source").as("source_b"), col("h")), Seq("h"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      val exact = est.select(col("source_a"), col("source_b"))
        .join(inter, Seq("source_a", "source_b"), "left_outer")
        .na.fill(0L, Seq("n_inter"))
        .join(broadcast(sizes.select(col("source").as("source_a"),
          col("n").as("n_a"))), Seq("source_a"))
        .join(broadcast(sizes.select(col("source").as("source_b"),
          col("n").as("n_b"))), Seq("source_b"))
        .select(col("source_a"), col("source_b"),
          (col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
            .as("exact_jaccard"))
      est.join(exact, Seq("source_a", "source_b"))
        .select(col("source_a"), col("source_b"), col("exact_jaccard"),
          (abs(col("est_jaccard") - col("exact_jaccard")) <= 0.25)
            .as("est_within_bound"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // ---- round 5: curation-pipeline additions ----

    // greedy token-budget sequence packing per source (training-context
    // assembly); sequential-per-group by nature, so sources are the
    // parallel unit — oracle is the same greedy fold as a recursive CTE
    "assembly_pack_sequences" -> ((s, dir) =>
      Assembly.packSequences(Tables.documents(s, dir), tokenBudget = 256)
        .orderBy(col("source"), col("doc_id"))),

    // packing-efficiency audit: per-bin doc count / tokens used / budget
    // slack — the loader-utilization report; integer-exact vs the
    // oracle's replay of the same greedy fold
    "assembly_pack_efficiency" -> ((s, dir) =>
      Assembly.packEfficiency(Tables.documents(s, dir), tokenBudget = 256)),

    // context-window chunking: 50-word windows advancing by 40 (10-word
    // overlap); narrow tokenize+slice pipeline, chunk bodies stay in-row
    // (md5 fingerprint out)
    "assembly_chunk_windows" -> ((s, dir) =>
      Assembly.chunkWindows(Tables.documents(s, dir), window = 50, stride = 40)),

    // snapshot diff: old = drop doc_id%20==19 + ' v1' edit on %20==3,
    // new = drop doc_id%20==11 — so added/removed/changed/unchanged all
    // occur; fingerprints computed at the scan, full-outer on the key
    "corpus_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val prev = d.filter(col("doc_id") % 20 =!= 19)
        .withColumn("text",
          when(col("doc_id") % 20 === 3, concat(col("text"), lit(" v1")))
            .otherwise(col("text")))
      val cur = d.filter(col("doc_id") % 20 =!= 11)
      graft.operators.Snapshot.corpusDiff(prev, cur)
    }),

    // payment-card candidates + Luhn checksum as a pure HOF expression;
    // one derived card varies validity with doc_id, one is always valid
    "text_pii_cards" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val cardText = concat(
        col("text"), lit(" pay 4"),
        lpad(((col("doc_id") * 7919) % 1000000000000000L).cast("string"),
          15, "0"),
        lit(" or 4111111111111111"))
      graft.operators.Pii.cardAudit(d, cardText)
    }),

    // benchmark-contamination audit: distinct word-5-gram overlap of every
    // corpus doc against the benchmark set (doc_id % 20 == 0 stands in
    // for the eval suite); benchmark gram set broadcasts
    "text_contamination" -> ((s, dir) =>
      TextAnalysis.contamination(
        Tables.documents(s, dir), isBenchmark = col("doc_id") % 20 === 0)
        .orderBy(col("doc_id"))),

    // Gopher-style repetition metrics: top-bigram share + duplicate-
    // trigram share per doc, with the boilerplate flag (thresholds
    // tightened below the published 0.18/0.30 defaults so the synthetic
    // corpus exercises both branches of the flag)
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionMetrics(Tables.documents(s, dir),
        topBigramMax = 0.10, dupTrigramMax = 0.05)
        .orderBy(col("doc_id"))),

    // incremental-ingest dedup: the "new batch" (src10..src19, the
    // 5-char source names) anti-joined against the existing corpus
    // (src0..src9) by content key, then deduped within the batch
    "dedup_cross_corpus" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.crossCorpusNew(
        batch = docs.filter(length(col("source")) > 4),
        reference = docs.filter(length(col("source")) <= 4))
        .orderBy(col("doc_id"))
    }),

    // bloom-prefiltered twin of dedup_cross_corpus: identical survivors
    // (shared oracle = equivalence proof); the bloom clears most of the
    // batch in a narrow map so only suspects reach the exact anti-join
    "dedup_cross_corpus_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.crossCorpusNewBloom(
        batch = docs.filter(length(col("source")) > 4),
        reference = docs.filter(length(col("source")) <= 4),
        expectedItems = 1000L, fpp = 0.03)
        .orderBy(col("doc_id"))
    }),

    // boilerplate removal: drop 10-word chunks shared by >=2 docs and
    // re-assemble each doc from its surviving chunks (apply side of the
    // span-dedup detection pass)
    "dedup_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateRemoval(Tables.documents(s, dir), k = 10,
        maxDocs = 2)),

    // per-domain cap: keep the 20 largest docs per source — the
    // anti-over-representation guard on the training mix
    "curation_domain_cap" -> ((s, dir) =>
      Curation.capPerSource(Tables.documents(s, dir), maxPerSource = 20)
        .orderBy(col("source"), col("rank_in_source"))),

    // token-budget composition: per-source doc/token counts + cumulative
    // largest-first share — the table every mixing decision starts from
    "curation_token_budget" -> ((s, dir) =>
      Curation.tokenBudget(Tables.documents(s, dir))),

    // URL-level dedup: the corpus carries no URL column, so a
    // deterministically-messy URL is derived from driver data (case noise,
    // default port, trailing slash, utm_* params, fragment — each keyed on
    // doc_id residues) and canonicalize+dedup is oracle-checked end to end
    "curation_url_dedup" -> ((s, dir) =>
      graft.operators.Urls.urlDedup(Tables.documents(s, dir), derivedUrl)),

    // classifier threshold calibration: exact confusion counts + IEEE
    // precision/recall/F1 per candidate cut, label = n_chars >= 300
    "classifier_pr_curve" -> ((s, dir) =>
      TextAnalysis.classifierPrCurve(Tables.documents(s, dir),
        label = col("n_chars") >= 300L,
        thresholds = Seq(-300L, -200L, -100L, -50L, 0L, 50L, 100L, 200L, 300L))),

    // curriculum ordering: easiest-first (n_chars div 100 bands), shuffled
    // within band via the md5 determinism contract; rank via the
    // distributed zipWithIndex plan, oracle = sequential row_number
    "assembly_curriculum" -> ((s, dir) =>
      Assembly.curriculumOrder(Tables.documents(s, dir),
        difficulty = expr("n_chars div 100"))),

    // tokenizer-vocab coverage audit: per-doc OOV counts against the
    // top-20 corpus vocabulary (31 distinct tokens in the synthetic
    // corpus, so both covered and OOV tokens are exercised)
    "text_oov_rate" -> ((s, dir) =>
      TextAnalysis.oovAudit(Tables.documents(s, dir), vocabSize = 20)),

    // vocabulary-id encoding: every token -> its (freq desc, token) rank
    // id (OOV -> 0), positions preserved — the loader-handoff sequence
    "text_tokenize_ids" -> ((s, dir) =>
      TextAnalysis.tokenizeToIds(Tables.documents(s, dir), vocabSize = 20)),

    // split-leakage audit: near-dup pairs (t=0.6) crossing the
    // train/val/test boundary — split labels computed as pure id hashes
    // on the pair rows (no join), the eval-integrity gate
    "audit_split_leakage" -> ((s, dir) =>
      Curation.splitLeakage(Tables.documents(s, dir), threshold = 0.65)),

    // ---- round 6 (cont.): tokenizer training + importance selection ----

    // BPE merge training: 8 most-frequent-pair fusions learned from the
    // corpus word-frequency table — exact counts, (cnt desc, lhs, rhs)
    // tie-break, so the whole trajectory is deterministic. Registered on
    // the driver-local merge loop (one corpus pass, bit-identical to the
    // per-step Spark loop — TokenizerSpec asserts equality; the oracle
    // replays the same recurrence).
    "tokenizer_bpe_merges" -> ((s, dir) =>
      graft.operators.Tokenizer.bpeMergesLocal(Tables.documents(s, dir),
        steps = 8)),

    // encode side: the 8 learned merges folded into one narrow literal-
    // replace chain; per-doc subword counts + encoding fingerprint
    "tokenizer_bpe_encode" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val merges = graft.operators.Tokenizer.bpeMergesLocal(d, steps = 8)
        .select(col("lhs"), col("rhs")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      graft.operators.Tokenizer.bpeEncode(d, merges)
    }),

    // DSIR importance selection: hashed-bigram likelihood-ratio lattice
    // against the English slice as target; top-100 cut, full scored audit
    "curation_dsir" -> ((s, dir) =>
      Curation.dsirSelect(Tables.documents(s, dir),
        isTarget = col("lang") === "en", buckets = 1024, k = 100)),

    // ---- round 5 (cont.): quality / PII / span-dedup additions ----

    // Gopher-style quality rule set: per-rule flags + conjunction, all
    // pure column expressions in one scan (word-count band tightened to
    // the synthetic corpus's 8..100 so both branches are exercised)
    "text_quality_gopher" -> ((s, dir) =>
      graft.operators.TextAnalysis.gopherQuality(
        Tables.documents(s, dir), minWords = 20, maxWords = 80)
        .orderBy(col("doc_id"))),

    // hashed bag-of-words linear classifier: integer logit (md5-derived
    // feature weights), keep = logit > 0 — the model-based quality pass
    "text_classifier_score" -> ((s, dir) =>
      graft.operators.TextAnalysis.classifierScore(Tables.documents(s, dir))),

    // bigram LM perplexity-proxy score: integer-scaled MLE transition
    // weights trained on the corpus itself, per-doc mass + per-bigram avg
    "text_lm_score" -> ((s, dir) =>
      graft.operators.TextAnalysis.lmScore(Tables.documents(s, dir))),

    // CCNet-style per-language LM-score terciles (head/middle/tail):
    // lattice-cut boundaries over the lmScore histogram, bucket census
    "curation_ccnet_buckets" -> ((s, dir) =>
      Curation.ccnetBuckets(Tables.documents(s, dir))),

    // conjunctive tf-idf search: all three terms required, integer idf
    // lattice, deterministic (score desc, doc_id) top-20
    "text_search_topk" -> ((s, dir) =>
      graft.operators.TextAnalysis.searchTopK(
        Tables.documents(s, dir), Seq("vector", "hash", "merge"), k = 20)),

    // BM25 top-k over the PERSISTED inverted index — the standing
    // postings deployment searchTopK's scaladoc promises, now real:
    // bucket-partitioned postings with denormalized doc lengths
    // (write-if-absent, like the PQ serving index), static bucket IN
    // pruning, disjunctive Robertson BM25 on an exact integer lattice
    // (ppm idf × milli saturation/length-norm — every div replayed by
    // the oracle, see TextAnalysis.bm25QueryBatch). The streaming twin
    // (StreamTextServe.bm25Writer) runs the same probe per micro-batch
    "text_bm25_topk" -> ((s, dir) =>
      graft.operators.TextAnalysis.bm25TopK(
        Sink.readTextIndex(s, persistedTextIndexDir(s, dir)),
        Seq("vector", "hash", "merge"), k = 20)),

    // EXACT-PHRASE retrieval over the SAME persisted index — the
    // positional-postings payload at work: candidates from the
    // bucket-pruned term probe, adjacency by slot-shifted anchor
    // intersection (TextAnalysis.phraseTopK), ranked by occurrence
    // count. The oracle replays tokenization with positions and the
    // identical anchor logic over the raw text — a wrong position
    // array, a broken shift, or an off-by-one in the intersection all
    // break the hash
    "text_phrase_topk" -> ((s, dir) =>
      graft.operators.TextAnalysis.phraseTopK(
        Sink.readTextIndex(s, persistedTextIndexDir(s, dir)),
        Seq("table", "hash"), k = 20)),

    // PROXIMITY ranking over the same positional index — docs holding
    // ALL terms ranked by the minimal token window covering one
    // occurrence of each (the Lucene min-span signal between BM25's
    // bag-of-words and exact phrase): the classic one-pass min-window
    // as per-term running-max window functions over a per-DOC sort
    // (doc-length-bounded partitions, unlike a per-token window).
    // Oracle replays tokenize-with-positions + the identical
    // running-max/least recurrence
    "text_proximity_topk" -> ((s, dir) =>
      graft.operators.TextAnalysis.proximityTopK(
        Sink.readTextIndex(s, persistedTextIndexDir(s, dir)),
        Seq("vector", "hash", "merge"), k = 20)),

    // HYBRID retrieval via reciprocal-rank fusion — the standard
    // combiner every production search stack runs over its lexical and
    // semantic legs: BM25 top-50 from the persisted inverted index
    // fused with ANN top-50 from the PERSISTED IVF index (doc_id ≡
    // vec_id in this corpus) by Σ 1e6 div (60 + rank) on the ppm
    // lattice, union semantics, ties by doc_id. BOTH legs now run their
    // production shape: the lexical probe reads only its term buckets,
    // and the semantic leg probes 4 of 16 cells of the on-disk
    // exact-Lloyd index via the integer-lattice probe
    // (Similarity.ivfQueryVectorsIntProbe — cell selection in exact
    // integer arithmetic, so the ORACLE replays Lloyd's, the probe, and
    // the in-cell cosine order bit-exactly; HybridRetrievalSpec asserts
    // the celled scan is partition-pruned to the probed cells). The
    // fuse is a k-row full-outer join — it costs exactly its legs
    "retrieval_hybrid_rrf" -> ((s, dir) => {
      val lex = graft.operators.TextAnalysis.bm25QueryBatch(
        Sink.readTextIndex(s, persistedTextIndexDir(s, dir)),
        { import s.implicits._
          Seq((0L, Seq("vector", "hash", "merge")))
            .toDF("query_id", "terms") },
        k = 50)
        .select(col("doc_id"), col("rank"))
      // readIvfIndex, not readIvfPqIndex: the hybrid leg never touches
      // the PQ codebooks — skip their collect on the serve path
      val loaded = Sink.readIvfIndex(s, persistedPqServeDir(s, dir))
      val sem = Similarity.ivfQueryVectorsIntProbe(loaded,
          Tables.embeddings(s, dir).filter(col("vec_id") === 0)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 50, nprobe = 4)
        .select(col("vec_id").as("doc_id"), col("rank"))
      graft.operators.TextAnalysis.rrfFuse(lex, sem, kConst = 60L, k = 20)
    }),

    // hybrid retrieval in its SERVING form: a BATCH of requests, each
    // carrying both legs' inputs (terms + query embedding), answered by
    // rrfQueryBatch — ONE bucket-pruned BM25 probe for the batch's term
    // union, ONE cell-pruned integer-lattice ANN probe for the batch's
    // cell union, fused per (query_id, doc_id). The streaming twin
    // (StreamTextServe.hybridWriter) runs the same call per micro-batch
    // (batch-vs-stream parity spec-asserted). Oracle replays all three
    // requests' BM25 + Lloyd/probe/cosine legs and the per-query fusion
    "retrieval_hybrid_serve" -> ((s, dir) => {
      import s.implicits._
      val textIdx = Sink.readTextIndex(s, persistedTextIndexDir(s, dir))
      val annIdx = Sink.readIvfIndex(s, persistedPqServeDir(s, dir))
      val reqs = Seq(
        (0L, Seq("vector", "hash", "merge")),
        (1L, Seq("table", "hash")),
        (2L, Seq("merge", "vector"))).toDF("query_id", "terms")
        .join(Tables.embeddings(s, dir)
          .select(col("vec_id").as("query_id"), col("embedding")),
          "query_id")
      graft.operators.TextAnalysis.rrfQueryBatch(
        textIdx, annIdx, reqs, kConst = 60L, k = 20)
    }),

    // MULTI-LEG fusion — real stacks fuse more than two rank lists
    // (BM25 + a phrase boost + a proximity signal here, all three from
    // the SAME persisted positional index, all bucket-pruned): one
    // full-outer cascade on (query_id, doc_id) keeping per-leg ranks
    // (NOT a fold of 2-leg fuses, which would corrupt later legs'
    // contributions), Σ 1e6 div (60 + rank_i) over the union, n_legs
    // evidence column. Oracle replays all three rank lists + the
    // identical cascade
    "retrieval_hybrid_rrf3" -> ((s, dir) => {
      import s.implicits._
      val idx = Sink.readTextIndex(s, persistedTextIndexDir(s, dir))
      val lex = graft.operators.TextAnalysis.bm25QueryBatch(idx,
        Seq((0L, Seq("vector", "hash", "merge")))
          .toDF("query_id", "terms"), k = 50)
      val phr = graft.operators.TextAnalysis.phraseQueryBatch(idx,
        Seq((0L, Seq("table", "hash"))).toDF("query_id", "phrase"),
        k = 50)
      val prx = graft.operators.TextAnalysis.proximityQueryBatch(idx,
        Seq((0L, Seq("vector", "hash", "merge")))
          .toDF("query_id", "terms"), k = 50)
      graft.operators.TextAnalysis.rrfFuseAll(
        Seq(lex, phr, prx), kConst = 60L, k = 20)
    }),

    // snippet extraction in its SERVING form: a batch of term-set
    // requests through snippetQueryBatch — per (query, doc) the
    // lexicographic (len, start) argmin window, per-query top-k, ONE
    // winner-id push-down into the documents scan for the whole batch.
    // The streaming twin (StreamTextServe.snippetWriter) runs the same
    // call per micro-batch. Oracle replays both requests' recurrences,
    // argmins, and token-span slices
    "text_snippet_serve" -> ((s, dir) => {
      import s.implicits._
      val idx = Sink.readTextIndex(s, persistedTextIndexDir(s, dir))
      val reqs = Seq(
        (0L, Seq("vector", "hash", "merge")),
        (1L, Seq("table", "hash"))).toDF("query_id", "terms")
      graft.operators.TextAnalysis.snippetQueryBatch(
        idx, Tables.documents(s, dir), reqs, k = 20)
    }),

    // SNIPPET extraction: the k tightest docs' best covering window
    // (lexicographic (len, start) argmin — deterministic) plus the
    // actual token span sliced from the raw text — the highlight a
    // search UI renders; only the k winners' text is touched (broadcast
    // join into the corpus scan). Oracle replays argmin + slice
    "text_snippet_topk" -> ((s, dir) =>
      graft.operators.TextAnalysis.snippetTopK(
        Sink.readTextIndex(s, persistedTextIndexDir(s, dir)),
        Tables.documents(s, dir),
        Seq("vector", "hash", "merge"), k = 20)),

    // the text-index INGEST lifecycle, driver-proven: build on half the
    // corpus, ADD the other half in two batches (one of them REPLAYED —
    // the dynamic-overwrite exactly-once guard must absorb the
    // redelivery), query the incremental state, compact, query again.
    // The oracle replays BM25 over the FULL corpus with no knowledge of
    // the split: the hash match IS the proof that incremental state ≡
    // full rebuild (N/T sum across batches, df counts the union) and
    // that compaction changes nothing (stable_across_compaction per row)
    "text_bm25_incremental" -> ((s, dir) => {
      // 1000-doc slice + 16 buckets: the lifecycle proof (exactly-once
      // replay, rebuild-equivalence, compaction parity) is invariant in
      // both; the cost of this query is directory churn across its 4
      // index writes + compaction, so the small layout keeps the proof
      // cheap — full-corpus scan cost belongs to text_bm25_topk's index
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_textinc_${new java.io.File(dir).getName}").toString
      Sink.writeTextIndex(docs.filter(col("doc_id") % 2 === 0), path,
        buckets = 16)
      Sink.appendTextIndex(s, path,
        docs.filter(col("doc_id") % 4 === 1), batchId = 0L)
      Sink.appendTextIndex(s, path,
        docs.filter(col("doc_id") % 4 === 3), batchId = 1L)
      // a crash redelivers batch 1: the overwrite must not double-count
      Sink.appendTextIndex(s, path,
        docs.filter(col("doc_id") % 4 === 3), batchId = 1L)
      val terms = Seq("vector", "hash", "merge")
      val inc = graft.operators.TextAnalysis
        .bm25TopK(Sink.readTextIndex(s, path), terms, k = 20)
        .localCheckpoint(true)
      Sink.compactTextIndex(s, path)
      val post = graft.operators.TextAnalysis
        .bm25TopK(Sink.readTextIndex(s, path), terms, k = 20)
      inc.join(post.withColumn("post", lit(true)),
          Seq("doc_id", "score"), "left")
        .select(col("doc_id"), col("score"),
          coalesce(col("post"), lit(false))
            .as("stable_across_compaction"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // the text-index DELETE lifecycle, driver-proven: build, tombstone
    // a doc subset (the retention story composing with the index at
    // last — C5 dropped raw partitions but dead postings lived on until
    // a full rebuild), REPLAY the delete (exactly-once: contributions
    // must not double-count), query the logical state, compact (the
    // tombstones fold physically and their layouts drop), query again.
    // The oracle replays BM25 over corpus-minus-deleted BLIND to the
    // mechanism: the hash match proves logical delete ≡ physical
    // absence, and stable_across_compaction pins fold parity per row
    "text_bm25_delete" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_textdel_${new java.io.File(dir).getName}").toString
      Sink.writeTextIndex(docs, path, buckets = 16)
      val doomed = docs.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"))
      Sink.deleteFromTextIndex(s, path, doomed, batchId = 0L)
      // a crash redelivers the delete batch: same numbers, no drift
      Sink.deleteFromTextIndex(s, path, doomed, batchId = 0L)
      val terms = Seq("vector", "hash", "merge")
      val logical = graft.operators.TextAnalysis
        .bm25TopK(Sink.readTextIndex(s, path), terms, k = 20)
        .localCheckpoint(true)
      Sink.compactTextIndex(s, path)
      val post = graft.operators.TextAnalysis
        .bm25TopK(Sink.readTextIndex(s, path), terms, k = 20)
      logical.join(post.withColumn("post", lit(true)),
          Seq("doc_id", "score"), "left")
        .select(col("doc_id"), col("score"),
          coalesce(col("post"), lit(false))
            .as("stable_across_compaction"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // the vector-index DELETE twin: tombstone a vec subset on the
    // persisted exact-Lloyd IVF index, replay the delete, serve through
    // the integer-lattice probe. The oracle replays the FULL mechanism
    // (Lloyd training on the ORIGINAL corpus — deletion filters
    // candidates, never retrains — probe selection, in-cell cosine)
    // over corpus-minus-deleted, blind to tombstones
    "embedding_index_delete" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_ivfdel_${new java.io.File(dir).getName}").toString
      val built = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
      Sink.writeIvfIndex(built, path)
      built.unpersist()
      val doomed = emb.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
      Sink.deleteFromIvfIndex(s, path, doomed, batchId = 0L)
      Sink.deleteFromIvfIndex(s, path, doomed, batchId = 0L) // replay
      Similarity.ivfQueryVectorsIntProbe(Sink.readIvfIndex(s, path),
          emb.filter(col("vec_id") === 1)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 20, nprobe = 3)
        .select(col("query_id"), col("vec_id"), col("rank"))
    }),

    // DELETE → RE-APPEND composition on the text index — the re-crawl
    // story: a previously retention-deleted URL is re-fetched and must
    // serve again WITHOUT a compaction (batch-scoped tombstones: a
    // delete at batch K masks only rows from batches ≤ K; at 100 TB a
    // compaction is a full-generation rewrite no crawler can pay per
    // URL). The delete replays AFTER the re-append (exactly-once in any
    // order — it must not swallow the batch-1 rows), the state compacts
    // (fold parity per row), and the delete replays AGAIN post-fold
    // (ledger-skipped — it would otherwise re-mask the folded
    // re-appended rows). Oracle replays BM25 over the final logical
    // corpus blind to every mechanism above
    "text_delete_readd" -> ((s, dir) => {
      // 1000-doc slice, the text_bm25_incremental rationale: the proof
      // (batch-scoped resurrect, replay orders, fold parity) is
      // size-invariant and the cost is the lifecycle's job count
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_textreadd_${new java.io.File(dir).getName}").toString
      Sink.writeTextIndex(docs, path, buckets = 16)
      val doomed = docs.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"))
      Sink.deleteFromTextIndex(s, path, doomed, batchId = 0L)
      // the re-crawl: half the deleted docs come back at a later batch
      Sink.appendTextIndex(s, path,
        docs.filter(col("doc_id") % 20 === 7), batchId = 1L)
      Sink.deleteFromTextIndex(s, path, doomed, batchId = 0L) // replay
      val terms = Seq("vector", "hash", "merge")
      val logical = graft.operators.TextAnalysis
        .bm25TopK(Sink.readTextIndex(s, path), terms, k = 20)
        .localCheckpoint(true)
      Sink.compactTextIndex(s, path)
      Sink.deleteFromTextIndex(s, path, doomed, batchId = 0L) // post-fold
      val post = graft.operators.TextAnalysis
        .bm25TopK(Sink.readTextIndex(s, path), terms, k = 20)
      logical.join(post.withColumn("post", lit(true)),
          Seq("doc_id", "score"), "left")
        .select(col("doc_id"), col("score"),
          coalesce(col("post"), lit(false))
            .as("stable_across_compaction"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // the vector-family twin: tombstone on the persisted exact-Lloyd
    // IVF index, re-append HALF the deleted vectors at a later batch
    // (FAISS-add against the frozen quantizer), replay the delete,
    // compact (physical fold), replay again (ledger-skipped), serve
    // through an EXHAUSTIVE integer-lattice probe (nprobe = nlist:
    // resurrect VISIBILITY is the claim here — cell pruning is pinned
    // by embedding_index_delete, and the re-added copy's cell comes
    // from the float FAISS-add assignment, deliberately not part of
    // this row's contract). Oracle = exact cosine over the final
    // logical corpus, blind to tombstones, appends, and folds
    "embedding_delete_readd" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_ivfreadd_${new java.io.File(dir).getName}").toString
      val built = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
      Sink.writeIvfIndex(built, path)
      built.unpersist()
      val doomed = emb.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
      Sink.deleteFromIvfIndex(s, path, doomed, batchId = 0L)
      Sink.appendIvfIndex(s, path,
        emb.filter(col("vec_id") % 14 === 3), batchId = 1L)
      Sink.deleteFromIvfIndex(s, path, doomed, batchId = 0L) // replay
      Sink.compactIvfIndex(s, path)
      Sink.deleteFromIvfIndex(s, path, doomed, batchId = 0L) // post-fold
      Similarity.ivfQueryVectorsIntProbe(Sink.readIvfIndex(s, path),
          emb.filter(col("vec_id") === 1)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 20, nprobe = 8)
        .select(col("query_id"), col("vec_id"), col("rank"))
    }),

    // the RETENTION → INDEX loop closed in one call (Sink.retentionSweep
    // — the job a 30-day-retention corpus runs daily): a date-partitioned
    // raw corpus expires its oldest dates, the sweep derives the expiring
    // ids from exactly those partition directories, tombstones the
    // persisted text AND IVF indexes under one batch id, then drops the
    // raw partitions. The sweep is then REPLAYED (the post-drop hazard:
    // without the commit-record guard the re-run would re-derive an
    // EMPTY id set and overwrite the tombstones, resurrecting every
    // swept doc). Output = BM25 top-20 and the cell-pruned int-lattice
    // ANN top-20 over the retained state; the oracle replays both legs
    // over the retained docs blind to the mechanism
    "retention_sweep" -> ((s, dir) => {
      // 1000-doc raw/text slice (size-invariant proof, lifecycle-cost
      // rationale above); the ANN side keeps the full embedding corpus
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val emb = Tables.embeddings(s, dir)
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_retsweep_${new java.io.File(dir).getName}").toString
      val raw = s"$base/raw"; val text = s"$base/text"
      val ivf = s"$base/ivf"
      docs.withColumn("date",
          concat(lit("2024-01-0"), (col("doc_id") % 5 + 1).cast("string")))
        .write.mode("overwrite").partitionBy("date").parquet(raw)
      Sink.writeTextIndex(docs, text, buckets = 16)
      val built = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
      Sink.writeIvfIndex(built, ivf)
      built.unpersist()
      Sink.retentionSweep(s, raw, "2024-01-03", batchId = 0L,
        textIndexes = Seq(text), ivfIndexes = Seq(ivf))
      // replay after the successful sweep: raw partitions are gone, the
      // tombstone commit records must keep the batch intact
      Sink.retentionSweep(s, raw, "2024-01-03", batchId = 0L,
        textIndexes = Seq(text), ivfIndexes = Seq(ivf))
      val bmRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      val bm = graft.operators.TextAnalysis
        .bm25TopK(Sink.readTextIndex(s, text),
          Seq("vector", "hash", "merge"), k = 20)
        .withColumn("rank", row_number().over(bmRank).cast("long"))
        .select(lit("bm25").as("leg"), col("doc_id").as("id"), col("rank"))
      val ann = Similarity.ivfQueryVectorsIntProbe(
          Sink.readIvfIndex(s, ivf),
          emb.filter(col("vec_id") === 2)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 20, nprobe = 3)
        .select(lit("ann").as("leg"), col("vec_id").as("id"),
          col("rank").cast("long").as("rank"))
      bm.unionByName(ann).orderBy(col("leg"), col("rank"))
    }),

    // hybrid SERVING with the full 4-leg production stack: each request
    // carries lexical terms, an exact-phrase boost, a proximity boost,
    // and its query embedding — rrfQueryBatch detects the optional
    // phrase/prox_terms columns and fuses BM25 + phrase + proximity +
    // cell-pruned int-lattice ANN through the ONE-cascade rrfFuseAll
    // (2-leg requests stay bit-identical — retrieval_hybrid_serve pins
    // that). All three text legs serve off the same persisted positional
    // index, bucket-pruned; the oracle replays all four rank lists per
    // request and the identical fusion
    "retrieval_hybrid_serve3" -> ((s, dir) => {
      import s.implicits._
      val textIdx = Sink.readTextIndex(s, persistedTextIndexDir(s, dir))
      val annIdx = Sink.readIvfIndex(s, persistedPqServeDir(s, dir))
      val reqs = Seq(
        (0L, Seq("vector", "hash", "merge"), Seq("table", "hash"),
          Seq("vector", "hash", "merge")),
        (1L, Seq("table", "hash"), Seq("vector", "hash"),
          Seq("table", "hash")))
        .toDF("query_id", "terms", "phrase", "prox_terms")
        .join(Tables.embeddings(s, dir)
          .select(col("vec_id").as("query_id"), col("embedding")),
          "query_id")
      graft.operators.TextAnalysis.rrfQueryBatch(
        textIdx, annIdx, reqs, kConst = 60L, k = 20)
    }),

    // DELETE × HYBRID composition: tombstone the SAME docs on both the
    // text and the IVF roots, then serve the fused stack over the
    // tombstoned state — proves no leg resurrects a deleted doc through
    // the fuse's full-outer union (each leg masks independently; the
    // fuse sees only surviving rows). Oracle replays both legs + fusion
    // over corpus-minus-deleted, blind to tombstones
    "retrieval_hybrid_delete" -> ((s, dir) => {
      import s.implicits._
      // 1000-doc text slice (lifecycle-cost rationale above); the ANN
      // side keeps the full embedding corpus
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val emb = Tables.embeddings(s, dir)
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_hybdel_${new java.io.File(dir).getName}").toString
      val text = s"$base/text"; val ivf = s"$base/ivf"
      Sink.writeTextIndex(docs, text, buckets = 16)
      val built = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
      Sink.writeIvfIndex(built, ivf)
      built.unpersist()
      val doomed = docs.filter(col("doc_id") % 9 === 4).select(col("doc_id"))
      Sink.deleteFromTextIndex(s, text, doomed, batchId = 0L)
      Sink.deleteFromIvfIndex(s, ivf,
        doomed.select(col("doc_id").as("vec_id")), batchId = 0L)
      val reqs = Seq(
        (0L, Seq("vector", "hash", "merge")),
        (1L, Seq("table", "hash"))).toDF("query_id", "terms")
        .join(emb.select(col("vec_id").as("query_id"), col("embedding")),
          "query_id")
      graft.operators.TextAnalysis.rrfQueryBatch(
        Sink.readTextIndex(s, text), Sink.readIvfIndex(s, ivf), reqs,
        kConst = 60L, k = 20)
    }),

    // the SEARCH-RESULTS-PAGE query: hybrid fusion + snippet evidence
    // in ONE serving call (rrfSnippetQueryBatch) — fused top-k per
    // request (bucket-pruned BM25 leg + cell-pruned int-lattice ANN
    // leg), each winner annotated with the best covering window of the
    // request's terms and its rendered token span; a winner surfaced by
    // the semantic leg alone carries NULL evidence and no text is read
    // for it. Oracle replays both legs, the fusion, the per-winner
    // min-window argmin, and the slice
    "retrieval_hybrid_snippet" -> ((s, dir) => {
      import s.implicits._
      val textIdx = Sink.readTextIndex(s, persistedTextIndexDir(s, dir))
      val annIdx = Sink.readIvfIndex(s, persistedPqServeDir(s, dir))
      val reqs = Seq(
        (0L, Seq("vector", "hash", "merge")),
        (1L, Seq("table", "hash"))).toDF("query_id", "terms")
        .join(Tables.embeddings(s, dir)
          .select(col("vec_id").as("query_id"), col("embedding")),
          "query_id")
      graft.operators.TextAnalysis.rrfSnippetQueryBatch(
        textIdx, annIdx, Tables.documents(s, dir), reqs,
        kConst = 60L, k = 20)
    }),

    // the results-page call with the exact-phrase BOOST: requests carry
    // a phrase column, so the fuse runs three legs (BM25 + phrase +
    // ANN) and the evidence pass prefers the PHRASE-ANCHOR window — a
    // winner containing the exact phrase is highlighted at its FIRST
    // occurrence (win_start = min anchor, window_len = phrase length);
    // winners without a full occurrence keep the terms min-window, and
    // semantic-only winners stay NULL. Oracle replays all three rank
    // lists, the fusion, the phrase-anchor recurrence, the terms
    // min-window recurrence, the COALESCE preference, and the slice
    "retrieval_hybrid_snippet_phrase" -> ((s, dir) => {
      import s.implicits._
      val textIdx = Sink.readTextIndex(s, persistedTextIndexDir(s, dir))
      val annIdx = Sink.readIvfIndex(s, persistedPqServeDir(s, dir))
      val reqs = Seq(
        (0L, Seq("vector", "hash", "merge"), Seq("table", "hash")),
        (1L, Seq("table", "hash"), Seq("vector", "hash")))
        .toDF("query_id", "terms", "phrase")
        .join(Tables.embeddings(s, dir)
          .select(col("vec_id").as("query_id"), col("embedding")),
          "query_id")
      graft.operators.TextAnalysis.rrfSnippetQueryBatch(
        textIdx, annIdx, Tables.documents(s, dir), reqs,
        kConst = 60L, k = 20)
    }),

    // the MAXIMAL results-page call — every optional surface of
    // rrfSnippetQueryBatch in ONE batch: 4-leg fusion (BM25 + exact
    // phrase + proximity + ANN, retrieval_hybrid_serve3's stack) AND
    // the phrase-preferential evidence pass (snippet_phrase's) on the
    // fused winners. r15 pinned the two halves separately; this row
    // pins their composition, the call a production ranker actually
    // makes. Oracle replays all four rank lists, the fusion, the
    // phrase-anchor recurrence, the terms min-window recurrence, the
    // COALESCE preference, and the snippet slice
    "retrieval_hybrid_page4" -> ((s, dir) => {
      import s.implicits._
      val textIdx = Sink.readTextIndex(s, persistedTextIndexDir(s, dir))
      val annIdx = Sink.readIvfIndex(s, persistedPqServeDir(s, dir))
      val reqs = Seq(
        (0L, Seq("vector", "hash", "merge"), Seq("table", "hash"),
          Seq("vector", "hash", "merge")),
        (1L, Seq("table", "hash"), Seq("vector", "hash"),
          Seq("table", "hash")))
        .toDF("query_id", "terms", "phrase", "prox_terms")
        .join(Tables.embeddings(s, dir)
          .select(col("vec_id").as("query_id"), col("embedding")),
          "query_id")
      graft.operators.TextAnalysis.rrfSnippetQueryBatch(
        textIdx, annIdx, Tables.documents(s, dir), reqs,
        kConst = 60L, k = 20)
    }),

    // IVF-PQ delete → re-append → ADC serve, hash-checked end to end —
    // the CODED layout's delete lifecycle (the one family r14 left
    // spec-pinned but without an oracle row): build the persisted
    // IVF-PQ index, tombstone vec_id % 7 == 3, re-append half of them
    // (% 14 == 3 — appendIvfIndex re-encodes against the PERSISTED
    // codebooks, FAISS-add semantics), replay the delete, then serve
    // with tombstones PRESENT (no fold) through readIvfIndex's coded
    // path: exhaustive integer-replayable probe (nprobe = nlist), the
    // ADC shortlist cut at rerank = 50 (ties → lowest vec_id), exact
    // cosine top-20 last. The oracle replays PQ training (2-round
    // int-Lloyd, md5 seeds), encoding, the ADC table, the shortlist
    // cut AND the rerank over the final logical corpus
    // (% 14 == 10 gone forever), blind to tombstones and batches
    "embedding_pq_delete_readd" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_pqreadd_${new java.io.File(dir).getName}").toString
      val idx = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
      val model = Similarity.buildPqModel(emb, m = 8, k = 16, iters = 1)
      Sink.writeIvfPqIndex(idx, model.cents, model.codes, path)
      idx.unpersist(); model.unpersist()
      val doomed = emb.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
      Sink.deleteFromIvfIndex(s, path, doomed, batchId = 0L)
      Sink.appendIvfIndex(s, path,
        emb.filter(col("vec_id") % 14 === 3), batchId = 1L)
      Sink.deleteFromIvfIndex(s, path, doomed, batchId = 0L) // replay
      val (loaded, cents) = Sink.readIvfPqIndex(s, path)
      Similarity.ivfPqQueryVectors(loaded, cents,
          emb.filter(col("vec_id") === 1)
            .select((col("vec_id") + 2000000L).as("query_id"),
              col("embedding")),
          nprobe = 8, rerank = 50, k = 20)
        .select(col("query_id"), col("vec_id"), col("rank"))
    }),

    // PII audit + redaction: the corpus carries no PII, so a
    // deterministic PII-bearing column is derived from driver data
    // (email from source, phone/IP from doc_id) and the operator's
    // counts + redacted fingerprint are oracle-checked end to end
    "text_pii_redact" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val piiText = concat(
        col("text"),
        lit(" contact "), col("source"), lit("_"),
        col("doc_id").cast("string"), lit("@example.com call +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"))
      graft.operators.Pii.audit(d, piiText).orderBy(col("doc_id"))
    }),

    // C4/RefinedWeb-style sub-document span dedup: tumbling 10-word
    // spans, keep the globally-first occurrence, per-doc audit row with
    // the kept-text fingerprint
    "dedup_spans" -> ((s, dir) =>
      Dedup.spanDedup(Tables.documents(s, dir), k = 10)),

    // Misra-Gries heavy hitters over the token stream, registered as the
    // HASH-VERIFIABLE audit: per-item estimates are merge-order-dependent
    // (not SQL-recomputable), but the MG guarantees are deterministic
    // claims over exact counts — every token above the n/(cap+1) survival
    // threshold with its exact count (oracle recomputes both) plus claim
    // booleans the oracle pins to TRUE (reported, est ≤ true ≤ est+err,
    // ≤ capacity entries). The raw sketch listing stays available as
    // TextAnalysis.heavyHitters (spec-tested incl. merge invariance).
    "text_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHittersAudit(Tables.documents(s, dir), capacity = 32)),

    // NEAR-dup curation end to end: quality filter → exact ngram-Jaccard
    // pairs → connected components → keep component minimum → split;
    // every stage already carries its own oracle, so the composition is
    // hash-checked (oracle = quality CTE + brute-force pairs + recursive
    // CTE reachability + hash-split CASE)
    "pipeline_curate_neardup" -> ((s, dir) =>
      Curation.curateNearDup(Tables.documents(s, dir),
        minQuality = 0.5, threshold = 0.7)
        .orderBy(col("doc_id"))),

    // per-label embedding diagnostics: centroid norm, mean squared norm,
    // within-label variance trace — fixed-point (1e-6) integer sums make
    // the doubles bit-identical across engines
    "embedding_label_stats" -> ((s, dir) =>
      Similarity.labelEmbeddingStats(Tables.embeddings(s, dir))),

    // dataset profiling: per-column row/null/distinct/min/max in ONE
    // scan (exact distincts here for the oracle; the approx flag is the
    // 100 TB path — see Profile scaladoc). Only integer/string columns
    // registered: float min/max render engine-specifically.
    "profile_documents" -> ((s, dir) =>
      graft.operators.Profile.profile(Tables.documents(s, dir),
        Seq("doc_id", "lang", "source", "n_chars"), exact = true)),

    // approximate percentiles next to the exact order statistics, made
    // ORACLE-CHECKABLE: exact quantiles are SQL-recomputable, and the
    // sketch claim becomes an in-plan boolean — the approx value must lie
    // inside the exact [q−0.01, q+0.01] value bracket (approx_percentile
    // at accuracy 1000 guarantees rank error ≤ 0.001·n, 10× inside the
    // bracket), which the oracle pins to TRUE. Scalar columns only: the
    // driver's comparator cannot hash array cells (round-3 red row).
    "q_approx_percentiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("approx_percentile(value, array(0.5, 0.9, 0.99), 1000)")
            .as("ap"),
          expr("percentile(value, array(0.49, 0.5, 0.51, 0.89, 0.9, 0.91, 0.98, 0.99, 1.0))")
            .as("ep"))
        .select(
          col("event_type"),
          element_at(col("ep"), 2).as("p50_exact"),
          element_at(col("ep"), 5).as("p90_exact"),
          element_at(col("ep"), 8).as("p99_exact"),
          (element_at(col("ap"), 1) >= element_at(col("ep"), 1)
            && element_at(col("ap"), 1) <= element_at(col("ep"), 3))
            .as("p50_within_rank_bound"),
          (element_at(col("ap"), 2) >= element_at(col("ep"), 4)
            && element_at(col("ap"), 2) <= element_at(col("ep"), 6))
            .as("p90_within_rank_bound"),
          (element_at(col("ap"), 3) >= element_at(col("ep"), 7)
            && element_at(col("ap"), 3) <= element_at(col("ep"), 9))
            .as("p99_within_rank_bound"))
        .orderBy(col("event_type"))))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** THE sliced part co-purchase graph (parts sharing an order, on the
    * deterministic 1-in-4 order slice — see the graph_triangles
    * registration for why the full graph is bench-hostile): the ONE
    * derivation `graph_triangles` and `graph_communities` both run, so
    * the "same graph" claim cannot drift.
    */
  /** Deterministic 16-cluster corpus derived from the embeddings table:
    * cluster(v) = vec_id % 16, component i of the cluster center is a
    * uniform-ish value in [−0.3, 0.3] read off md5 hex digits of
    * "cluster_i" (engine-portable, no RNG), and the vector's own
    * embedding shrunk to 5% supplies intra-cluster noise. The result has
    * the strong coarse-cell structure residual PQ exists for, built from
    * driver-shared data only.
    */
  private def clusteredEmbeddings(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("""transform(embedding, (x, i) -> cast(
        x * 0.05D +
        ((cast(conv(substring(md5(concat(cast(vec_id % 16 AS string),
                                         '_', cast(i AS string))), 1, 6),
                    16, 10) AS long) % 1000) / 1000.0D - 0.5D) * 0.6D
        AS float))""").as("embedding"))

  // ---- media near-dup fixtures: ONE definition each, shared by the
  // per-modality pair queries AND the unified multimodal_dup_clusters
  // surface, so the clusters query audits exactly the graphs the pair
  // queries emit ----

  /** Image-modality media fixture (see multimodal_phash_pairs): decade-
    * shared synthetic content planted on doc_id % 10 ∈ {6, 7}, text
    * bytes elsewhere — md5-stub hashes, so the pair set is the planted
    * exact dups, oracle-replayable.
    */
  private def phashMediaFixture(
      s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      lit("media/stub").as("media_type"),
      when((col("doc_id") % 10).isin(6, 7),
        concat(lit("shared-"), expr("doc_id div 10").cast("string")))
        .otherwise(col("text")).as("content_str"))
      .select(col("doc_id"), col("media_type"),
        octet_length(col("content_str")).cast("long").as("n_bytes"),
        col("content_str").cast("binary").as("content"))

  /** Video-modality clips fixture (see multimodal_videohash_pairs):
    * per doc < 40 with ≥ 256 chars, clip A = 8 fixed 32-char text
    * chunks packed as container frames, clip B (id + 100000) = the same
    * clip re-cut with the last frame dropped.
    */
  private def videoClipsFixture(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(col("doc_id") < 40 && col("n_chars") >= 256)
      .select(col("doc_id"),
        array((0 until 8).map(i =>
          substring(col("text"), i * 32 + 1, 32)): _*).as("frames"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.flatMap { case (id, fs) =>
          val bytes = fs.map(_.getBytes("UTF-8"))
          val a = Multimodal.packFrames(bytes)
          val b = Multimodal.packFrames(bytes.take(7)) // re-cut: drop last
          Seq(Multimodal.MediaRow(id, "video/gfv", a.length.toLong, a),
            Multimodal.MediaRow(id + 100000L, "video/gfv",
              b.length.toLong, b))
        }
      }.toDF()
  }

  /** Audio-modality clips fixture (see multimodal_audiohash_pairs):
    * per doc < 40, an injective checksum-coded PCM WAV melody
    * (Multimodal.fixtureMelody) and its exactly-half-gain twin
    * (id + 100000) — the twin fingerprints bit-identically, distinct
    * melodies sit ≥ 8 Hamming bits apart (spec-pinned).
    */
  private def audioClipsFixture(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(col("doc_id") < 40)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val rate = 8000
          val samples = Multimodal.fixtureMelody(id, rate = rate)
          val half = samples.map(v => (v / 2).toShort)
          val a = Multimodal.packWav(samples, rate)
          val b = Multimodal.packWav(half, rate)
          Seq(Multimodal.MediaRow(id, "audio/wav", a.length.toLong, a),
            Multimodal.MediaRow(id + 100000L, "audio/wav",
              b.length.toLong, b))
        }
      }.toDF()
  }

  /** Staleness key for a write-if-absent on-disk index cache: md5 of
    * the source parquet's ABSOLUTE path + length + mtime — a different
    * corpus sharing a directory basename, or a corpus regenerated in
    * place, gets a different cache dir instead of being served from a
    * stale index (the IndexCache file-state keying, applied to disk).
    */
  private def corpusTag(dir: String, table: String): String = {
    val f = new java.io.File(dir, s"$table.parquet")
    val key = s"${f.getAbsolutePath}:${f.length}:${f.lastModified}"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  /** The on-disk IVF-PQ serving index for `similarity_ann_serve_pq`:
    * built + persisted ONCE per corpus (write-if-absent, keyed by
    * [[corpusTag]] — production serves from a long-lived index, not a
    * per-request rebuild; bench reps and repeated Verify calls reuse
    * the artifact). The build_census `_SUCCESS` is
    * [[graft.sinks.Sink.writeIvfPqIndex]]'s LAST write, so its presence
    * marks a complete layout; a torn half-write (crash mid-build) is
    * rebuilt on the next call.
    */
  private def persistedPqServeDir(s: SparkSession, dir: String): String = {
    // v2: the layout carries the integer-lattice coarse quantizer
    // (qcentroids) alongside the float centroids — the replayable-probe
    // prerequisite (Similarity.ivfQueryVectorsIntProbe)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_servepq_v2_${corpusTag(dir, "embeddings")}").toString
    if (!new java.io.File(s"$path/build_census/_SUCCESS").exists()) {
      val emb = Tables.embeddings(s, dir)
      val index = Similarity.IndexCache.ivfExact(emb, nlist = 16)
      val model = Similarity.IndexCache.pq(emb, m = 8, k = 64, iters = 2)
      Sink.writeIvfPqIndex(index, model.cents, model.codes, path)
    }
    path
  }

  /** The on-disk inverted index for `text_bm25_topk` — built + persisted
    * ONCE per corpus dir (write-if-absent, the persistedPqServeDir
    * idiom); the meta `_SUCCESS` is [[graft.sinks.Sink.writeTextIndex]]'s
    * LAST write, so its presence marks a complete layout.
    */
  private def persistedTextIndexDir(s: SparkSession, dir: String): String = {
    // v2: postings carry the positional payload (positions ARRAY<INT>)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_textidx_v2_${corpusTag(dir, "documents")}").toString
    if (!new java.io.File(s"$path/meta/_SUCCESS").exists()) {
      Sink.writeTextIndex(Tables.documents(s, dir), path, buckets = 64)
    }
    path
  }

  private def slicedCoPurchasePairs(
      s: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    items.as("a")
      .join(items.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
  }

  /** Weight-thresholded co-purchase graph: part pairs co-occurring in at
    * least 2 distinct orders (FULL graph, no slice — the weight cut is
    * the sparsifier). Much sparser than the raw co-purchase graph and
    * structurally richer (peels deeply under k-core), so it backs the
    * core/link-score queries.
    */
  private def weightedCoPurchasePairs(
      s: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    items.as("a")
      .join(items.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select(col("u").as("src"), col("v").as("dst"))
  }

  /** SQL twin of [[weightedCoPurchasePairs]]: CTEs `witems` + `we0`. */
  private val weightedCoPurchaseEdgesSql: String =
    """witems AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |we0 AS (
      |  SELECT u, v FROM (
      |    SELECT a.p AS u, b.p AS v, count(*) AS w
      |    FROM witems a JOIN witems b ON a.o = b.o AND a.p < b.p
      |    GROUP BY 1, 2) WHERE w >= 2)""".stripMargin

  /** SQL twin of [[slicedCoPurchasePairs]]: CTEs `items` + `e0`
    * (canonical u < v edge set), shared by both graph oracles.
    */
  private val coPurchaseEdgesSql: String =
    """items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
      |  WHERE l_orderkey % 4 = 0),
      |e0 AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p)""".stripMargin

  /** Shared prefix of the `dedup_clusters` / `dedup_cluster_sizes`
    * oracles: the trigram-Jaccard pair graph at t = 0.7 and its
    * recursive reachability closure, ending in
    * `cc(node, component = min reachable)`. One definition — the two
    * queries audit THE SAME graph by construction.
    */
  private val ngramCcSqlPrefix: String =
    """WITH RECURSIVE g AS (
      |  SELECT doc_id, lang,
      |    list_distinct(CASE WHEN length(norm) >= 3
      |      THEN [substring(norm, i, 3) for i in range(1, length(norm) - 1)]
      |      ELSE [norm] END) AS grams
      |  FROM (SELECT doc_id, lang,
      |          regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g') AS norm
      |        FROM documents) t),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |      CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |        / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
      |           - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) AS jaccard
      |    FROM g a JOIN g b
      |      ON a.lang = b.lang AND a.doc_id < b.doc_id
      |     AND least(len(a.grams), len(b.grams)) + 1e-9
      |         >= greatest(len(a.grams), len(b.grams)) * 0.7) p
      |  WHERE jaccard >= 0.7),
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |reach AS (
      |  SELECT u AS node, u AS comp FROM edges
      |  UNION
      |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
      |cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node)""".stripMargin

  /** Portable hex→BIGINT: the top `nibbles` hex chars of md5(`e`) decoded
    * with strpos arithmetic (the classifier/DSIR idiom, extended to a
    * 60-bit prefix — 15 nibbles keep the sum inside a positive BIGINT in
    * both engines, matching the Spark stub's `Long.parseLong(hex(0,15),
    * 16)`).
    */
  private def md5PrefixLongSql(e: String, nibbles: Int = 15): String =
    (1 to nibbles).map { p =>
      val pow = java.math.BigInteger.valueOf(16L).pow(nibbles - p)
      s"(strpos('0123456789abcdef', substring(md5($e), $p, 1)) - 1) * $pow"
    }.mkString("(", "\n           + ", ")")

  /** One Lloyd assign+update round as DuckDB CTEs (`d/a/c{t}` from
    * `c{t-1}`), shared by the `embedding_kmeans` and
    * `dedup_semdedup_kmeans` oracle replays. `//` on the non-negative
    * sums equals the Spark side's floorDiv.
    */
  private def lloydRoundSql(t: Int): String =
    s"""d$t AS (
       |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
       |  FROM p JOIN c${t - 1} c USING (d) GROUP BY 1, 2),
       |a$t AS (
       |  SELECT vec_id, j AS cluster FROM (
       |    SELECT vec_id, j,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist, j) AS rn
       |    FROM d$t) WHERE rn = 1),
       |c$t AS (
       |  SELECT o.j, o.d, COALESCE(CAST(u.s // u.n AS BIGINT), o.c) AS c
       |  FROM c${t - 1} o LEFT JOIN (
       |    SELECT a.cluster AS j, p.d, CAST(sum(p.v) AS BIGINT) AS s,
       |           count(*) AS n
       |    FROM p JOIN a$t a USING (vec_id) GROUP BY 1, 2) u
       |    ON o.j = u.j AND o.d = u.d)""".stripMargin

  /** DuckDB oracle for HMAC-SHA256 with the fixed key `"graft-key"`, via the
    * RFC 2104 decomposition: `hmac = H((K ^ opad) || H((K ^ ipad) || msg))`.
    *
    * DuckDB 1.0's `sha256` only accepts VARCHAR, which blocks the naive
    * blob decomposition — but for THIS key both pad blocks are pure ASCII,
    * so the inner hash is natively `sha256(ipad_ascii || msg)`. The outer
    * hash input is `opad_block (64 constant bytes) || inner_digest (32 raw
    * bytes)`: SHA-256 is block-iterative, so the state after the constant
    * opad block is a constant midstate (precomputed below), leaving exactly
    * ONE compression over a fully determined second block whose message
    * words are the 8 inner-digest words plus fixed padding (0x80, zeros,
    * bit-length 768). That single compression is replayed here as a
    * 64-step recursive CTE in 32-bit integer arithmetic (BIGINT + masks).
    * Constants are the public FIPS 180-4 round constants; the midstate is
    * SHA-256(IV, opad_block) for key "graft-key" (validated against
    * javax.crypto in CodecsSpec).
    */
  private lazy val hmacOracleSql: String = {
    // FIPS 180-4 SHA-256 round constants (public).
    val K = Seq(
      0x428a2f98L, 0x71374491L, 0xb5c0fbcfL, 0xe9b5dba5L, 0x3956c25bL,
      0x59f111f1L, 0x923f82a4L, 0xab1c5ed5L, 0xd807aa98L, 0x12835b01L,
      0x243185beL, 0x550c7dc3L, 0x72be5d74L, 0x80deb1feL, 0x9bdc06a7L,
      0xc19bf174L, 0xe49b69c1L, 0xefbe4786L, 0x0fc19dc6L, 0x240ca1ccL,
      0x2de92c6fL, 0x4a7484aaL, 0x5cb0a9dcL, 0x76f988daL, 0x983e5152L,
      0xa831c66dL, 0xb00327c8L, 0xbf597fc7L, 0xc6e00bf3L, 0xd5a79147L,
      0x06ca6351L, 0x14292967L, 0x27b70a85L, 0x2e1b2138L, 0x4d2c6dfcL,
      0x53380d13L, 0x650a7354L, 0x766a0abbL, 0x81c2c92eL, 0x92722c85L,
      0xa2bfe8a1L, 0xa81a664bL, 0xc24b8b70L, 0xc76c51a3L, 0xd192e819L,
      0xd6990624L, 0xf40e3585L, 0x106aa070L, 0x19a4c116L, 0x1e376c08L,
      0x2748774cL, 0x34b0bcb5L, 0x391c0cb3L, 0x4ed8aa4aL, 0x5b9cca4fL,
      0x682e6ff3L, 0x748f82eeL, 0x78a5636fL, 0x84c87814L, 0x8cc70208L,
      0x90befffaL, 0xa4506cebL, 0xbef9a3f7L, 0xc67178f2L)
    // SHA-256 state after compressing the constant opad block of "graft-key".
    val mid = Seq(779409365L, 3327313458L, 2516504936L, 2853558226L,
      679719076L, 3166517011L, 632591039L, 4059150801L)
    val kl    = K.mkString("[", ",", "]")
    val words = (0 until 8)
      .map(i => s"cast('0x'||substr(ih,${1 + 8 * i},8) as bigint)")
      .mkString(",")
    val m = "4294967295" // 2^32 - 1: 32-bit mask; also ~x = (m - x) on [0, m]
    def ror(x: String, n: Int) = s"(($x>>$n)|($x<<${32 - n})) & $m"
    // big-sigma1(e) + ch(e,f,g) + h + K[t] + W[t] — the T1 term of round t
    val t1 =
      s"""h + xor(xor(${ror("e", 6)}, ${ror("e", 11)}), ${ror("e", 25)})
         |            + xor(e & f, ($m - e) & g) + ($kl)[t+1] + ws[1]""".stripMargin
    s"""WITH RECURSIVE inner_h AS (
       |  SELECT doc_id,
       |         sha256('QDWPB' || chr(27) || ']SO' || repeat('6',55) ||
       |                substr(text,1,64)) AS ih
       |  FROM documents
       |), init AS (
       |  SELECT doc_id, [$words,2147483648,0,0,0,0,0,0,768] AS ws
       |  FROM inner_h
       |), r AS (
       |  SELECT doc_id, 0 AS t, ws,
       |         ${mid(0)}::BIGINT AS a, ${mid(1)}::BIGINT AS b,
       |         ${mid(2)}::BIGINT AS c, ${mid(3)}::BIGINT AS d,
       |         ${mid(4)}::BIGINT AS e, ${mid(5)}::BIGINT AS f,
       |         ${mid(6)}::BIGINT AS g, ${mid(7)}::BIGINT AS h
       |  FROM init
       |  UNION ALL
       |  SELECT doc_id, t+1,
       |         ws[2:16] || [(ws[1]
       |            + xor(xor(${ror("ws[2]", 7)}, ${ror("ws[2]", 18)}), ws[2]>>3)
       |            + ws[10]
       |            + xor(xor(${ror("ws[15]", 17)}, ${ror("ws[15]", 19)}), ws[15]>>10)
       |           ) & $m],
       |         ($t1
       |          + xor(xor(${ror("a", 2)}, ${ror("a", 13)}), ${ror("a", 22)})
       |          + (xor(xor(a & b, a & c), b & c))) & $m AS a,
       |         a AS b, b AS c, c AS d,
       |         (d + $t1) & $m AS e,
       |         e AS f, f AS g, g AS h
       |  FROM r WHERE t < 64
       |)
       |SELECT doc_id,
       |       printf('%08x%08x%08x%08x%08x%08x%08x%08x',
       |         ${mid.zip(Seq("a", "b", "c", "d", "e", "f", "g", "h"))
                    .map { case (mv, v) => s"($v+$mv) & $m" }.mkString(", ")}) AS sig
       |FROM r WHERE t = 64
       |ORDER BY doc_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "codec_hmac" -> hmacOracleSql,

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

    // identical semantics to transform_iot_metrics, deployed from TOML
    "transform_config_expr" ->
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
      """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
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
        |ORDER BY o_orderpriority""".stripMargin,

    "q_dormant_customers" ->
      """WITH avg_bal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |           / COUNT(c_acctbal) AS ab
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, COUNT(*) AS n_dormant,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, avg_bal
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        |                    AND o.o_orderdate <  TIMESTAMP '1998-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q_small_qty_revenue" ->
      """WITH brand_li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#1'),
        |per_part AS (
        |  SELECT l_partkey AS t_partkey,
        |         SUM(l_quantity) AS sum_qty,
        |         COUNT(l_quantity) AS cnt_qty
        |  FROM brand_li GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |         AS avg_yearly
        |FROM brand_li JOIN per_part ON l_partkey = t_partkey
        |WHERE l_quantity * 5.0 * cnt_qty < sum_qty""".stripMargin,

    "q_promo_share" ->
      """SELECT epoch_us(date_trunc('month', l_shipdate)) AS month_us,
        |       CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |                          THEN l_extendedprice * (1 - l_discount)
        |                          ELSE 0.0 END AS DECIMAL(18,8))) AS DOUBLE)
        |         AS promo_revenue,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE)
        |         AS total_revenue,
        |       100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |                          THEN l_extendedprice * (1 - l_discount)
        |                          ELSE 0.0 END AS DECIMAL(18,8))) AS DOUBLE)
        |         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE)
        |         AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY month_us
        |ORDER BY month_us""".stripMargin,

    "q_supplier_count" ->
      """SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q_event_pivot" ->
      """SELECT user_id,
        |       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_revenue_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items,
        |       CAST(GROUPING(l_returnflag) AS TINYINT) AS g_flag,
        |       CAST(GROUPING(l_linestatus) AS TINYINT) AS g_status
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        |       quantile_cont(value, 0.5) AS p50,
        |       quantile_cont(value, 0.9) AS p90,
        |       quantile_cont(value, 0.99) AS p99
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // exact side recomputed; the sketch-error claim is pinned TRUE — a
    // drifting HLL breaks the hash
    "q_approx_distinct" ->
      """SELECT event_type,
        |       count(DISTINCT user_id) AS exact_users,
        |       TRUE AS approx_within_3rsd
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_approx_percentiles" ->
      """SELECT event_type,
        |       quantile_cont(value, 0.5) AS p50_exact,
        |       quantile_cont(value, 0.9) AS p90_exact,
        |       quantile_cont(value, 0.99) AS p99_exact,
        |       TRUE AS p50_within_rank_bound,
        |       TRUE AS p90_within_rank_bound,
        |       TRUE AS p99_within_rank_bound
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // MG survival threshold is integer-exact (true*(cap+1) > n); the
    // sketch-side guarantees are pinned TRUE
    "text_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |    '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS true_count
        |      FROM toks WHERE token <> '' GROUP BY token),
        |t AS (SELECT CAST(sum(true_count) AS BIGINT) AS total_tokens FROM c)
        |SELECT c.token, c.true_count,
        |       TRUE AS reported, TRUE AS bound_ok,
        |       TRUE AS sketch_within_capacity, TRUE AS all_reported_bounds_ok
        |FROM c, t
        |WHERE c.true_count * 33 > t.total_tokens
        |ORDER BY c.token""".stripMargin,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
        |       o_totalprice,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderdate_us, o_orderkey""".stripMargin,

    "q_revenue_rollup" ->
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE) AS revenue,
        |       CAST(GROUPING(r_name) AS TINYINT) AS g_region,
        |       CAST(GROUPING(n_name) AS TINYINT) AS g_nation
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q_repeat_customers" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,

    "q_shipment_gaps" ->
      """WITH g AS (
        |  SELECT l_suppkey,
        |         epoch_us(l_shipdate) AS ship_us,
        |         lag(epoch_us(l_shipdate)) OVER (
        |           PARTITION BY l_suppkey
        |           ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_ship_us
        |  FROM lineitem)
        |SELECT l_suppkey, COUNT(*) AS n_gaps,
        |       MAX(ship_us - prev_ship_us) AS max_gap_us
        |FROM g WHERE prev_ship_us IS NOT NULL
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,

    "q7_trade_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate) AS l_year,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |       CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_1'
        |                          THEN l_extendedprice * (1 - l_discount)
        |                          ELSE 0.0 END AS DECIMAL(18,8))) AS DOUBLE)
        |       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                       AS DECIMAL(18,8))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region   ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,8))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |                 AND p_name LIKE '%widget%'
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-07-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q13_order_distribution" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |                      AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM per_cust
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                       AS DECIMAL(18,8))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |    AND l_shipdate <  TIMESTAMP '1998-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |           AS sum_qty
        |  FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING sum_qty > 250.0)
        |SELECT c_name, c_custkey, o_orderkey,
        |       epoch_us(o_orderdate) AS o_orderdate_us,
        |       o_totalprice, sum_qty
        |FROM big
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q11_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |         SUM(CAST(l_extendedprice * (1 - l_discount)
        |             AS DECIMAL(18,8))) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
        |FROM pv
        |WHERE v * (SELECT COUNT(*) FROM pv) > 2 * (SELECT SUM(v) FROM pv)
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q12_priority_distribution" ->
      """SELECT l_returnflag,
        |       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
        |         AS high_line_count,
        |       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
        |         AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q20_heavy_suppliers" ->
      """WITH qty AS (
        |  SELECT l_suppkey, l_partkey,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%red%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey, l_partkey)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM qty WHERE sum_qty > 50.0)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |         COUNT(DISTINCT l_suppkey) AS n_supp,
        |         COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
        |                             THEN l_suppkey END) AS n_flagged,
        |         MIN(CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
        |           AS suppkey
        |  FROM lineitem
        |  GROUP BY l_orderkey)
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM per_order
        |JOIN orders   ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON suppkey = s_suppkey
        |WHERE n_supp > 1 AND n_flagged = 1
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 100""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,8))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.05
        |  AND l_quantity < 24""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
        |       o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate_us, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "transform_unit_conversion" ->
      """SELECT 'events/' || event_type || '/' || user_id AS topic,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS timestamp,
        |       value AS temperature_celsius,
        |       value * 9 / 5 + 32 AS temperature_fahrenheit,
        |       CAST(NULL AS VARCHAR) AS original_text,
        |       CAST(NULL AS VARCHAR) AS text_rot13,
        |       'hermod' AS processed_by
        |FROM events
        |ORDER BY topic, timestamp, temperature_celsius""".stripMargin,

    "transform_generic_multi_table" ->
      """WITH m AS (
        |  SELECT 's' || user_id AS sensor_id,
        |         epoch_us(ts) AS time_us,
        |         value,
        |         CASE WHEN user_id % 2 = 0 THEN value * 0.5 END AS humidity,
        |         CASE WHEN event_type = 'click' THEN 'high' END AS alert
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'sensor_readings' AS rec_table, time_us, sensor_id,
        |         value AS temperature,
        |         COALESCE(humidity, 0.0) AS humidity,
        |         100.0 AS battery,
        |         CAST(NULL AS VARCHAR) AS event_type,
        |         FALSE AS has_details
        |  FROM m
        |  UNION ALL
        |  SELECT 'sensor_events', time_us, sensor_id,
        |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |         CAST(NULL AS DOUBLE), 'alert', TRUE
        |  FROM m WHERE alert IS NOT NULL) u
        |ORDER BY rec_table, time_us, sensor_id""".stripMargin,

    // identical record semantics to the generic path, recomputed by the
    // oracle the same way — the TOML route and the precompiled transform
    // must both match this (and therefore each other)
    "transform_config_multi_table" ->
      """WITH m AS (
        |  SELECT 's' || user_id AS sensor_id,
        |         epoch_us(ts) AS time_us,
        |         value,
        |         CASE WHEN user_id % 2 = 0 THEN value * 0.5 END AS humidity,
        |         CASE WHEN event_type = 'click' THEN 'high' END AS alert
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'sensor_readings' AS rec_table, time_us, sensor_id,
        |         value AS temperature,
        |         COALESCE(humidity, 0.0) AS humidity,
        |         100.0 AS battery,
        |         CAST(NULL AS VARCHAR) AS event_type,
        |         FALSE AS has_details
        |  FROM m
        |  UNION ALL
        |  SELECT 'sensor_events', time_us, sensor_id,
        |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |         CAST(NULL AS DOUBLE), 'alert', TRUE
        |  FROM m WHERE alert IS NOT NULL) u
        |ORDER BY rec_table, time_us, sensor_id""".stripMargin,

    "text_stats" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_tokens_bpe,
        |    CAST(length(text) AS DOUBLE) AS n_chars_d,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS n_punct,
        |    CAST(len(regexp_extract_all(text, '\b(the|a|of|and|or|in)\b')) AS DOUBLE) AS n_stop
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens, n_tokens_bpe,
        |  CASE WHEN n_tokens > 0 THEN n_chars_d / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS avg_token_len,
        |  CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d ELSE 0.0 END AS punct_ratio,
        |  CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
        |  least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |    + (1.0 - CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d ELSE 0.0 END) * 0.3
        |    + least(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 5.0, 1.0) * 0.3
        |    AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\b(the|a|of)\b')) AS INT) AS s_en,
        |    CAST(len(regexp_extract_all(text, '\b(data|table|row|column)\b')) AS INT) AS s_data,
        |    CAST(len(regexp_extract_all(text, '\b(query|join|filter|agg)\b')) AS INT) AS s_query
        |  FROM documents)
        |SELECT doc_id, s_en, s_data, s_query,
        |  CASE WHEN s_query > greatest(s_en, s_data) THEN 'query'
        |       WHEN s_data > s_en THEN 'data'
        |       ELSE 'en' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(trim(text), '\s+', ' ', 'g') AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp_md5,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(unicode(c) AS BIGINT) for c in split(norm, '')]),
        |    (acc, b) -> (acc * 131 + b) % 1000000007) AS fp_rolling
        |FROM n ORDER BY doc_id""".stripMargin,

    "q_value_histogram" ->
      """WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
        |SELECT event_type,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE least(9, CAST(floor((value - lo) / ((hi - lo) / 10.0)) AS BIGINT))
        |  END AS bin,
        |  count(*) AS n
        |FROM events, b
        |GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,

    "q_brand_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // first-touch funnel: each stage anchors at the earliest qualifying
    // event; integer permillage conversion vs stage 1
    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
        |  GROUP BY 1),
        |st AS (
        |  SELECT 1 AS stage_idx, 'view' AS stage,
        |         (SELECT count(*) FROM s1) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |SELECT stage_idx, stage, users,
        |       CASE WHEN (SELECT users FROM st WHERE stage_idx = 1) = 0
        |            THEN 0
        |            ELSE (users * 1000)
        |                 // (SELECT users FROM st WHERE stage_idx = 1)
        |       END AS conv_milli
        |FROM st ORDER BY stage_idx""".stripMargin,

    "q_cohort_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(date_trunc('day', ts)) AS day_us
        |  FROM events),
        |c AS (SELECT user_id, min(day_us) AS cohort_us FROM ud GROUP BY 1)
        |SELECT c.cohort_us,
        |       (ud.day_us - c.cohort_us) // 86400000000 AS offset_days,
        |       count(*) AS active_users
        |FROM ud JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_us, offset_days""".stripMargin,

    // lower-median + MAD on the exact cents lattice via the same
    // histogram-walk definition (smallest value whose cumulative count
    // reaches ceil(n/2)); outliers at d > 3·MAD
    "q_anomaly_mad" ->
      """WITH base AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |h1 AS (
        |  SELECT event_type, cents, count(*) AS cnt
        |  FROM base GROUP BY 1, 2),
        |m1 AS (
        |  SELECT event_type, min(cents) AS med_cents FROM (
        |    SELECT event_type, cents,
        |           sum(cnt) OVER (PARTITION BY event_type
        |                          ORDER BY cents) AS cum,
        |           sum(cnt) OVER (PARTITION BY event_type) AS n
        |    FROM h1) WHERE cum * 2 >= n GROUP BY 1),
        |dev AS (
        |  SELECT base.event_type, abs(cents - med_cents) AS d
        |  FROM base JOIN m1 USING (event_type)),
        |h2 AS (SELECT event_type, d, count(*) AS cnt FROM dev GROUP BY 1, 2),
        |m2 AS (
        |  SELECT event_type, min(d) AS mad_cents FROM (
        |    SELECT event_type, d,
        |           sum(cnt) OVER (PARTITION BY event_type ORDER BY d) AS cum,
        |           sum(cnt) OVER (PARTITION BY event_type) AS n
        |    FROM h2) WHERE cum * 2 >= n GROUP BY 1)
        |SELECT dev.event_type, count(*) AS n, m1.med_cents, m2.mad_cents,
        |       CAST(sum(CASE WHEN d > mad_cents * 3 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers,
        |       max(d) AS max_abs_dev
        |FROM dev JOIN m1 USING (event_type) JOIN m2 USING (event_type)
        |GROUP BY 1, 3, 4 ORDER BY event_type""".stripMargin,

    "q_attribution" ->
      """WITH conv AS (
        |  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS conv_us
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_type AS channel, epoch_us(ts) AS touch_us
        |  FROM events WHERE event_type IN ('view', 'click')),
        |att AS (
        |  SELECT c.conv_id, t.channel
        |  FROM conv c JOIN touch t ON c.user_id = t.user_id
        |  WHERE t.touch_us <= c.conv_us
        |    AND t.touch_us > c.conv_us - 86400000000),
        |pc AS (SELECT conv_id, count(*) AS n_touches FROM att GROUP BY 1)
        |SELECT channel, count(*) AS touches,
        |       count(DISTINCT att.conv_id) AS conversions_touched,
        |       CAST(sum(1000000 // n_touches) AS BIGINT) AS credit_ppm
        |FROM att JOIN pc USING (conv_id)
        |GROUP BY channel ORDER BY channel""".stripMargin,

    "q_ewma" ->
      """WITH b AS (
        |  SELECT event_type,
        |         epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
        |         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |lags AS (SELECT unnest(generate_series(0, 11)) AS lag),
        |n AS (
        |  SELECT event_type, h + lag AS h,
        |         CAST(sum(cents * (CAST(1 AS BIGINT) << (11 - lag)))
        |              AS BIGINT) AS ewma_num
        |  FROM b CROSS JOIN lags GROUP BY 1, 2)
        |SELECT b.event_type, b.h, b.cents AS bucket_cents, n.ewma_num,
        |       n.ewma_num // 4095 AS ewma_cents
        |FROM b JOIN n ON b.event_type = n.event_type AND b.h = n.h
        |ORDER BY b.event_type, b.h""".stripMargin,

    "audit_k_anonymity" ->
      """WITH c AS (
        |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           // 1000 AS vb,
        |         user_id
        |  FROM events),
        |g AS (
        |  SELECT event_type, day_us, vb, count(*) AS n,
        |         count(DISTINCT user_id) AS l
        |  FROM c GROUP BY 1, 2, 3),
        |x AS (SELECT n, l, unnest([2, 5, 10]) AS k FROM g)
        |SELECT k, count(*) AS n_groups,
        |       CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
        |         AS groups_below_k,
        |       CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
        |         AS rows_below_k,
        |       min(n) AS min_group_size,
        |       min(l) AS min_l_diversity
        |FROM x GROUP BY k ORDER BY k""".stripMargin,

    "census_distinct_sketch" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |       TRUE AS rollup_consistent, TRUE AS within_tolerance
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "census_overlap_theta" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'purchase' AND value > 150),
        |     b AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'error' AND value > 150),
        |     u AS (SELECT user_id FROM a UNION SELECT user_id FROM b)
        |SELECT (SELECT count(*) FROM a) AS card_a,
        |       (SELECT count(*) FROM b) AS card_b,
        |       (SELECT count(*) FROM a JOIN b USING (user_id))
        |         AS card_intersection,
        |       (SELECT count(*) FROM u) AS card_union,
        |       (SELECT count(*) FROM a JOIN b USING (user_id)) * 1000000
        |         // (SELECT count(*) FROM u) AS jaccard_ppm""".stripMargin,

    "census_overlap_incremental" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'purchase'),
        |     b AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'error'),
        |     u AS (SELECT user_id FROM a UNION SELECT user_id FROM b)
        |SELECT (SELECT count(*) FROM a) AS card_a,
        |       (SELECT count(*) FROM b) AS card_b,
        |       (SELECT count(*) FROM a JOIN b USING (user_id))
        |         AS card_intersection,
        |       (SELECT count(*) FROM u) AS card_union,
        |       (SELECT count(*) FROM a JOIN b USING (user_id)) * 1000000
        |         // (SELECT count(*) FROM u) AS jaccard_ppm""".stripMargin,

    "census_quantile_sketch" ->
      """WITH r AS (SELECT unnest([100000, 500000, 900000, 990000])
        |             AS rank_ppm)
        |SELECT event_type, CAST(rank_ppm AS BIGINT) AS rank_ppm,
        |       count(*) AS n, TRUE AS within_tol
        |FROM events CROSS JOIN r
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "census_distribution_drift" ->
      """WITH c AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents,
        |         CAST(epoch_us(date_trunc('day', ts)) // 86400000000
        |           AS BIGINT) AS day
        |  FROM events WHERE event_type = 'click'),
        |sa AS (SELECT cents FROM c WHERE day % 2 = 0),
        |sb AS (SELECT cents FROM c WHERE day % 2 = 1),
        |db AS (SELECT cents * 2 + 1000 AS cents FROM c),
        |u1 AS (SELECT cents, 1 AS ia, 0 AS ib FROM sa
        |       UNION ALL SELECT cents, 0, 1 FROM sb),
        |g1 AS (SELECT cents, sum(ia) AS ka, sum(ib) AS kb
        |       FROM u1 GROUP BY 1),
        |w1 AS (SELECT sum(ka) OVER (ORDER BY cents) AS ca,
        |              sum(kb) OVER (ORDER BY cents) AS cb FROM g1),
        |k1 AS (SELECT max(abs(ca * 1000000 // (SELECT count(*) FROM sa)
        |                    - cb * 1000000 // (SELECT count(*) FROM sb)))
        |         AS ks FROM w1),
        |u2 AS (SELECT cents, 1 AS ia, 0 AS ib FROM c
        |       UNION ALL SELECT cents, 0, 1 FROM db),
        |g2 AS (SELECT cents, sum(ia) AS ka, sum(ib) AS kb
        |       FROM u2 GROUP BY 1),
        |w2 AS (SELECT sum(ka) OVER (ORDER BY cents) AS ca,
        |              sum(kb) OVER (ORDER BY cents) AS cb FROM g2),
        |k2 AS (SELECT max(abs(ca * 1000000 // (SELECT count(*) FROM c)
        |                    - cb * 1000000 // (SELECT count(*) FROM db)))
        |         AS ks FROM w2)
        |SELECT 'same' AS pair, (SELECT count(*) FROM sa) AS n_a,
        |       (SELECT count(*) FROM sb) AS n_b,
        |       (SELECT ks FROM k1) > 200000 AS drift,
        |       TRUE AS within_tol
        |UNION ALL
        |SELECT 'shifted', (SELECT count(*) FROM c),
        |       (SELECT count(*) FROM db),
        |       (SELECT ks FROM k2) > 200000, TRUE
        |ORDER BY pair""".stripMargin,

    "census_heavy_hitters_sketch" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(regexp_replace(trim(lower(
        |    COALESCE(text, ''))), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |nz AS (SELECT token FROM toks WHERE token <> ''),
        |tot AS (SELECT count(*) AS stream_len FROM nz)
        |SELECT token, count(*) AS freq,
        |       (SELECT stream_len FROM tot) AS stream_len,
        |       TRUE AS exact_mode
        |FROM nz GROUP BY token HAVING count(*) >= 500
        |ORDER BY freq DESC, token""".stripMargin,

    "layout_zorder_census" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT min(user_id) AS minu, max(user_id) AS maxu,
        |             min(cents) AS minc, max(cents) AS maxc FROM e),
        |b AS (
        |  SELECT user_id, cents,
        |    CASE WHEN maxu = minu THEN 0
        |         ELSE ((user_id - minu) * 255) // (maxu - minu) END AS bu,
        |    CASE WHEN maxc = minc THEN 0
        |         ELSE ((cents - minc) * 255) // (maxc - minc) END AS bc
        |  FROM e CROSS JOIN r),
        |z AS (
        |  SELECT user_id, cents,
        |      (((bu >> 0) & 1) << 0) + (((bc >> 0) & 1) << 1)
        |    + (((bu >> 1) & 1) << 2) + (((bc >> 1) & 1) << 3)
        |    + (((bu >> 2) & 1) << 4) + (((bc >> 2) & 1) << 5)
        |    + (((bu >> 3) & 1) << 6) + (((bc >> 3) & 1) << 7)
        |    + (((bu >> 4) & 1) << 8) + (((bc >> 4) & 1) << 9)
        |    + (((bu >> 5) & 1) << 10) + (((bc >> 5) & 1) << 11)
        |    + (((bu >> 6) & 1) << 12) + (((bc >> 6) & 1) << 13)
        |    + (((bu >> 7) & 1) << 14) + (((bc >> 7) & 1) << 15) AS zval
        |  FROM b),
        |t AS (
        |  SELECT zval >> 10 AS tile, count(*) AS n_rows,
        |         min(user_id) AS min_user_id, max(user_id) AS max_user_id,
        |         min(cents) AS min_cents, max(cents) AS max_cents
        |  FROM z GROUP BY 1)
        |SELECT tile, n_rows, min_user_id, max_user_id, min_cents, max_cents,
        |       (2500 < min_cents OR 2500 > max_cents
        |        OR 42 < min_user_id OR 42 > max_user_id) AS skippable
        |FROM t ORDER BY tile""".stripMargin,

    // replays the full min-max chain on the cubed column to the exact
    // scan-ppm; the quantile layout's superiority is pinned as booleans
    "layout_zorder_skewed" ->
      """WITH c AS (
        |  SELECT user_id,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |e AS (SELECT user_id, cents * cents * cents AS skewed FROM c),
        |r AS (SELECT min(user_id) AS minu, max(user_id) AS maxu,
        |             min(skewed) AS mins, max(skewed) AS maxs FROM e),
        |b AS (
        |  SELECT user_id, skewed,
        |    CASE WHEN maxu = minu THEN 0
        |         ELSE ((user_id - minu) * 255) // (maxu - minu) END AS bu,
        |    CASE WHEN maxs = mins THEN 0
        |         ELSE ((skewed - mins) * 255) // (maxs - mins) END AS bs
        |  FROM e CROSS JOIN r),
        |z AS (
        |  SELECT skewed,
        |      (((bu >> 0) & 1) << 0) + (((bs >> 0) & 1) << 1)
        |    + (((bu >> 1) & 1) << 2) + (((bs >> 1) & 1) << 3)
        |    + (((bu >> 2) & 1) << 4) + (((bs >> 2) & 1) << 5)
        |    + (((bu >> 3) & 1) << 6) + (((bs >> 3) & 1) << 7)
        |    + (((bu >> 4) & 1) << 8) + (((bs >> 4) & 1) << 9)
        |    + (((bu >> 5) & 1) << 10) + (((bs >> 5) & 1) << 11)
        |    + (((bu >> 6) & 1) << 12) + (((bs >> 6) & 1) << 13)
        |    + (((bu >> 7) & 1) << 14) + (((bs >> 7) & 1) << 15) AS zval
        |  FROM b),
        |t AS (
        |  SELECT zval >> 10 AS tile, count(*) AS n_rows,
        |         min(skewed) AS min_s, max(skewed) AS max_s
        |  FROM z GROUP BY 1)
        |SELECT CAST(sum(CASE WHEN 40000000000 < min_s OR 40000000000 > max_s
        |                     THEN 0 ELSE n_rows END) AS BIGINT) * 1000000
        |         // CAST(sum(n_rows) AS BIGINT) AS minmax_scan_ppm,
        |       TRUE AS quantile_beats_minmax,
        |       TRUE AS quantile_scan_le_quarter
        |FROM t""".stripMargin,

    "q_ohlc" ->
      """WITH t AS (
        |  SELECT date_trunc('hour', ts) AS bucket, ts, event_id, value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY bucket
        |      ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY bucket
        |      ORDER BY ts DESC, event_id DESC) AS rz
        |  FROM t)
        |SELECT epoch_us(bucket) AS bucket_us,
        |       max(CASE WHEN ra = 1 THEN value END) AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       max(CASE WHEN rz = 1 THEN value END) AS close,
        |       count(*) AS volume
        |FROM r GROUP BY bucket
        |ORDER BY bucket_us""".stripMargin,

    "q_gapfill_locf" ->
      """WITH agg AS (
        |  SELECT date_trunc('hour', ts) AS bucket, event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |           / COUNT(value) AS avg_value,
        |         COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM agg),
        |axis AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |  FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events),
        |filled AS (
        |  SELECT a.bucket, t.event_type, g.avg_value,
        |         COALESCE(g.n_events, 0) AS n_events
        |  FROM axis a CROSS JOIN types t
        |  LEFT JOIN agg g ON g.bucket = a.bucket AND g.event_type = t.event_type)
        |SELECT epoch_us(bucket) AS bucket_us, event_type, n_events,
        |  last_value(avg_value IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
        |FROM filled ORDER BY bucket_us, event_type""".stripMargin,

    "q_customer_quartiles" ->
      """WITH t AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |         COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  SELECT t.*, c.c_nationkey
        |  FROM t JOIN customer c ON c.c_custkey = t.o_custkey)
        |SELECT o_custkey, c_nationkey, total_spend, n_orders,
        |  ntile(4) OVER (PARTITION BY c_nationkey
        |    ORDER BY total_spend DESC, o_custkey) AS quartile,
        |  percent_rank() OVER (PARTITION BY c_nationkey
        |    ORDER BY total_spend DESC, o_custkey) AS pct_rank
        |FROM j ORDER BY o_custkey""".stripMargin,

    "dedup_edit_distance" ->
      """WITH n AS (
        |  SELECT doc_id, lang,
        |         regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, lang, substring(norm, 1, 8) AS blk,
        |         substring(norm, 1, 40) AS cmp
        |  FROM n)
        |SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       levenshtein(a.cmp, b.cmp) AS edit_dist
        |FROM p a JOIN p b
        |  ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.cmp, b.cmp) <= 5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_min_cost_supplier" ->
      """WITH w AS (
        |  SELECT l_partkey, l_extendedprice, l_suppkey,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY l_extendedprice, l_suppkey) AS rn
        |  FROM lineitem)
        |SELECT w.l_partkey AS p_partkey, p.p_name,
        |       w.l_suppkey AS s_suppkey, s.s_name,
        |       w.l_extendedprice AS min_price
        |FROM w
        |JOIN part p ON p.p_partkey = w.l_partkey
        |JOIN supplier s ON s.s_suppkey = w.l_suppkey
        |WHERE w.rn = 1
        |ORDER BY p_partkey""".stripMargin,

    "q_lapsed_customers" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,

    // STRICT gap breaks (>=): Spark session_window merges an event only
    // while ts < last + gap
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |               OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS is_break
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts,
        |         SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM b)
        |SELECT user_id,
        |       epoch_us(MIN(ts)) AS session_start_us,
        |       epoch_us(MAX(ts)) AS session_end_us,
        |       COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    // integer Lloyd's replay: 3 unrolled assign+update rounds in exact
    // BIGINT arithmetic from md5-pinned seeds. Long-format (vec_id, d, v)
    // joins stand in for Spark's codegen'd array loops; '//' on the
    // non-negative sums equals Spark's floorDiv
    "embedding_kmeans" -> {
      s"""WITH q AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
         |  FROM embeddings),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
         |seeds AS (
         |  SELECT q, row_number() OVER (
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
         |  FROM q),
         |c0 AS (
         |  SELECT s.j, dims.d, s.q[dims.d] AS c
         |  FROM seeds s CROSS JOIN dims WHERE s.j < 8),
         |${lloydRoundSql(1)},
         |${lloydRoundSql(2)},
         |${lloydRoundSql(3)},
         |fd AS (
         |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
         |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
         |fa AS (
         |  SELECT vec_id, cluster, dist FROM (
         |    SELECT vec_id, j AS cluster, dist,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY dist, j) AS rn
         |    FROM fd) WHERE rn = 1),
         |stats AS (
         |  SELECT cluster, count(*) AS n, CAST(sum(dist) AS BIGINT) AS inertia
         |  FROM fa GROUP BY 1),
         |chk AS (
         |  SELECT j AS cluster, CAST(sum(d * c) AS BIGINT) AS centroid_checksum
         |  FROM c3 GROUP BY 1)
         |SELECT CAST(chk.cluster AS INT) AS cluster, COALESCE(stats.n, 0) AS n,
         |       COALESCE(stats.inertia, 0) AS inertia, chk.centroid_checksum
         |FROM chk LEFT JOIN stats USING (cluster)
         |ORDER BY cluster""".stripMargin
    },

    // Lloyd replay trained on the md5 train half (p = train-only long
    // format feeds the shared round CTEs; pall = everyone, assigned under
    // the final centroids); the split CASE is generated by the same
    // driver-side boundary helper the Spark plan uses
    // the lifecycle claims are the booleans; the only corpus-derived
    // value is the post-rebuild index size (corpus + the 500 skew adds)
    "embedding_index_drift_rebuild" ->
      """SELECT CAST(count(*) + 500 AS BIGINT) AS n_total,
        |       TRUE AS drift_exceeded, TRUE AS rebuilt,
        |       TRUE AS post_drift_zero, TRUE AS query_parity
        |FROM embeddings""".stripMargin,

    // the PQ lifecycle claims are the booleans; the corpus-derived value
    // is the post-rebuild index size (500-vector slice + 300 skew adds)
    "embedding_pq_drift_rebuild" ->
      """SELECT CAST(count(*) + 300 AS BIGINT) AS n_total,
        |       TRUE AS drift_exceeded, TRUE AS rebuilt,
        |       TRUE AS post_drift_zero, TRUE AS query_parity
        |FROM embeddings WHERE vec_id < 500""".stripMargin,

    // clones share all 16 of the source's band buckets and nothing else
    // grows; the census must survive compaction bit for bit
    "embedding_lsh_bucket_drift" ->
      """SELECT CAST(8 AS BIGINT) AS n_buckets_grown,
        |       TRUE AS grown_eq_bands, TRUE AS growth_exceeds,
        |       TRUE AS census_stable_across_compaction""".stripMargin,

    // the text-census lifecycle claims are the booleans; the
    // corpus-derived value is the build-time posting total (distinct
    // (doc, token) pairs of the base slice — the oracle recomputes it
    // from raw text), and the 300 single-token skew docs contribute
    // exactly 300 postings into exactly one bucket
    "text_index_bucket_drift" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\s+', ' ', 'g'), ' ')) AS token
        |    FROM documents WHERE doc_id < 500) WHERE token <> '')
        |SELECT (SELECT count(*) FROM toks) AS base_postings,
        |       CAST(1 AS BIGINT) AS n_buckets_grown,
        |       TRUE AS grown_is_one,
        |       CAST(300 AS BIGINT) AS grown_postings,
        |       TRUE AS census_stable_across_compaction""".stripMargin,

    "embedding_occupancy_drift" -> {
      val splitCase = Assembly.hashSplitOracleCase(
        "vec_id", Seq("train" -> 0.5, "live" -> 0.5), "drift")
      s"""WITH q AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q,
         |         $splitCase AS split
         |  FROM embeddings),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |p AS (SELECT vec_id, d, q[d] AS v
         |      FROM q CROSS JOIN dims WHERE q.split = 'train'),
         |pall AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
         |seeds AS (
         |  SELECT q, row_number() OVER (
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
         |  FROM q WHERE split = 'train'),
         |c0 AS (
         |  SELECT s.j, dims.d, s.q[dims.d] AS c
         |  FROM seeds s CROSS JOIN dims WHERE s.j < 8),
         |${lloydRoundSql(1)},
         |${lloydRoundSql(2)},
         |${lloydRoundSql(3)},
         |fd AS (
         |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
         |  FROM pall p JOIN c3 c USING (d) GROUP BY 1, 2),
         |fa AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, j AS cluster,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY dist, j) AS rn
         |    FROM fd) WHERE rn = 1),
         |counts AS (
         |  SELECT fa.cluster,
         |         CAST(sum(CASE WHEN q.split = 'train' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_train,
         |         CAST(sum(CASE WHEN q.split = 'live' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_live
         |  FROM fa JOIN q USING (vec_id) GROUP BY 1),
         |cl AS (SELECT DISTINCT j AS cluster FROM c0)
         |SELECT CAST(cl.cluster AS INT) AS cluster,
         |       COALESCE(counts.n_train, 0) AS n_train,
         |       COALESCE(counts.n_live, 0) AS n_live
         |FROM cl LEFT JOIN counts USING (cluster)
         |ORDER BY cluster""".stripMargin
    },

    // same Lloyd replay + label join + windowed majority flag
    "embedding_cluster_purity" -> {
      s"""WITH q AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
         |  FROM embeddings),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
         |seeds AS (
         |  SELECT q, row_number() OVER (
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
         |  FROM q),
         |c0 AS (
         |  SELECT s.j, dims.d, s.q[dims.d] AS c
         |  FROM seeds s CROSS JOIN dims WHERE s.j < 8),
         |${lloydRoundSql(1)},
         |${lloydRoundSql(2)},
         |${lloydRoundSql(3)},
         |fd AS (
         |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
         |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
         |fa AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, j AS cluster,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY dist, j) AS rn
         |    FROM fd) WHERE rn = 1),
         |counts AS (
         |  SELECT fa.cluster, e.label, count(*) AS n
         |  FROM fa JOIN embeddings e USING (vec_id)
         |  GROUP BY 1, 2)
         |SELECT CAST(cluster AS INT) AS cluster, label, n,
         |       CAST(sum(n) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_n,
         |       row_number() OVER (PARTITION BY cluster
         |                          ORDER BY n DESC, label) = 1 AS is_majority
         |FROM counts
         |ORDER BY cluster, label""".stripMargin
    },

    // identical quantization lattice + md5-pinned probe sample; neighbor
    // sets by (dist, vec_id), votes by (count desc, label) — replayable
    "embedding_knn_label" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |pr AS (
        |  SELECT vec_id AS probe_id, label AS true_label, q AS pq FROM (
        |    SELECT *, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |    FROM q) WHERE rn <= 200),
        |d AS (
        |  SELECT pr.probe_id, pr.true_label, q.vec_id, q.label,
        |         list_sum(list_transform(range(1, 65),
        |           i -> (q.q[i] - pr.pq[i]) * (q.q[i] - pr.pq[i]))) AS dist
        |  FROM q JOIN pr ON q.vec_id <> pr.probe_id),
        |tk AS (
        |  SELECT probe_id, true_label, label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY probe_id
        |                                 ORDER BY dist, vec_id) AS rn
        |    FROM d) WHERE rn <= 5),
        |v AS (
        |  SELECT probe_id, true_label, label, count(*) AS n_votes
        |  FROM tk GROUP BY 1, 2, 3)
        |SELECT probe_id, true_label, label AS predicted_label, n_votes,
        |       label = true_label AS correct
        |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
        |                                   ORDER BY n_votes DESC, label) AS vr
        |      FROM v) WHERE vr = 1
        |ORDER BY probe_id""".stripMargin,

    // Lloyd replay + per-cell pinned (md5, id) quota picks
    "curation_diverse_sample" -> {
      s"""WITH q AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
         |  FROM embeddings),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
         |seeds AS (
         |  SELECT q, row_number() OVER (
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
         |  FROM q),
         |c0 AS (
         |  SELECT s.j, dims.d, s.q[dims.d] AS c
         |  FROM seeds s CROSS JOIN dims WHERE s.j < 8),
         |${lloydRoundSql(1)},
         |${lloydRoundSql(2)},
         |${lloydRoundSql(3)},
         |fd AS (
         |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
         |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
         |fa AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, j AS cluster,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY dist, j) AS rn
         |    FROM fd) WHERE rn = 1)
         |SELECT vec_id, CAST(cluster AS INT) AS cluster, pick_rank
         |FROM (SELECT vec_id, cluster,
         |             CAST(row_number() OVER (PARTITION BY cluster
         |               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
         |               AS BIGINT) AS pick_rank
         |      FROM fa) WHERE pick_rank <= 10
         |ORDER BY cluster, pick_rank""".stripMargin
    },

    // full integer-exact SemDeDup replay: the kmeans rounds above, the
    // final assignment, centered-512 quantized-cosine pairs (long-only
    // threshold: den²·dot² vs num²·|a|²·|b|²), recursive-CTE components,
    // min-id survivors
    "dedup_semdedup_kmeans" -> {
      s"""WITH RECURSIVE q AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> CAST(round(x * 512) AS BIGINT)) AS qc
         |  FROM embeddings),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
         |seeds AS (
         |  SELECT q, row_number() OVER (
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
         |  FROM q),
         |c0 AS (
         |  SELECT s.j, dims.d, s.q[dims.d] AS c
         |  FROM seeds s CROSS JOIN dims WHERE s.j < 8),
         |${lloydRoundSql(1)},
         |${lloydRoundSql(2)},
         |${lloydRoundSql(3)},
         |fd AS (
         |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
         |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
         |fa AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, j AS cluster,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY dist, j) AS rn
         |    FROM fd) WHERE rn = 1),
         |pc AS (SELECT vec_id, d, qc[d] AS v FROM q CROSS JOIN dims),
         |nrm AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS nrm
         |        FROM pc GROUP BY 1),
         |dots AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         CAST(sum(pa.v * pb.v) AS BIGINT) AS dot
         |  FROM fa a JOIN fa b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  JOIN pc pa ON pa.vec_id = a.vec_id
         |  JOIN pc pb ON pb.vec_id = b.vec_id AND pb.d = pa.d
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT s.vec_a, s.vec_b
         |  FROM dots s
         |  JOIN nrm na ON na.vec_id = s.vec_a
         |  JOIN nrm nb ON nb.vec_id = s.vec_b
         |  WHERE s.dot > 0 AND na.nrm > 0 AND nb.nrm > 0
         |    AND s.dot * s.dot * 10000 >= na.nrm * nb.nrm * 1225),
         |edges AS (
         |  SELECT vec_a AS u, vec_b AS v FROM pairs
         |  UNION SELECT vec_b, vec_a FROM pairs),
         |reach AS (
         |  SELECT u AS node, u AS comp FROM edges
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node)
         |SELECT fa.vec_id, CAST(fa.cluster AS INT) AS cell,
         |       COALESCE(cc.component, fa.vec_id) AS component,
         |       (COALESCE(cc.component, fa.vec_id) = fa.vec_id) AS kept
         |FROM fa LEFT JOIN cc ON cc.node = fa.vec_id
         |ORDER BY fa.vec_id""".stripMargin
    },

    "embedding_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |         list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |           x -> abs(x))) AS mx
        |  FROM embeddings)
        |SELECT vec_id, mx / 127.0 AS scale,
        |  to_json(CASE WHEN mx = 0 THEN list_transform(e, x -> CAST(0 AS TINYINT))
        |       ELSE list_transform(e, x -> CAST(round(x * 127.0 / mx) AS TINYINT))
        |  END) AS qvec_json
        |FROM m ORDER BY vec_id""".stripMargin,

    "text_pmi" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |present AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, token FROM raw WHERE token <> ''),
        |dft AS MATERIALIZED (
        |  SELECT token, count(*) AS df FROM present GROUP BY 1),
        |kept AS MATERIALIZED (
        |  SELECT p.doc_id, p.token, d.df FROM present p
        |  JOIN dft d USING (token) WHERE d.df >= 5),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.token AS token_a, b.token AS token_b,
        |         a.df AS df_a, b.df AS df_b, count(*) AS df_ab
        |  FROM kept a JOIN kept b
        |    ON a.doc_id = b.doc_id AND a.token < b.token
        |  GROUP BY 1, 2, 3, 4)
        |SELECT token_a, token_b, df_ab, df_a, df_b,
        |       CAST((CAST(df_ab AS HUGEINT) * 1000000 * nd.n_docs)
        |            // (CAST(df_a AS HUGEINT) * df_b) AS BIGINT) AS pmi_ratio_ppm
        |FROM pairs, nd
        |WHERE df_ab >= 5
        |ORDER BY token_a, token_b""".stripMargin,

    "text_keywords_textrank" -> {
      val idA = md5PrefixLongSql("token_a")
      val idB = md5PrefixLongSql("token_b")
      val idT = md5PrefixLongSql("token")
      val steps = (1 to 10).map { i =>
        s"""pr$i AS MATERIALIZED (
           |  SELECT n.node,
           |         CAST(150000 + coalesce(
           |           sum((p.mass * 85) // (100 * o.outdeg)), 0) AS BIGINT)
           |           AS mass
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.node
           |  LEFT JOIN pr${i - 1} p ON p.node = e.src
           |  LEFT JOIN outdeg o ON o.src = e.src
           |  GROUP BY n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
         |      '\\s+', ' ', 'g'), ' ')) AS token
         |  FROM documents),
         |present AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, token FROM raw WHERE token <> ''),
         |dft AS MATERIALIZED (
         |  SELECT token, count(*) AS df FROM present GROUP BY 1),
         |kept AS MATERIALIZED (
         |  SELECT p.doc_id, p.token FROM present p
         |  JOIN dft d USING (token) WHERE d.df >= 5),
         |tp AS MATERIALIZED (
         |  SELECT a.token AS token_a, b.token AS token_b
         |  FROM kept a JOIN kept b
         |    ON a.doc_id = b.doc_id AND a.token < b.token
         |  GROUP BY 1, 2 HAVING count(*) >= 5),
         |edges AS MATERIALIZED (
         |  SELECT $idA AS src, $idB AS dst FROM tp
         |  UNION ALL
         |  SELECT $idB, $idA FROM tp),
         |outdeg AS MATERIALIZED (
         |  SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
         |pr0 AS MATERIALIZED (
         |  SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
         |$steps,
         |tid AS (
         |  SELECT token, $idT AS node FROM (
         |    SELECT DISTINCT token FROM (
         |      SELECT token_a AS token FROM tp
         |      UNION ALL SELECT token_b FROM tp)))
         |SELECT token, mass,
         |       CAST(row_number() OVER (ORDER BY mass DESC, token)
         |            AS BIGINT) AS kw_rank
         |FROM pr10 JOIN tid USING (node)
         |ORDER BY mass DESC, token LIMIT 20""".stripMargin
    },

    "text_token_freq" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM toks WHERE token <> ''
        |GROUP BY token
        |ORDER BY tf DESC, token LIMIT 50""".stripMargin,

    "text_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf
        |       FROM toks WHERE token <> '' GROUP BY doc_id, token),
        |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df
        |          FROM toks WHERE token <> '' GROUP BY token)
        |SELECT doc_id, token, tf, df FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, dfreq.df ASC, tf.token) AS rn
        |  FROM tf JOIN dfreq USING (token)) t
        |WHERE rn <= 3 ORDER BY doc_id, token""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g')) AS content_key,
        |       min(doc_id) AS keep_doc_id, count(*) AS n_members
        |FROM documents
        |GROUP BY 1 ORDER BY content_key""".stripMargin,

    // brute-force within lang: the Spark side prunes via exact prefix
    // filtering, which provably returns the identical pair set, so the
    // oracle needs no blocking beyond the (implied) size-ratio filter
    "dedup_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id, lang,
        |    list_distinct(CASE WHEN length(norm) >= 3
        |      THEN [substring(norm, i, 3) for i in range(1, length(norm) - 1)]
        |      ELSE [norm] END) AS grams
        |  FROM (SELECT doc_id, lang,
        |          regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g') AS norm
        |        FROM documents) t)
        |SELECT lang, doc_a, doc_b, jaccard FROM (
        |  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
        |         - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) AS jaccard
        |  FROM g a JOIN g b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id
        |   AND least(len(a.grams), len(b.grams)) + 1e-9
        |       >= greatest(len(a.grams), len(b.grams)) * 0.8) p
        |WHERE jaccard >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // brute-force directional containment over string word-3-shingles;
    // the integer boundary (shared*100 >= 60*n_a) mirrors the Spark
    // filter exactly, and the ratio is one int/int IEEE division
    "dedup_containment" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g'), ' ') AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(words) >= 3
        |    THEN [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
        |    ELSE [array_to_string(words, ' ')] END) AS sh
        |  FROM w)
        |SELECT doc_a, doc_b, n_a, shared,
        |       CAST(shared AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
        |FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         CAST(len(a.sh) AS BIGINT) AS n_a,
        |         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS shared
        |  FROM g a JOIN g b ON a.doc_id <> b.doc_id) p
        |WHERE shared * 100 >= 60 * n_a
        |ORDER BY doc_a, doc_b""".stripMargin,

    // exact union-set Jaccard per source pair recomputed from string
    // shingles; the signature-estimate error claim is pinned TRUE
    "dedup_group_minhash" ->
      """WITH w AS (
        |  SELECT source,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g'), ' ') AS words
        |  FROM documents),
        |d AS (
        |  SELECT source, list_distinct(CASE WHEN len(words) >= 3
        |    THEN [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
        |    ELSE [array_to_string(words, ' ')] END) AS sh
        |  FROM w),
        |su AS (
        |  SELECT source, list_distinct(flatten(list(sh))) AS sh FROM d GROUP BY source)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    AS exact_jaccard,
        |  TRUE AS est_within_bound
        |FROM su a JOIN su b ON a.source < b.source
        |ORDER BY source_a, source_b""".stripMargin,

    // exact-duplicate pair count recomputed from normalized text alone;
    // the detected-at-hamming-0 completeness claim (a theorem of the
    // simhash pipeline, see the query comment) is pinned TRUE
    "dedup_simhash" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g') AS k
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact_dup_pairs,
        |       TRUE AS dups_all_detected_hamming0
        |FROM n a JOIN n b ON a.k = b.k AND a.doc_id < b.doc_id""".stripMargin,

    // exact word-3-shingle pair count recomputed from string shingles;
    // the LSH recall / no-false-positive claims are pinned TRUE
    "dedup_minhash" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g'), ' ') AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(words) >= 3
        |    THEN [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]
        |    ELSE [array_to_string(words, ' ')] END) AS sh
        |  FROM w),
        |p AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM g a JOIN g b
        |    ON a.doc_id < b.doc_id
        |   AND least(len(a.sh), len(b.sh)) + 1e-9 >= greatest(len(a.sh), len(b.sh)) * 0.8
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (CAST(len(a.sh) AS DOUBLE) + CAST(len(b.sh) AS DOUBLE)
        |           - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)) >= 0.8)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
        |       TRUE AS recall_ge_floor, TRUE AS no_false_positives
        |FROM p""".stripMargin,

    "dedup_embedding_pairs" ->
      """WITH v AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,

    // brute-force pairs at the loosest cut, then per-threshold counts;
    // t compares as pct/100.0 (correctly-rounded division == the double
    // literal the Spark side filters on)
    "dedup_threshold_sweep" ->
      """WITH g AS (
        |  SELECT doc_id, lang,
        |    list_distinct(CASE WHEN length(norm) >= 3
        |      THEN [substring(norm, i, 3) for i in range(1, length(norm) - 1)]
        |      ELSE [norm] END) AS grams
        |  FROM (SELECT doc_id, lang,
        |          regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g') AS norm
        |        FROM documents) t),
        |p AS (
        |  SELECT doc_a, doc_b, jaccard FROM (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |      CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |        / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
        |           - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) AS jaccard
        |    FROM g a JOIN g b
        |      ON a.lang = b.lang AND a.doc_id < b.doc_id
        |     AND least(len(a.grams), len(b.grams)) + 1e-9
        |         >= greatest(len(a.grams), len(b.grams)) * 0.7) q
        |  WHERE jaccard >= 0.7),
        |th AS (SELECT unnest([70, 80, 90]) AS threshold_pct),
        |m AS (
        |  SELECT th.threshold_pct, p.doc_a, p.doc_b
        |  FROM th JOIN p ON p.jaccard >= th.threshold_pct / 100.0),
        |np AS (SELECT threshold_pct, count(*) AS n_pairs FROM m GROUP BY 1),
        |nd AS (
        |  SELECT threshold_pct, count(DISTINCT d) AS n_docs FROM (
        |    SELECT threshold_pct, unnest([doc_a, doc_b]) AS d FROM m)
        |  GROUP BY 1)
        |SELECT CAST(th.threshold_pct AS INT) AS threshold_pct,
        |       COALESCE(np.n_pairs, 0) AS n_pairs,
        |       COALESCE(nd.n_docs, 0) AS n_docs
        |FROM th LEFT JOIN np USING (threshold_pct)
        |        LEFT JOIN nd USING (threshold_pct)
        |ORDER BY threshold_pct""".stripMargin,

    // reachability closure over the symmetrized brute-force pair set at
    // t=0.7 (shared prefix: ngramCcSqlPrefix); UNION (not UNION ALL)
    // dedups rows so the recursion reaches a fixpoint; min over reachable
    // nodes = the component's min doc_id
    "dedup_clusters" -> {
      s"""$ngramCcSqlPrefix
         |SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS component
         |FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // the SAME reachability closure (one definition, shared prefix),
    // rolled up to the audit histogram (component -> size ->
    // clusters-at-size, singletons included)
    "dedup_cluster_sizes" -> {
      s"""$ngramCcSqlPrefix,
         |assigned AS (
         |  SELECT COALESCE(cc.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id),
         |sizes AS (
         |  SELECT component, count(*) AS cluster_size
         |  FROM assigned GROUP BY 1)
         |SELECT cluster_size, count(*) AS n_clusters
         |FROM sizes GROUP BY 1 ORDER BY cluster_size""".stripMargin
    },

    // synchronous min-tie LPA unrolled to 5 rounds; per-round argmax =
    // row_number (cnt DESC, label) — the twin of Spark's struct-max
    "graph_communities" -> {
      def round(t: Int): String =
        s"""v$t AS (
           |  SELECT e.dst AS node, l.label, count(*) AS cnt
           |  FROM edges e JOIN lp${t - 1} l ON e.src = l.node
           |  GROUP BY 1, 2),
           |lp$t AS (
           |  SELECT node, label FROM (
           |    SELECT *, row_number() OVER (PARTITION BY node
           |                                 ORDER BY cnt DESC, label) AS rn
           |    FROM v$t) WHERE rn = 1)""".stripMargin
      val rounds = (1 to 20).map(round).mkString(",\n")
      s"""WITH $coPurchaseEdgesSql,
         |edges AS (
         |  SELECT u AS src, v AS dst FROM e0
         |  UNION ALL SELECT v, u FROM e0),
         |lp0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
         |$rounds
         |SELECT node, label AS community FROM lp20
         |ORDER BY node""".stripMargin
    },

    // degree-oriented triangle counting replayed with plain joins; row
    // comparisons (a,b) < (c,d) mirror Spark's struct comparison
    "graph_triangles" -> {
      s"""WITH $coPurchaseEdgesSql,
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
         |  GROUP BY 1),
         |o AS (
         |  SELECT CASE WHEN (du.deg, e0.u) < (dv.deg, e0.v)
         |              THEN e0.u ELSE e0.v END AS src,
         |         CASE WHEN (du.deg, e0.u) < (dv.deg, e0.v)
         |              THEN e0.v ELSE e0.u END AS dst,
         |         CASE WHEN (du.deg, e0.u) < (dv.deg, e0.v)
         |              THEN dv.deg ELSE du.deg END AS ddst
         |  FROM e0 JOIN deg du ON e0.u = du.node
         |          JOIN deg dv ON e0.v = dv.node),
         |w AS (
         |  SELECT o1.dst AS w1, o2.dst AS w2
         |  FROM o o1 JOIN o o2 ON o1.src = o2.src
         |  WHERE (o1.ddst, o1.dst) < (o2.ddst, o2.dst)),
         |t AS (
         |  SELECT count(*) AS n_triangles
         |  FROM w JOIN o ON w.w1 = o.src AND w.w2 = o.dst)
         |SELECT (SELECT count(*) FROM deg) AS n_nodes,
         |       (SELECT count(*) FROM e0) AS n_edges,
         |       (SELECT max(deg) FROM deg) AS max_degree,
         |       n_triangles
         |FROM t""".stripMargin
    },

    // DOULION sparsified census on the FULL co-purchase graph: the
    // md5-top-16-bit coin replayed via strpos arithmetic, then the exact
    // oriented-wedge count on the surviving edges, scaled by 4³
    "graph_triangles_approx" -> {
      val coin = md5PrefixLongSql(
        "CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)", 4)
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0 AS (
         |  SELECT DISTINCT a.p AS u, b.p AS v
         |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
         |es AS (
         |  SELECT u, v FROM e0
         |  WHERE $coin % 4 = 0),
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT u AS node FROM es UNION ALL SELECT v FROM es)
         |  GROUP BY 1),
         |o AS (
         |  SELECT CASE WHEN (du.deg, es.u) < (dv.deg, es.v)
         |              THEN es.u ELSE es.v END AS src,
         |         CASE WHEN (du.deg, es.u) < (dv.deg, es.v)
         |              THEN es.v ELSE es.u END AS dst,
         |         CASE WHEN (du.deg, es.u) < (dv.deg, es.v)
         |              THEN dv.deg ELSE du.deg END AS ddst
         |  FROM es JOIN deg du ON es.u = du.node
         |          JOIN deg dv ON es.v = dv.node),
         |w AS (
         |  SELECT o1.dst AS w1, o2.dst AS w2
         |  FROM o o1 JOIN o o2 ON o1.src = o2.src
         |  WHERE (o1.ddst, o1.dst) < (o2.ddst, o2.dst)),
         |t AS (
         |  SELECT count(*) AS n_triangles_sampled
         |  FROM w JOIN o ON w.w1 = o.src AND w.w2 = o.dst)
         |SELECT (SELECT count(*) FROM e0) AS n_edges,
         |       CAST(4 AS BIGINT) AS sample_denom,
         |       (SELECT count(*) FROM es) AS n_edges_sampled,
         |       n_triangles_sampled,
         |       n_triangles_sampled * 64 AS est_triangles
         |FROM t""".stripMargin
    },

    // Matula–Beck peel unrolled to 16 rounds (fixed point at 11 on this
    // corpus; monotone shrink ⇒ extra rounds are the identity, so the
    // cap-unrolled replay equals the engine's early-stopped core)
    "graph_kcore" -> {
      // every ke/n CTE is referenced 2-3 times downstream — MATERIALIZED
      // stops DuckDB from inlining the chain (3^16 blow-up otherwise)
      def round(t: Int): String =
        s"""d$t AS MATERIALIZED (
           |  SELECT node, count(*) AS deg FROM (
           |    SELECT u AS node FROM ke${t - 1}
           |    UNION ALL SELECT v FROM ke${t - 1})
           |  GROUP BY 1),
           |n$t AS MATERIALIZED (SELECT node FROM d$t WHERE deg >= 3),
           |ke$t AS MATERIALIZED (
           |  SELECT e.u, e.v FROM ke${t - 1} e
           |  JOIN n$t a ON e.u = a.node
           |  JOIN n$t b ON e.v = b.node)""".stripMargin
      val rounds = (1 to 16).map(round).mkString(",\n")
      s"""WITH $weightedCoPurchaseEdgesSql,
         |ke0 AS MATERIALIZED (SELECT u, v FROM we0),
         |$rounds
         |SELECT node, count(*) AS core_degree FROM (
         |  SELECT u AS node FROM ke16 UNION ALL SELECT v FROM ke16)
         |GROUP BY 1 ORDER BY node""".stripMargin
    },

    // neighborhood link scores on the same weighted graph: wedge
    // self-join → common counts (HAVING ≥ 2) → degree joins → integer
    // ppm Jaccard + is-edge flag
    "graph_common_neighbors" -> {
      s"""WITH $weightedCoPurchaseEdgesSql,
         |sym AS (
         |  SELECT u AS w, v AS x FROM we0
         |  UNION ALL SELECT v, u FROM we0),
         |cn AS (
         |  SELECT s1.x AS a, s2.x AS b, count(*) AS common
         |  FROM sym s1 JOIN sym s2 ON s1.w = s2.w AND s1.x < s2.x
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |deg AS (SELECT w AS node, count(*) AS deg FROM sym GROUP BY 1)
         |SELECT cn.a AS node_a, cn.b AS node_b, cn.common,
         |       da.deg AS deg_a, db.deg AS deg_b,
         |       cn.common * 1000000 // (da.deg + db.deg - cn.common)
         |         AS jaccard_ppm,
         |       COALESCE(e.is_edge, false) AS is_edge
         |FROM cn JOIN deg da ON cn.a = da.node
         |        JOIN deg db ON cn.b = db.node
         |LEFT JOIN (SELECT u, v, true AS is_edge FROM we0) e
         |       ON cn.a = e.u AND cn.b = e.v
         |ORDER BY node_a, node_b""".stripMargin
    },

    // same graph derivation; the 10 fixed iterations are UNROLLED as
    // chained CTEs (pr1..pr10) because the recurrence aggregates over the
    // previous frontier, which recursive CTEs can't express portably —
    // `//` is DuckDB integer division, the twin of Spark SQL's `div`
    "graph_pagerank" -> {
      val header =
        """WITH pairs AS (
          |  SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS a,
          |                  CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS b
          |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          |edges AS (
          |  SELECT a AS src, b AS dst FROM pairs
          |  UNION ALL
          |  SELECT b AS src, a AS dst FROM pairs),
          |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
          |nodes AS (SELECT DISTINCT src AS node FROM edges
          |          UNION SELECT DISTINCT dst AS node FROM edges),
          |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes)""".stripMargin
      val steps = (1 to 10).map { i =>
        s"""pr$i AS (
           |  SELECT n.node,
           |         CAST(150000 + coalesce(
           |           sum((p.mass * 85) // (100 * o.outdeg)), 0) AS BIGINT) AS mass
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.node
           |  LEFT JOIN pr${i - 1} p ON p.node = e.src
           |  LEFT JOIN outdeg o ON o.src = e.src
           |  GROUP BY n.node)""".stripMargin
      }.mkString(",\n")
      header + ",\n" + steps + "\nSELECT node, mass FROM pr10 ORDER BY node"
    },

    // directed graph, dangling (supplier) mass redistributed uniformly:
    // per unrolled step a scalar CTE computes the previous round's
    // dangling sum D and each node receives (D*85) // (100*N) on top of
    // base + in-edge contributions — Spark's (d*num)/(den*N) Long
    // truncation equals DuckDB's // floor because d >= 0. Unrolled to
    // the CAP (10): a fixed point persists under the map, so this equals
    // the converged Spark result whichever round convergence happened.
    // MATERIALIZED is load-bearing: each pr_{i-1} is referenced by BOTH
    // d_i and pr_i, and DuckDB 1.0 inlines plain CTEs — the un-hinted
    // query re-expands the whole chain per reference (2^steps blowup).
    "graph_pagerank_dangling" -> {
      val header =
        """WITH edges AS MATERIALIZED (
          |  SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS src,
          |                  CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
          |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          |outdeg AS MATERIALIZED (
          |  SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
          |nodes AS MATERIALIZED (
          |  SELECT DISTINCT src AS node FROM edges
          |  UNION SELECT DISTINCT dst AS node FROM edges),
          |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
          |pr0 AS MATERIALIZED (
          |  SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes)""".stripMargin
      val steps = (1 to 10).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT (coalesce(sum(mass), 0) * 85) // (100 * (SELECT n FROM nn)) AS s
           |  FROM pr${i - 1}
           |  WHERE node NOT IN (SELECT src FROM outdeg)),
           |pr$i AS MATERIALIZED (
           |  SELECT n.node,
           |         CAST(150000 + (SELECT s FROM d$i) + coalesce(
           |           sum((p.mass * 85) // (100 * o.outdeg)), 0) AS BIGINT) AS mass
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.node
           |  LEFT JOIN pr${i - 1} p ON p.node = e.src
           |  LEFT JOIN outdeg o ON o.src = e.src
           |  GROUP BY n.node)""".stripMargin
      }.mkString(",\n")
      header + ",\n" + steps + "\nSELECT node, mass FROM pr10 ORDER BY node"
    },

    // SemDeDup oracle: brute-force within-label cosine pairs at the same
    // threshold, recursive-CTE reachability closure, min reachable id =
    // component, kept = (vec_id == component)
    "dedup_semantic" ->
      """WITH RECURSIVE v AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.e, b.e) >= 0.35),
        |edges AS (
        |  SELECT va AS u, vb AS w FROM pairs
        |  UNION SELECT vb, va FROM pairs),
        |reach AS (
        |  SELECT u AS node, u AS comp FROM edges
        |  UNION
        |  SELECT e.w, r.comp FROM reach r JOIN edges e ON e.u = r.node),
        |cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node)
        |SELECT m.vec_id, m.label,
        |       COALESCE(cc.component, m.vec_id) AS component,
        |       (m.vec_id = COALESCE(cc.component, m.vec_id)) AS kept
        |FROM embeddings m LEFT JOIN cc ON cc.node = m.vec_id
        |ORDER BY m.vec_id""".stripMargin,

    "dedup_embedding_nn" ->
      """WITH v AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT label, vec_id, nn_vec_id FROM (
        |  SELECT a.label, a.vec_id, b.vec_id AS nn_vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |      ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.vec_id) AS rn
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id) t
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // the dispatcher must take the exact path on this isotropic corpus,
    // and that path must equal the exact NN — one oracle checks both
    "dedup_embedding_nn_ann" ->
      """WITH v AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT label, vec_id, nn_vec_id FROM (
        |  SELECT a.label, a.vec_id, b.vec_id AS nn_vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |      ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.vec_id) AS rn
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id) t
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // recall audits: result-count and recall-vs-exact-top-k claims pinned
    // TRUE (the listings themselves are hash-plane / centroid dependent)
    "similarity_ann_lsh" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ge_floor
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,

    "similarity_ann_ivf" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ge_floor
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,

    "similarity_ann_ivfpq" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ge_floor
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,

    "similarity_ann_ivfpq_residual" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ge_floor
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,

    "similarity_ann_serve" ->
      """SELECT vec_id + 1000000 AS query_id, CAST(10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ge_floor
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,

    "similarity_ann_serve_pq" ->
      """SELECT vec_id + 1000000 AS query_id, CAST(10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ge_floor
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,

    "similarity_ann_serve_lsh" ->
      """SELECT vec_id + 1000000 AS query_id, CAST(10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ge_floor
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,

    // the asserted facts are the booleans; recall counting happens
    // in-plan on the Spark side (FALSE on either ⇒ hash mismatch ⇒ the
    // residual refinement stopped beating flat codes on clustered data)
    "similarity_ann_residual_clustered" ->
      """SELECT 'clustered' AS corpus, TRUE AS residual_wins,
        |       TRUE AS residual_recall_ge_20""".stripMargin,

    // full PQ replay: per-subspace integer Lloyd (2 unrolled rounds over
    // (vec, sub, j) with the same md5 seeds), final-codebook encoding
    // (pa3), per-probe distance tables from c2, ADC = Σ_sub table hit —
    // every CTE MATERIALIZED (each feeds 2+ consumers)
    "similarity_ann_pq" -> {
      def pqRound(t: Int): String =
        s"""pd$t AS MATERIALIZED (
           |  SELECT p.vec_id, p.sub, c.j,
           |         sum((p.v - c.c)*(p.v - c.c)) AS dist
           |  FROM p JOIN c${t - 1} c USING (d) GROUP BY 1, 2, 3),
           |pa$t AS MATERIALIZED (
           |  SELECT vec_id, sub, j AS code FROM (
           |    SELECT vec_id, sub, j,
           |           row_number() OVER (PARTITION BY vec_id, sub
           |                              ORDER BY dist, j) AS rn
           |    FROM pd$t) WHERE rn = 1)""".stripMargin
      def pqUpdate(t: Int): String =
        s"""c$t AS MATERIALIZED (
           |  SELECT o.j, o.d, COALESCE(CAST(u.s // u.n AS BIGINT), o.c) AS c
           |  FROM c${t - 1} o LEFT JOIN (
           |    SELECT a.code AS j, p.d, CAST(sum(p.v) AS BIGINT) AS s,
           |           count(*) AS n
           |    FROM p JOIN pa$t a
           |      ON p.vec_id = a.vec_id AND p.sub = a.sub
           |    GROUP BY 1, 2) u
           |    ON o.j = u.j AND o.d = u.d)""".stripMargin
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS qv
         |  FROM embeddings),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |p AS MATERIALIZED (
         |  SELECT vec_id, d, (d - 1) // 8 AS sub, qv[d] AS v
         |  FROM q CROSS JOIN dims),
         |seeds AS MATERIALIZED (
         |  SELECT qv, row_number() OVER (
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
         |  FROM q),
         |c0 AS MATERIALIZED (
         |  SELECT s.j, dims.d, s.qv[dims.d] AS c
         |  FROM seeds s CROSS JOIN dims WHERE s.j < 16),
         |${pqRound(1)},
         |${pqUpdate(1)},
         |${pqRound(2)},
         |${pqUpdate(2)},
         |${pqRound(3)},
         |probes AS MATERIALIZED (
         |  SELECT vec_id AS probe_id FROM q
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
         |dt AS MATERIALIZED (
         |  SELECT pr.probe_id, p.sub, c.j,
         |         sum((p.v - c.c)*(p.v - c.c)) AS pd
         |  FROM probes pr
         |  JOIN p ON p.vec_id = pr.probe_id
         |  JOIN c2 c ON p.d = c.d
         |  GROUP BY 1, 2, 3),
         |adc AS MATERIALIZED (
         |  SELECT d.probe_id, a.vec_id, CAST(sum(d.pd) AS BIGINT) AS adc_dist
         |  FROM pa3 a JOIN dt d ON a.sub = d.sub AND a.code = d.j
         |  WHERE a.vec_id <> d.probe_id
         |  GROUP BY 1, 2)
         |SELECT probe_id, CAST(rn AS BIGINT) AS rank, vec_id, adc_dist
         |FROM (
         |  SELECT probe_id, vec_id, adc_dist,
         |         row_number() OVER (PARTITION BY probe_id
         |                            ORDER BY adc_dist, vec_id) AS rn
         |  FROM adc) WHERE rn <= 5
         |ORDER BY probe_id, rank""".stripMargin
    },

    "similarity_ann_ivf_exact" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ge_floor
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |               OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS is_break
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM b)
        |SELECT user_id, session_id,
        |       epoch_us(MIN(ts)) AS session_start_us,
        |       epoch_us(MAX(ts)) AS session_end_us,
        |       COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_range_join" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS t_us, user_id FROM events),
        |w AS (SELECT user_id,
        |             epoch_us(ts) - 300000000 AS ws,
        |             epoch_us(ts) + 300000000 AS we
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.t_us AS ts_us, e.user_id,
        |       COALESCE(m.n, 0) AS n_windows
        |FROM e LEFT JOIN (
        |  SELECT e2.event_id, COUNT(*) AS n
        |  FROM e e2 JOIN w ON e2.user_id = w.user_id
        |                  AND e2.t_us BETWEEN w.ws AND w.we
        |  GROUP BY e2.event_id) m USING (event_id)
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |                            ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |pd AS (SELECT user_id, ts, purchase_id, purchase_value FROM p WHERE rn = 1)
        |SELECT e.event_id, epoch_us(e.ts) AS ts_us, e.user_id,
        |       pd.purchase_id AS asof_purchase_id,
        |       pd.purchase_value AS asof_purchase_value
        |FROM events e ASOF LEFT JOIN pd
        |  ON e.user_id = pd.user_id AND e.ts >= pd.ts
        |ORDER BY e.event_id""".stripMargin,

    "similarity_topk" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id IN (0,1,2,3,4))
        |SELECT query_id, vec_id, rank FROM (
        |  SELECT q.query_id, v.vec_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(v.e, q.qe) DESC, v.vec_id) AS INT) AS rank
        |  FROM v JOIN q ON v.vec_id <> q.query_id) t
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the planted (format, dims) schedule the real encoders wrote and
    // the header parser must recover exactly
    "multimodal_header_probe" ->
      """SELECT doc_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |            ELSE 'bmp' END AS format,
        |       CAST(16 + doc_id % 16 AS INT) AS width,
        |       CAST(8 + doc_id % 8 AS INT) AS height,
        |       TRUE AS probed
        |FROM documents WHERE doc_id < 40 ORDER BY doc_id""".stripMargin,

    // the decode pass on a no-codec corpus: NULL dims + decoded=false
    // everywhere — the oracle pins that no fabricated dimension survives
    "multimodal_metadata" ->
      """SELECT doc_id, 'text/plain' AS media_type,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       md5(text) AS checksum,
        |       CAST(NULL AS INT) AS width,
        |       CAST(NULL AS INT) AS height,
        |       CAST(NULL AS INT) AS n_frames,
        |       FALSE AS decoded
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_resize_plan" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST((strlen(text) % 640) + 1 AS BIGINT) AS width,
        |         CAST(((strlen(text) * 7) % 480) + 1 AS BIGINT) AS height
        |  FROM documents)
        |SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        |       CAST(CASE WHEN width <= 224 AND height <= 224 THEN width
        |                 WHEN width * 224 >= height * 224 THEN 224
        |                 ELSE greatest(1, (width * 224) // height) END AS INT)
        |         AS target_w,
        |       CAST(CASE WHEN width <= 224 AND height <= 224 THEN height
        |                 WHEN width * 224 >= height * 224
        |                   THEN greatest(1, (height * 224) // width)
        |                 ELSE 224 END AS INT) AS target_h
        |FROM m ORDER BY doc_id""".stripMargin,

    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST((CAST(strlen(text) AS BIGINT) // 128) + 1 AS INT) AS n_frames
        |  FROM documents)
        |SELECT doc_id, CAST(u.i AS INT) AS frame_idx,
        |       CAST(u.i * 128 AS BIGINT) AS byte_offset
        |FROM f, LATERAL (SELECT unnest(generate_series(0, f.n_frames - 1)) AS i) u
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // stub phash = 60-bit md5 prefix (strpos hex decode); pairs = brute
    // force bit_count(xor) <= 3 — the Spark side's banded buckets must
    // find exactly this set (pigeonhole completeness, hash-verified)
    "multimodal_phash_pairs" -> {
      s"""WITH m AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 10 IN (6, 7)
         |              THEN 'shared-' || CAST(doc_id // 10 AS VARCHAR)
         |              ELSE text END AS content
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |         ${md5PrefixLongSql("content")} AS ph
         |  FROM m)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ph, b.ph)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // replays the container frame hashes (md5-stub frames — text chunks)
    // and the exact set-Jaccard pair decision the LSH+verify chain makes
    "multimodal_videohash_pairs" -> {
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id < 40 AND n_chars >= 256),
         |fr AS (
         |  SELECT d.doc_id, g.i,
         |         ${md5PrefixLongSql("substr(text, CAST(i*32+1 AS BIGINT), 32)")}
         |           AS fh
         |  FROM d CROSS JOIN
         |    (SELECT unnest(generate_series(0, 7)) AS i) g),
         |clips AS (
         |  SELECT doc_id AS clip, fh FROM fr GROUP BY 1, 2
         |  UNION ALL
         |  SELECT doc_id + 100000 AS clip, fh FROM fr WHERE i < 7
         |  GROUP BY 1, 2),
         |sizes AS (SELECT clip, count(*) AS n FROM clips GROUP BY clip),
         |inter AS (
         |  SELECT a.clip AS doc_a, b.clip AS doc_b, count(*) AS ni
         |  FROM clips a JOIN clips b ON a.fh = b.fh AND a.clip < b.clip
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       (ni * 1000000) // (sa.n + sb.n - ni) AS jaccard_ppm
         |FROM inter
         |JOIN sizes sa ON sa.clip = inter.doc_a
         |JOIN sizes sb ON sb.clip = inter.doc_b
         |WHERE (ni * 1000000) // (sa.n + sb.n - ni) >= 700000
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // the DSP itself is not SQL-expressible; what IS replayable is the
    // PLANTED STRUCTURE the gain-invariance contract forces: each
    // half-gain twin must fingerprint bit-identically to its source
    // (hamming 0) and nothing else may pair — so the oracle is the
    // literal planted-pair list, and any decoder/fingerprint/banding
    // defect shows up as a missing, extra, or nonzero-distance row
    "multimodal_audiohash_pairs" ->
      """SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b,
        |       0 AS hamming
        |FROM documents WHERE doc_id < 40
        |ORDER BY 1, 2""".stripMargin,

    // the three modality pair sets (each replayed exactly as its own
    // oracle replays it), namespaced clip_id*4 + modality, unioned, and
    // closed under recursive reachability — every media item labeled
    // with its duplicate-cluster minimum, singletons included
    "multimodal_dup_clusters" -> {
      s"""WITH RECURSIVE im AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 10 IN (6, 7)
         |              THEN 'shared-' || CAST(doc_id // 10 AS VARCHAR)
         |              ELSE text END AS content
         |  FROM documents),
         |ih AS (
         |  SELECT doc_id,
         |         ${md5PrefixLongSql("content")} AS ph
         |  FROM im),
         |ipairs AS (
         |  SELECT a.doc_id * 4 AS u, b.doc_id * 4 AS v
         |  FROM ih a JOIN ih b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.ph, b.ph)) <= 3),
         |vd AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id < 40 AND n_chars >= 256),
         |vfr AS (
         |  SELECT vd.doc_id, g.i,
         |         ${md5PrefixLongSql(
              "substr(text, CAST(i*32+1 AS BIGINT), 32)")}
         |           AS fh
         |  FROM vd CROSS JOIN
         |    (SELECT unnest(generate_series(0, 7)) AS i) g),
         |vclips AS (
         |  SELECT doc_id AS clip, fh FROM vfr GROUP BY 1, 2
         |  UNION ALL
         |  SELECT doc_id + 100000 AS clip, fh FROM vfr WHERE i < 7
         |  GROUP BY 1, 2),
         |vsizes AS (SELECT clip, count(*) AS n FROM vclips GROUP BY clip),
         |vinter AS (
         |  SELECT a.clip AS ca, b.clip AS cb, count(*) AS ni
         |  FROM vclips a JOIN vclips b ON a.fh = b.fh AND a.clip < b.clip
         |  GROUP BY 1, 2),
         |vpairs AS (
         |  SELECT ca * 4 + 1 AS u, cb * 4 + 1 AS v
         |  FROM vinter
         |  JOIN vsizes sa ON sa.clip = vinter.ca
         |  JOIN vsizes sb ON sb.clip = vinter.cb
         |  WHERE (ni * 1000000) // (sa.n + sb.n - ni) >= 700000),
         |apairs AS (
         |  SELECT doc_id * 4 + 2 AS u, (doc_id + 100000) * 4 + 2 AS v
         |  FROM documents WHERE doc_id < 40),
         |allp AS (
         |  SELECT u, v FROM ipairs
         |  UNION ALL SELECT u, v FROM vpairs
         |  UNION ALL SELECT u, v FROM apairs),
         |edges AS (SELECT u, v FROM allp UNION SELECT v, u FROM allp),
         |reach AS (
         |  SELECT u AS node, u AS comp FROM edges
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
         |nodes AS (
         |  SELECT doc_id * 4 AS node FROM documents
         |  UNION ALL SELECT doc_id * 4 + 1 FROM vd
         |  UNION ALL SELECT (doc_id + 100000) * 4 + 1 FROM vd
         |  UNION ALL SELECT doc_id * 4 + 2 FROM documents WHERE doc_id < 40
         |  UNION ALL SELECT (doc_id + 100000) * 4 + 2 FROM documents
         |            WHERE doc_id < 40)
         |SELECT n.node // 4 AS doc_id,
         |       CASE n.node % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
         |            ELSE 'audio' END AS modality,
         |       COALESCE(cc.component, n.node) AS cluster_id
         |FROM nodes n LEFT JOIN cc ON cc.node = n.node
         |ORDER BY modality, doc_id""".stripMargin
    },

    // the same three pair sets rolled up to DOC level (clip ids mod
    // 100000 strip the re-encode namespace), one recursive reachability
    // over the doc edges, modalities as the sorted distinct evidence
    // list per doc — self-pairs keep a doc evidenced (and clustered
    // alone unless a cross-doc edge links it)
    "multimodal_doc_dup_rollup" -> {
      s"""WITH RECURSIVE im AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 10 IN (6, 7)
         |              THEN 'shared-' || CAST(doc_id // 10 AS VARCHAR)
         |              ELSE text END AS content
         |  FROM documents),
         |ih AS (
         |  SELECT doc_id,
         |         ${md5PrefixLongSql("content")} AS ph
         |  FROM im),
         |vd AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id < 40 AND n_chars >= 256),
         |vfr AS (
         |  SELECT vd.doc_id, g.i,
         |         ${md5PrefixLongSql(
              "substr(text, CAST(i*32+1 AS BIGINT), 32)")}
         |           AS fh
         |  FROM vd CROSS JOIN
         |    (SELECT unnest(generate_series(0, 7)) AS i) g),
         |vclips AS (
         |  SELECT doc_id AS clip, fh FROM vfr GROUP BY 1, 2
         |  UNION ALL
         |  SELECT doc_id + 100000 AS clip, fh FROM vfr WHERE i < 7
         |  GROUP BY 1, 2),
         |vsizes AS (SELECT clip, count(*) AS n FROM vclips GROUP BY clip),
         |vinter AS (
         |  SELECT a.clip AS ca, b.clip AS cb, count(*) AS ni
         |  FROM vclips a JOIN vclips b ON a.fh = b.fh AND a.clip < b.clip
         |  GROUP BY 1, 2),
         |evidence AS (
         |  SELECT least(a.doc_id, b.doc_id) AS u,
         |         greatest(a.doc_id, b.doc_id) AS v, 'image' AS modality
         |  FROM ih a JOIN ih b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.ph, b.ph)) <= 3
         |  UNION ALL
         |  SELECT least(ca % 100000, cb % 100000),
         |         greatest(ca % 100000, cb % 100000), 'video'
         |  FROM vinter
         |  JOIN vsizes sa ON sa.clip = vinter.ca
         |  JOIN vsizes sb ON sb.clip = vinter.cb
         |  WHERE (ni * 1000000) // (sa.n + sb.n - ni) >= 700000
         |  UNION ALL
         |  SELECT doc_id, doc_id, 'audio'
         |  FROM documents WHERE doc_id < 40),
         |dedges AS (
         |  SELECT u, v FROM evidence WHERE u <> v
         |  UNION SELECT v, u FROM evidence WHERE u <> v),
         |reach AS (
         |  SELECT u AS node, u AS comp FROM dedges
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN dedges e ON e.u = r.node),
         |cc AS (SELECT node, min(comp) AS component FROM reach
         |       GROUP BY node),
         |nodes AS (
         |  -- explicit DISTINCT: inside WITH RECURSIVE, DuckDB treats a
         |  -- non-self-referencing CTE's UNION as UNION ALL
         |  SELECT DISTINCT node FROM (
         |    SELECT u AS node FROM evidence
         |    UNION ALL SELECT v FROM evidence)),
         |mods AS (
         |  SELECT node, string_agg(DISTINCT modality, ','
         |                          ORDER BY modality) AS modalities
         |  FROM (SELECT u AS node, modality FROM evidence
         |        UNION ALL SELECT v, modality FROM evidence)
         |  GROUP BY node)
         |SELECT n.node AS doc_id,
         |       COALESCE(cc.component, n.node) AS cluster_id,
         |       m.modalities
         |FROM nodes n LEFT JOIN cc ON cc.node = n.node
         |JOIN mods m ON m.node = n.node
         |ORDER BY doc_id""".stripMargin
    },

    // boundaries are computed ONCE driver-side (Assembly.splitBoundaries)
    // and compared as hex strings — neither engine does query-time float
    "assembly_hash_split" ->
      s"""SELECT doc_id,
         |       ${Assembly.hashSplitOracleCase("doc_id",
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS split
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    "assembly_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |WHERE rn * 5 <= n * 1
        |ORDER BY doc_id""".stripMargin,

    "assembly_weighted_mix" ->
      s"""SELECT source, doc_id
         |FROM documents
         |WHERE ${Assembly.weightedMixOracleWhere("source", "doc_id",
              Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.5), 0.25)}
         |ORDER BY doc_id""".stripMargin,

    // recompute the n^(1/2) rates and the SAME 4-hex bucket boundary as
    // Assembly.boundHexOf, then apply weightedMix's hash predicate
    "assembly_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n
        |  FROM documents GROUP BY source),
        |z AS (SELECT sum(pow(n, 0.5)) AS zz, sum(n) AS total FROM c),
        |r AS (
        |  SELECT c.source,
        |         least(1.0, (0.5 * z.total) * (pow(c.n, 0.5) / z.zz) / c.n)
        |           AS rate
        |  FROM c, z),
        |b AS (
        |  SELECT source,
        |         CASE WHEN rate >= 1.0 THEN 'ffff~'
        |              ELSE lpad(to_hex(GREATEST(0, LEAST(65535,
        |                     CAST(round(rate * 65536) AS BIGINT)))), 4, '0')
        |         END AS bound
        |  FROM r)
        |SELECT d.source, d.doc_id
        |FROM documents d JOIN b USING (source)
        |WHERE substring(md5('graft' || CAST(d.doc_id AS VARCHAR)), 1, 4)
        |      < b.bound
        |ORDER BY d.doc_id""".stripMargin,

    // same hash-ordered dense positions as assembly_global_shuffle,
    // floor(pos/100) shard cut, per-shard audit aggregates
    "assembly_shard_manifest" ->
      """WITH p AS (
        |  SELECT doc_id, n_chars,
        |         row_number() OVER (
        |           ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)), doc_id)
        |           - 1 AS pos
        |  FROM documents)
        |SELECT CAST(floor(pos / 100.0) AS BIGINT) AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS n_bytes,
        |       min(doc_id) AS min_id,
        |       max(doc_id) AS max_id
        |FROM p GROUP BY 1 ORDER BY shard""".stripMargin,

    "assembly_global_shuffle" ->
      """SELECT row_number() OVER (
        |         ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)), doc_id) - 1
        |         AS pos,
        |       doc_id
        |FROM documents
        |ORDER BY pos""".stripMargin,

    "assembly_mix_epochs" ->
      s"""WITH n AS (
         |  SELECT source, doc_id,
         |         ${Assembly.weightedMixEpochsOracleCopies("source", "doc_id",
              Map("src0" -> 2.5, "src1" -> 1.0), 0.25)} AS n_copies
         |  FROM documents)
         |SELECT source, doc_id, CAST(u.i AS INT) AS copy
         |FROM n, LATERAL (SELECT unnest(generate_series(0, n.n_copies - 1)) AS i) u
         |ORDER BY doc_id, copy""".stripMargin,

    "pipeline_curate" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_tokens,
         |    CAST(length(text) AS DOUBLE) AS n_chars_d,
         |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS n_punct,
         |    CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|or|in)\\b')) AS DOUBLE) AS n_stop
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang, text, n_tokens,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + (1.0 - CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d ELSE 0.0 END) * 0.3
         |      + least(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 5.0, 1.0) * 0.3
         |      AS quality_score
         |  FROM f),
         |d AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\\s+', ' ', 'g'))
         |    ORDER BY doc_id) AS rn
         |  FROM q WHERE quality_score >= 0.5)
         |SELECT doc_id, lang, n_tokens, quality_score,
         |       ${Assembly.hashSplitOracleCase("doc_id",
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS split
         |FROM d WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,

    // the composed build funnel: every stage's SQL is the already-oracled
    // per-stage form (quality score, derived-URL canonicalization, md5
    // content key, per-source rank, split CASE), chained survivors-only
    "pipeline_build_report" -> {
      s"""WITH f AS (
         |  SELECT doc_id, source, n_chars, text,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_tokens,
         |    CAST(length(text) AS DOUBLE) AS n_chars_d,
         |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS n_punct,
         |    CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|or|in)\\b')) AS DOUBLE) AS n_stop
         |  FROM documents),
         |qs AS (
         |  SELECT doc_id, source, n_chars, text FROM (
         |    SELECT *,
         |      least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |        + (1.0 - CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d ELSE 0.0 END) * 0.3
         |        + least(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 5.0, 1.0) * 0.3
         |        AS quality_score
         |    FROM f) WHERE quality_score >= 0.5),
         |u AS (
         |  SELECT doc_id, source, n_chars, text,
         |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
         |    || '://'
         |    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || source || '.Example.COM'
         |             WHEN doc_id % 3 = 1 THEN source || '.example.com'
         |             ELSE 'www.' || upper(source) || '.EXAMPLE.com' END)
         |    || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
         |    || '/docs/' || CAST(doc_id % 40 AS VARCHAR)
         |    || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
         |    || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
         |             WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x&ref=a'
         |             ELSE '' END)
         |    || (CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END) AS url
         |  FROM qs),
         |uq AS (
         |  SELECT *,
         |    coalesce(array_to_string(list_sort(list_filter(
         |      string_split(coalesce(regexp_extract(url, '^[^#?]*\\?([^#]*)', 1), ''), '&'),
         |      p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&'), '') AS qclean,
         |    regexp_replace(coalesce(regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1), ''), '/+$$', '') AS pclean
         |  FROM u),
         |uc AS (
         |  SELECT doc_id, source, n_chars, text,
         |    lower(coalesce(regexp_extract(url, '^([^:/?#]+)://', 1), '')) || '://'
         |    || regexp_replace(regexp_replace(
         |         lower(coalesce(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1), '')),
         |         '^www\\.', ''), ':(443|80)$$', '')
         |    || (CASE WHEN pclean = '' THEN '/' ELSE pclean END)
         |    || (CASE WHEN qclean = '' THEN '' ELSE '?' || qclean END) AS canonical_url
         |  FROM uq),
         |uk AS (
         |  SELECT doc_id, source, n_chars, text FROM (
         |    SELECT *, row_number() OVER (PARTITION BY canonical_url
         |                                 ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM uc) WHERE rn = 1),
         |ek AS (
         |  SELECT doc_id, source, n_chars FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |    FROM uk) WHERE rn = 1),
         |cap AS (
         |  SELECT doc_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY source
         |                                 ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM ek) WHERE rn <= 5),
         |sp AS (
         |  SELECT doc_id, ${Assembly.hashSplitOracleCase("doc_id",
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS split
         |  FROM cap)
         |SELECT 1 AS stage_idx, 'input' AS stage,
         |       (SELECT count(*) FROM documents) AS n_docs
         |UNION ALL SELECT 2, 'quality', (SELECT count(*) FROM qs)
         |UNION ALL SELECT 3, 'url_dedup', (SELECT count(*) FROM uk)
         |UNION ALL SELECT 4, 'exact_dedup', (SELECT count(*) FROM ek)
         |UNION ALL SELECT 5, 'domain_cap', (SELECT count(*) FROM cap)
         |UNION ALL SELECT 6, 'split_train',
         |       (SELECT count(*) FROM sp WHERE split = 'train')
         |UNION ALL SELECT 7, 'split_val',
         |       (SELECT count(*) FROM sp WHERE split = 'val')
         |UNION ALL SELECT 8, 'split_test',
         |       (SELECT count(*) FROM sp WHERE split = 'test')
         |ORDER BY stage_idx""".stripMargin
    },

    "q_follow_within" ->
      """SELECT c.user_id, c.event_id AS first_id, p.event_id AS second_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
        |ORDER BY first_id, second_id""".stripMargin,

    // same greedy fold as the Spark mapPartitions pass, expressed as a
    // per-source recursive CTE walking rn = 1, 2, ... carrying (seq_id,
    // accumulated tokens) as recursion state
    "assembly_pack_sequences" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
        |         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn
        |  FROM documents),
        |pack AS (
        |  SELECT doc_id, source, n_tokens, rn,
        |         CAST(1 AS BIGINT) AS seq_id, n_tokens AS acc
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.doc_id, d.source, d.n_tokens, d.rn,
        |         CASE WHEN p.acc + d.n_tokens > 256
        |              THEN p.seq_id + 1 ELSE p.seq_id END,
        |         CASE WHEN p.acc + d.n_tokens > 256
        |              THEN d.n_tokens ELSE p.acc + d.n_tokens END
        |  FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
        |SELECT doc_id, source, n_tokens, seq_id
        |FROM pack ORDER BY source, doc_id""".stripMargin,

    // same recursive greedy fold as assembly_pack_sequences, then the
    // per-bin rollup
    "assembly_pack_efficiency" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
        |         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn
        |  FROM documents),
        |pack AS (
        |  SELECT doc_id, source, n_tokens, rn,
        |         CAST(1 AS BIGINT) AS seq_id, n_tokens AS acc
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.doc_id, d.source, d.n_tokens, d.rn,
        |         CASE WHEN p.acc + d.n_tokens > 256
        |              THEN p.seq_id + 1 ELSE p.seq_id END,
        |         CASE WHEN p.acc + d.n_tokens > 256
        |              THEN d.n_tokens ELSE p.acc + d.n_tokens END
        |  FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
        |SELECT source, seq_id, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens_used,
        |       CAST(256 AS BIGINT) AS budget,
        |       sum(n_tokens) > 256 AS overflow
        |FROM pack GROUP BY source, seq_id
        |ORDER BY source, seq_id""".stripMargin,

    // identical word split + start positions 0, 40, 80, … (DuckDB slice
    // is 1-based inclusive, so window [start+1 : start+50] = Spark
    // slice(ws, start+1, 50))
    "assembly_chunk_windows" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words,
        |         unnest(generate_series(0,
        |           CAST(floor((len(ws) - 1) / 40.0) AS BIGINT))) AS k
        |  FROM w WHERE len(ws) > 0)
        |SELECT doc_id,
        |       CAST(k AS BIGINT) AS chunk_idx,
        |       CAST(k * 40 AS BIGINT) AS chunk_start,
        |       CAST(least(50, n_words - k * 40) AS BIGINT) AS n_tokens,
        |       md5(array_to_string(ws[(k*40+1):(k*40+50)], ' ')) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    // same snapshot derivation + full outer join on the key
    "corpus_diff" ->
      """WITH snap_old AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 20 = 3 THEN text || ' v1'
        |                  ELSE text END) AS old_md5
        |  FROM documents WHERE doc_id % 20 <> 19),
        |snap_new AS (
        |  SELECT doc_id, md5(text) AS new_md5
        |  FROM documents WHERE doc_id % 20 <> 11)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |       o.old_md5, n.new_md5,
        |       CASE WHEN o.old_md5 IS NULL THEN 'added'
        |            WHEN n.new_md5 IS NULL THEN 'removed'
        |            WHEN o.old_md5 = n.new_md5 THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM snap_old o FULL OUTER JOIN snap_new n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // term drift on the integer ppm lattice; the md5 half-split CASE is
    // the same driver-side boundary helper the Spark plan uses
    "corpus_vocab_drift" -> {
      val splitCase = Assembly.hashSplitOracleCase(
        "doc_id", Seq("a" -> 0.5, "b" -> 0.5), "vocab")
      s"""WITH d AS (
         |  SELECT doc_id, text, $splitCase AS split FROM documents),
         |ca AS (
         |  SELECT token, count(*) AS count_a FROM (
         |    SELECT unnest(list_filter(
         |      string_split_regex(lower(text), '[^a-z0-9]+'),
         |      x -> x <> '')) AS token
         |    FROM d WHERE split = 'a') GROUP BY 1),
         |cb AS (
         |  SELECT token, count(*) AS count_b FROM (
         |    SELECT unnest(list_filter(
         |      string_split_regex(lower(text), '[^a-z0-9]+'),
         |      x -> x <> '')) AS token
         |    FROM d WHERE split = 'b') GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT COALESCE(sum(count_a), 0) FROM ca) AS total_a,
         |         (SELECT COALESCE(sum(count_b), 0) FROM cb) AS total_b),
         |j AS (
         |  SELECT token,
         |         COALESCE(count_a, 0) AS count_a,
         |         COALESCE(count_b, 0) AS count_b
         |  FROM ca FULL OUTER JOIN cb USING (token)),
         |r AS (
         |  SELECT token, count_a, count_b,
         |         CAST((CAST(count_a AS HUGEINT) * 1000000)
         |              // greatest(1, total_a) AS BIGINT) AS rate_a_ppm,
         |         CAST((CAST(count_b AS HUGEINT) * 1000000)
         |              // greatest(1, total_b) AS BIGINT) AS rate_b_ppm
         |  FROM j, tot)
         |SELECT token, count_a, count_b, rate_a_ppm, rate_b_ppm,
         |       abs(rate_a_ppm - rate_b_ppm) AS drift_ppm
         |FROM r
         |ORDER BY drift_ppm DESC, token LIMIT 50""".stripMargin
    },

    // same candidate regex; Luhn recomputed digit-by-digit with
    // list_transform over the reversed string (1-based i → (i-1)%2
    // doubles the same positions Spark's 0-based transform index does)
    "text_pii_cards" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         concat(text, ' pay 4',
        |                lpad(CAST((doc_id * 7919) % 1000000000000000
        |                          AS VARCHAR), 15, '0'),
        |                ' or 4111111111111111') AS t
        |  FROM documents),
        |c AS (SELECT doc_id, regexp_extract_all(t, '\b[0-9]{16}\b') AS l
        |      FROM p),
        |e AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS card_idx, l[i] AS card
        |      FROM (SELECT doc_id, l,
        |              unnest(generate_series(1, len(l))) AS i
        |            FROM c WHERE len(l) > 0)),
        |v AS (SELECT doc_id, card_idx, card, reverse(card) AS rev FROM e)
        |SELECT doc_id, card_idx, md5(card) AS card_md5,
        |       (list_sum(list_transform(generate_series(1, length(rev)),
        |          i -> CASE WHEN (i - 1) % 2 = 1
        |                    THEN CASE WHEN 2 * CAST(substring(rev, i, 1) AS INT) > 9
        |                              THEN 2 * CAST(substring(rev, i, 1) AS INT) - 9
        |                              ELSE 2 * CAST(substring(rev, i, 1) AS INT) END
        |                    ELSE CAST(substring(rev, i, 1) AS INT) END)) % 10 = 0)
        |         AS luhn_valid
        |FROM v ORDER BY doc_id, card_idx""".stripMargin,

    // same gram/ratio computation as text_contamination, kept to the
    // sub-threshold survivors and joined back for the passthrough columns
    "pipeline_decontaminate" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |gi AS (
        |  SELECT doc_id, ws,
        |         unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i
        |  FROM w),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
        |  FROM gi),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
        |corpus AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        |  FROM g WHERE doc_id % 20 <> 0 GROUP BY doc_id),
        |ov AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM g JOIN bench USING (gram)
        |  WHERE g.doc_id % 20 <> 0
        |  GROUP BY g.doc_id),
        |audit AS (
        |  SELECT w.doc_id,
        |         CASE WHEN COALESCE(n_grams, 0) > 0
        |              THEN CAST(COALESCE(n_overlap, 0) AS DOUBLE)
        |                   / CAST(n_grams AS DOUBLE)
        |              ELSE 0.0 END AS contamination_ratio
        |  FROM w LEFT JOIN corpus USING (doc_id) LEFT JOIN ov USING (doc_id)
        |  WHERE w.doc_id % 20 <> 0)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars, a.contamination_ratio
        |FROM documents d JOIN audit a USING (doc_id)
        |WHERE a.contamination_ratio < 0.5
        |ORDER BY d.doc_id""".stripMargin,

    "text_contamination" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |gi AS (
        |  SELECT doc_id, ws,
        |         unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i
        |  FROM w),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
        |  FROM gi),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
        |corpus AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        |  FROM g WHERE doc_id % 20 <> 0 GROUP BY doc_id),
        |ov AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM g JOIN bench USING (gram)
        |  WHERE g.doc_id % 20 <> 0
        |  GROUP BY g.doc_id)
        |SELECT doc_id, n_grams, n_overlap, contamination_ratio,
        |       contamination_ratio >= 0.5 AS contaminated
        |FROM (
        |  SELECT w.doc_id,
        |         COALESCE(n_grams, 0) AS n_grams,
        |         COALESCE(n_overlap, 0) AS n_overlap,
        |         CASE WHEN COALESCE(n_grams, 0) > 0
        |              THEN CAST(COALESCE(n_overlap, 0) AS DOUBLE)
        |                   / CAST(n_grams AS DOUBLE)
        |              ELSE 0.0 END AS contamination_ratio
        |  FROM w LEFT JOIN corpus USING (doc_id) LEFT JOIN ov USING (doc_id)
        |  WHERE w.doc_id % 20 <> 0)
        |ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS gram
        |  FROM (SELECT doc_id, ws,
        |          unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i
        |        FROM w)),
        |tri AS (
        |  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM (SELECT doc_id, ws,
        |          unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i
        |        FROM w)),
        |bigmax AS (
        |  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_bigram_count
        |  FROM (SELECT doc_id, gram, count(*) AS c FROM big GROUP BY doc_id, gram)
        |  GROUP BY doc_id),
        |tric AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
        |         CAST(count(DISTINCT gram) AS BIGINT) AS n_dtri
        |  FROM tri GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, max_bigram_count, top_bigram_ratio,
        |       n_trigrams, dup_trigram_ratio,
        |       (top_bigram_ratio > 0.10 OR dup_trigram_ratio > 0.05) AS repetitive
        |FROM (
        |  SELECT w.doc_id,
        |    CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_bigrams,
        |    COALESCE(max_bigram_count, 0) AS max_bigram_count,
        |    CASE WHEN len(ws) >= 2
        |         THEN CAST(COALESCE(max_bigram_count, 0) AS DOUBLE)
        |              / CAST(len(ws) - 1 AS DOUBLE)
        |         ELSE 0.0 END AS top_bigram_ratio,
        |    CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS n_trigrams,
        |    CASE WHEN len(ws) >= 3
        |         THEN 1.0 - CAST(n_dtri AS DOUBLE) / CAST(n_tri AS DOUBLE)
        |         ELSE 0.0 END AS dup_trigram_ratio
        |  FROM w LEFT JOIN bigmax USING (doc_id) LEFT JOIN tric USING (doc_id))
        |ORDER BY doc_id""".stripMargin,

    "dedup_cross_corpus" ->
      """WITH ref AS (
        |  SELECT DISTINCT md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g')) AS content_key
        |  FROM documents WHERE length(source) <= 4),
        |b AS (
        |  SELECT doc_id, source,
        |         md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g')) AS content_key
        |  FROM documents WHERE length(source) > 4)
        |SELECT doc_id, source, content_key
        |FROM (
        |  SELECT b.*, row_number() OVER (
        |      PARTITION BY content_key ORDER BY doc_id) AS rn
        |  FROM b
        |  WHERE content_key NOT IN (SELECT content_key FROM ref))
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    // same SQL as dedup_cross_corpus: the bloom prefilter must be
    // answer-invariant (no-false-negative theorem), so the twin
    // hash-matching THIS oracle is the equivalence proof
    "dedup_cross_corpus_bloom" ->
      """WITH ref AS (
        |  SELECT DISTINCT md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g')) AS content_key
        |  FROM documents WHERE length(source) <= 4),
        |b AS (
        |  SELECT doc_id, source,
        |         md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\s+', ' ', 'g')) AS content_key
        |  FROM documents WHERE length(source) > 4)
        |SELECT doc_id, source, content_key
        |FROM (
        |  SELECT b.*, row_number() OVER (
        |      PARTITION BY content_key ORDER BY doc_id) AS rn
        |  FROM b
        |  WHERE content_key NOT IN (SELECT content_key FROM ref))
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    // tumbling 10-word chunks; chunks in >=2 distinct docs are dropped
    // everywhere and each doc is re-assembled from the survivors in order
    "dedup_boilerplate" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS idx,
        |         array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS chunk
        |  FROM (SELECT doc_id, ws,
        |          unnest(generate_series(0,
        |            CAST(floor((len(ws) - 1) / 10.0) AS INT))) AS i
        |        FROM w WHERE len(ws) > 0)),
        |hot AS (
        |  SELECT chunk FROM c GROUP BY chunk
        |  HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (
        |  SELECT doc_id, idx, chunk FROM c
        |  WHERE chunk NOT IN (SELECT chunk FROM hot)),
        |stats AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        |  FROM c GROUP BY doc_id),
        |kk AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |         string_agg(chunk, ' ' ORDER BY idx) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT s.doc_id, s.n_chunks,
        |       COALESCE(kk.n_kept, 0) AS n_kept, kk.clean_text
        |FROM stats s LEFT JOIN kk USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "curation_domain_cap" ->
      """SELECT doc_id, source, n_chars, rank_in_source
        |FROM (
        |  SELECT doc_id, source, n_chars,
        |         CAST(row_number() OVER (
        |             PARTITION BY source
        |             ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank_in_source
        |  FROM documents)
        |WHERE rank_in_source <= 20
        |ORDER BY source, rank_in_source""".stripMargin,

    // same tokenizer as the Spark side (wordArray = [a-z0-9] runs);
    // cumulative window ordered (n_tokens desc, source) = unique order
    "curation_token_budget" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(list_filter(
        |             string_split_regex(lower(text), '[^a-z0-9]+'),
        |             x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |       CAST(sum(n_tokens) OVER (
        |           ORDER BY n_tokens DESC, source
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |       CAST(sum(n_tokens) OVER (
        |           ORDER BY n_tokens DESC, source
        |           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |         / CAST(sum(n_tokens) OVER () AS DOUBLE) AS cum_share
        |FROM per
        |ORDER BY n_tokens DESC, source""".stripMargin,

    // identical messy-URL derivation, then the same canonical form.
    // DuckDB NULL traps (vs Spark's ''-returning twins) are closed with
    // coalesce: regexp_extract -> NULL on no-match, array_to_string ->
    // NULL on empty list
    "curation_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
        |    || '://'
        |    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || source || '.Example.COM'
        |             WHEN doc_id % 3 = 1 THEN source || '.example.com'
        |             ELSE 'www.' || upper(source) || '.EXAMPLE.com' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
        |    || '/docs/' || CAST(doc_id % 40 AS VARCHAR)
        |    || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
        |             WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x&ref=a'
        |             ELSE '' END)
        |    || (CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END) AS url
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_chars, url,
        |    coalesce(array_to_string(list_sort(list_filter(
        |      string_split(coalesce(regexp_extract(url, '^[^#?]*\?([^#]*)', 1), ''), '&'),
        |      p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&'), '') AS qclean,
        |    regexp_replace(coalesce(regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1), ''), '/+$', '') AS pclean
        |  FROM u),
        |c AS (
        |  SELECT doc_id, n_chars,
        |    lower(coalesce(regexp_extract(url, '^([^:/?#]+)://', 1), '')) || '://'
        |    || regexp_replace(regexp_replace(
        |         lower(coalesce(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1), '')),
        |         '^www\.', ''), ':(443|80)$', '')
        |    || (CASE WHEN pclean = '' THEN '/' ELSE pclean END)
        |    || (CASE WHEN qclean = '' THEN '' ELSE '?' || qclean END) AS canonical_url
        |  FROM q),
        |g AS (
        |  SELECT doc_id, canonical_url, n_chars,
        |    CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT) AS n_dups,
        |    row_number() OVER (PARTITION BY canonical_url ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM c)
        |SELECT doc_id, canonical_url, n_chars, n_dups FROM g WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    // same hashed-feature logit as text_classifier_score, swept over the
    // same threshold list; counts exact ints, ratios single IEEE ops
    "classifier_pr_curve" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws,
        |         n_chars >= 300 AS y
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, y,
        |         COALESCE(CAST(list_sum(list_transform(ws, t ->
        |           ((strpos('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 4096
        |            + (strpos('0123456789abcdef', substring(md5(t), 2, 1)) - 1) * 256
        |            + (strpos('0123456789abcdef', substring(md5(t), 3, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substring(md5(t), 4, 1)) - 1))
        |           % 997 - 498)) AS BIGINT), 0) AS logit
        |  FROM w),
        |t AS (SELECT CAST(unnest([-300, -200, -100, -50, 0, 50, 100, 200, 300]) AS BIGINT) AS threshold),
        |cm AS (
        |  SELECT threshold,
        |    CAST(count(*) FILTER (logit >= threshold AND y) AS BIGINT) AS tp,
        |    CAST(count(*) FILTER (logit >= threshold AND NOT y) AS BIGINT) AS fp,
        |    CAST(count(*) FILTER (logit < threshold AND y) AS BIGINT) AS fn,
        |    CAST(count(*) FILTER (logit < threshold AND NOT y) AS BIGINT) AS tn
        |  FROM s, t GROUP BY threshold)
        |SELECT threshold, tp, fp, fn, tn,
        |  CAST(tp AS DOUBLE) / nullif(tp + fp, 0) AS "precision",
        |  CAST(tp AS DOUBLE) / nullif(tp + fn, 0) AS recall,
        |  2.0 * CAST(tp AS DOUBLE) / nullif(2 * tp + fp + fn, 0) AS f1
        |FROM cm
        |ORDER BY threshold""".stripMargin,

    // the distributed zipWithIndex rank pinned to its sequential
    // definition: row_number over (difficulty, md5 tie, doc_id)
    "assembly_curriculum" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars // 100 AS difficulty,
        |         md5('curriculum' || CAST(doc_id AS VARCHAR)) AS tie
        |  FROM documents)
        |SELECT doc_id, CAST(difficulty AS BIGINT) AS difficulty,
        |       CAST(row_number() OVER (ORDER BY difficulty, tie, doc_id) AS BIGINT) AS "rank"
        |FROM k
        |ORDER BY "rank"""".stripMargin,

    // brute-force pairs at t=0.65 + the hashSplit CASE recomputed on each
    // pair side (same pure-hash assignment the Spark plan uses)
    "audit_split_leakage" -> {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val caseA = Assembly.hashSplitOracleCase("doc_a", splits)
      val caseB = Assembly.hashSplitOracleCase("doc_b", splits)
      s"""WITH g AS (
        |  SELECT doc_id, lang,
        |    list_distinct(CASE WHEN length(norm) >= 3
        |      THEN [substring(norm, i, 3) for i in range(1, length(norm) - 1)]
        |      ELSE [norm] END) AS grams
        |  FROM (SELECT doc_id, lang,
        |          regexp_replace(trim(lower(COALESCE(text, ''))), '\\s+', ' ', 'g') AS norm
        |        FROM documents) t),
        |p AS (
        |  SELECT doc_a, doc_b, jaccard FROM (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |      CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |        / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
        |           - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) AS jaccard
        |    FROM g a JOIN g b
        |      ON a.lang = b.lang AND a.doc_id < b.doc_id
        |     AND least(len(a.grams), len(b.grams)) + 1e-9
        |         >= greatest(len(a.grams), len(b.grams)) * 0.65) q
        |  WHERE jaccard >= 0.65)
        |SELECT doc_a, doc_b,
        |       $caseA AS split_a,
        |       $caseB AS split_b,
        |       jaccard
        |FROM p
        |WHERE $caseA <> $caseB
        |ORDER BY doc_a, doc_b""".stripMargin
    },

    // BPE training replayed as an unrolled CTE chain (the pagerank
    // pattern): per step, pair counts from the current symbol table, the
    // (cnt desc, l, r) argmax, and the literal-replace merge application.
    // LEFT JOIN ON TRUE keeps the chain alive if a step exhausts (the
    // empty m{i} then contributes no UNION row — matching early stop).
    "tokenizer_bpe_merges" -> {
      val steps = (1 to 8).map { i =>
        s"""p$i AS (
           |  SELECT split_part(pair, ' ', 1) AS l, split_part(pair, ' ', 2) AS r,
           |         CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT freq, unnest(list_transform(range(1, len(ws)),
           |                j -> ws[j] || ' ' || ws[j + 1])) AS pair
           |        FROM (SELECT freq, string_split(trim(seq), ' ') AS ws
           |              FROM c${i - 1}))
           |  GROUP BY 1, 2),
           |m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
           |c$i AS (
           |  SELECT c.word, c.freq,
           |         CASE WHEN m.l IS NULL THEN c.seq
           |              ELSE replace(c.seq, ' ' || m.l || ' ' || m.r || ' ',
           |                           ' ' || m.l || m.r || ' ') END AS seq
           |  FROM c${i - 1} c LEFT JOIN m$i m ON TRUE)""".stripMargin
      }.mkString(",\n")
      val union = (1 to 8).map { i =>
        s"SELECT CAST($i AS INT) AS step, l AS lhs, r AS rhs, " +
          s"l || r AS merged, cnt AS pair_count FROM m$i"
      }.mkString("\n  UNION ALL ")
      s"""WITH toks AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                x -> x <> '')) AS w
         |  FROM documents),
         |words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
         |          FROM toks GROUP BY 1),
         |c0 AS (SELECT word, freq,
         |         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
         |       FROM words),
         |$steps
         |SELECT step, lhs, rhs, merged, pair_count FROM (
         |  $union)
         |ORDER BY step""".stripMargin
    },

    // same trained chain, then each document's per-word symbol string (with
    // '|' word boundaries) run through the same 8 literal replaces
    "tokenizer_bpe_encode" -> {
      val steps = (1 to 8).map { i =>
        s"""p$i AS (
           |  SELECT split_part(pair, ' ', 1) AS l, split_part(pair, ' ', 2) AS r,
           |         CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT freq, unnest(list_transform(range(1, len(ws)),
           |                j -> ws[j] || ' ' || ws[j + 1])) AS pair
           |        FROM (SELECT freq, string_split(trim(seq), ' ') AS ws
           |              FROM c${i - 1}))
           |  GROUP BY 1, 2),
           |m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
           |c$i AS (
           |  SELECT c.word, c.freq,
           |         CASE WHEN m.l IS NULL THEN c.seq
           |              ELSE replace(c.seq, ' ' || m.l || ' ' || m.r || ' ',
           |                           ' ' || m.l || m.r || ' ') END AS seq
           |  FROM c${i - 1} c LEFT JOIN m$i m ON TRUE),
           |e$i AS (
           |  SELECT e.doc_id, e.n_words,
           |         CASE WHEN m.l IS NULL THEN e.seq
           |              ELSE replace(e.seq, ' ' || m.l || ' ' || m.r || ' ',
           |                           ' ' || m.l || m.r || ' ') END AS seq
           |  FROM e${i - 1} e LEFT JOIN m$i m ON TRUE)""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                x -> x <> '')) AS w
         |  FROM documents),
         |words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
         |          FROM toks GROUP BY 1),
         |c0 AS (SELECT word, freq,
         |         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
         |       FROM words),
         |docw AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                     x -> x <> '') AS ws
         |  FROM documents),
         |e0 AS (
         |  SELECT doc_id, len(ws) AS n_words,
         |         ' ' || array_to_string(list_transform(ws,
         |             w -> trim(regexp_replace(w, '(.)', '\\1 ', 'g'))),
         |           ' | ') || ' ' AS seq
         |  FROM docw),
         |$steps
         |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |       CAST(len(syms) AS BIGINT) AS n_subwords,
         |       CAST(len(list_filter(syms, s -> length(s) >= 2)) AS BIGINT) AS n_fused,
         |       md5(array_to_string(syms, ' ')) AS encoding_md5
         |FROM (SELECT doc_id, n_words,
         |        list_filter(string_split(trim(seq), ' '),
         |                    s -> s <> '|' AND s <> '') AS syms
         |      FROM e8)
         |ORDER BY doc_id""".stripMargin
    },

    // same md5-bucket hash (strpos hex decode), centered integer ratio
    // weights, global top-100 membership via row_number
    "curation_dsir" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(ws)),
        |                               i -> ws[i] || ' ' || ws[i + 1])) AS gram
        |  FROM w),
        |fb AS (
        |  SELECT doc_id,
        |    ((strpos('0123456789abcdef', substring(md5(gram), 1, 1)) - 1) * 4096
        |     + (strpos('0123456789abcdef', substring(md5(gram), 2, 1)) - 1) * 256
        |     + (strpos('0123456789abcdef', substring(md5(gram), 3, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substring(md5(gram), 4, 1)) - 1))
        |    % 1024 AS bucket
        |  FROM bg),
        |tgt AS (SELECT doc_id, (lang = 'en') AS is_target FROM documents),
        |dbc AS (
        |  SELECT f.doc_id, t.is_target, f.bucket, CAST(count(*) AS BIGINT) AS cnt
        |  FROM fb f JOIN tgt t USING (doc_id) GROUP BY 1, 2, 3),
        |tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS cr_total,
        |         CAST(sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS ct_total
        |  FROM dbc),
        |wt AS (
        |  SELECT bucket,
        |         ((CAST(sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) + 1)
        |            * 1000000) // (CAST(sum(cnt) AS BIGINT) + 1)
        |         - ((t.ct_total + 1) * 1000000) // (t.cr_total + 1) AS wgt
        |  FROM dbc CROSS JOIN tot t
        |  GROUP BY bucket, t.ct_total, t.cr_total),
        |agg AS (
        |  SELECT d.doc_id, CAST(sum(d.cnt) AS BIGINT) AS n_feats,
        |         CAST(sum(d.cnt * w.wgt) AS BIGINT) AS dsir_score
        |  FROM dbc d JOIN wt w USING (bucket) GROUP BY 1),
        |alld AS (
        |  SELECT d.doc_id, COALESCE(a.n_feats, 0) AS n_feats,
        |         COALESCE(a.dsir_score, 0) AS dsir_score
        |  FROM documents d LEFT JOIN agg a USING (doc_id))
        |SELECT doc_id, n_feats, dsir_score,
        |       (row_number() OVER (ORDER BY dsir_score DESC, doc_id)) <= 100 AS selected
        |FROM alld ORDER BY doc_id""".stripMargin,

    // zipped-unnest position recovery (DuckDB zips parallel unnests), same
    // (cnt desc, token) rank ids; OOV coalesces to the 0 UNK id
    "text_tokenize_ids" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |         unnest(range(0, len(ws))) AS pos,
        |         unnest(ws) AS token
        |  FROM w),
        |tot AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        |voc AS (
        |  SELECT token, CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS token_id
        |  FROM tot ORDER BY cnt DESC, token LIMIT 20)
        |SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos, t.token,
        |       COALESCE(v.token_id, 0) AS token_id
        |FROM tok t LEFT JOIN voc v USING (token)
        |ORDER BY doc_id, pos""".stripMargin,

    // same tokenizer, same (cnt desc, token) top-20 vocabulary cut
    "text_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
        |  FROM documents),
        |pd AS (SELECT doc_id, token, count(*) AS k FROM tok GROUP BY 1, 2),
        |tot AS (SELECT token, CAST(sum(k) AS BIGINT) AS cnt FROM pd GROUP BY 1),
        |voc AS (SELECT token FROM (
        |  SELECT token, row_number() OVER (ORDER BY cnt DESC, token) AS r FROM tot)
        |  WHERE r <= 20),
        |inv AS (SELECT pd.doc_id, CAST(sum(pd.k) AS BIGINT) AS n_invocab
        |        FROM pd JOIN voc USING (token) GROUP BY 1),
        |base AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT b.doc_id, b.n_tokens,
        |       COALESCE(i.n_invocab, 0) AS n_invocab,
        |       b.n_tokens - COALESCE(i.n_invocab, 0) AS n_oov,
        |       CASE WHEN b.n_tokens > 0
        |            THEN CAST(b.n_tokens - COALESCE(i.n_invocab, 0) AS DOUBLE)
        |                 / CAST(b.n_tokens AS DOUBLE)
        |            ELSE 0.0 END AS oov_rate
        |FROM base b LEFT JOIN inv i USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // same hashed-feature weights: first 4 md5 hex chars decoded via
    // strpos arithmetic (portable hex->int), (h % 997) - 498, integer sum
    "text_classifier_score" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(ws) AS BIGINT) AS n_words,
        |       COALESCE(CAST(list_sum(list_transform(ws, t ->
        |         ((strpos('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 4096
        |          + (strpos('0123456789abcdef', substring(md5(t), 2, 1)) - 1) * 256
        |          + (strpos('0123456789abcdef', substring(md5(t), 3, 1)) - 1) * 16
        |          + (strpos('0123456789abcdef', substring(md5(t), 4, 1)) - 1))
        |         % 997 - 498)) AS BIGINT), 0) AS logit,
        |       COALESCE(CAST(list_sum(list_transform(ws, t ->
        |         ((strpos('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 4096
        |          + (strpos('0123456789abcdef', substring(md5(t), 2, 1)) - 1) * 256
        |          + (strpos('0123456789abcdef', substring(md5(t), 3, 1)) - 1) * 16
        |          + (strpos('0123456789abcdef', substring(md5(t), 4, 1)) - 1))
        |         % 997 - 498)) AS BIGINT), 0) > 0 AS keep
        |FROM w
        |ORDER BY doc_id""".stripMargin,

    // same integer recurrence: c2 = bigram counts, c1 = history-word
    // window sum over the c2 table, weight = (c2*1e6) // c1, per-doc
    // mass/avg via the per-doc count table; `//` = DuckDB int division
    "text_lm_score" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(ws)),
        |                               i -> ws[i] || ' ' || ws[i + 1])) AS gram
        |  FROM w WHERE len(ws) >= 2),
        |dgc AS (SELECT doc_id, gram, count(*) AS k FROM bg GROUP BY 1, 2),
        |c2 AS (SELECT gram, CAST(sum(k) AS BIGINT) AS c2 FROM dgc GROUP BY 1),
        |wt AS (
        |  SELECT gram,
        |         (c2 * 1000000) // CAST(sum(c2) OVER (
        |            PARTITION BY split_part(gram, ' ', 1)) AS BIGINT) AS wgt
        |  FROM c2),
        |agg AS (
        |  SELECT d.doc_id, CAST(sum(d.k) AS BIGINT) AS n_bigrams,
        |         CAST(sum(d.k * wt.wgt) AS BIGINT) AS lm_mass
        |  FROM dgc d JOIN wt USING (gram) GROUP BY 1)
        |SELECT doc_id,
        |       COALESCE(n_bigrams, 0) AS n_bigrams,
        |       COALESCE(lm_mass, 0) AS lm_mass,
        |       CASE WHEN COALESCE(n_bigrams, 0) > 0
        |            THEN lm_mass // n_bigrams ELSE 0 END AS lm_avg
        |FROM documents LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // the same LM recurrence, then per-language lattice-cut terciles:
    // b1/b2 = smallest scores whose cumulative count reaches ceil(n/3)
    // and ceil(2n/3); bucket is a pure function of (lang, score)
    "curation_ccnet_buckets" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(ws)),
        |                               i -> ws[i] || ' ' || ws[i + 1])) AS gram
        |  FROM w WHERE len(ws) >= 2),
        |dgc AS (SELECT doc_id, gram, count(*) AS k FROM bg GROUP BY 1, 2),
        |c2 AS (SELECT gram, CAST(sum(k) AS BIGINT) AS c2 FROM dgc GROUP BY 1),
        |wt AS (
        |  SELECT gram,
        |         (c2 * 1000000) // CAST(sum(c2) OVER (
        |            PARTITION BY split_part(gram, ' ', 1)) AS BIGINT) AS wgt
        |  FROM c2),
        |agg AS (
        |  SELECT d.doc_id, CAST(sum(d.k) AS BIGINT) AS n_bigrams,
        |         CAST(sum(d.k * wt.wgt) AS BIGINT) AS lm_mass
        |  FROM dgc d JOIN wt USING (gram) GROUP BY 1),
        |lm AS (
        |  SELECT d.doc_id, d.lang,
        |         CASE WHEN COALESCE(n_bigrams, 0) > 0
        |              THEN lm_mass // n_bigrams ELSE 0 END AS lm_avg
        |  FROM documents d LEFT JOIN agg USING (doc_id)),
        |hist AS (SELECT lang, lm_avg, count(*) AS cnt FROM lm GROUP BY 1, 2),
        |mk AS (
        |  SELECT lang, lm_avg,
        |         sum(cnt) OVER (PARTITION BY lang ORDER BY lm_avg) AS cum,
        |         sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM hist),
        |bounds AS (
        |  SELECT lang,
        |         min(CASE WHEN cum * 3 >= n THEN lm_avg END) AS b1,
        |         min(CASE WHEN cum * 3 >= n * 2 THEN lm_avg END) AS b2
        |  FROM mk GROUP BY 1),
        |bk AS (
        |  SELECT lm.lang,
        |         CASE WHEN lm_avg <= b1 THEN 'tail'
        |              WHEN lm_avg <= b2 THEN 'middle'
        |              ELSE 'head' END AS bucket,
        |         lm_avg
        |  FROM lm JOIN bounds USING (lang))
        |SELECT lang, bucket, count(*) AS n_docs,
        |       min(lm_avg) AS min_avg, max(lm_avg) AS max_avg
        |FROM bk GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    // same permille/floor-division lattice as the Spark plan; alias reuse
    // avoided via CTEs for dialect safety
    "text_readability" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sents,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |      AS n_syllables
        |  FROM documents),
        |g AS (
        |  SELECT *,
        |         (n_words * 1000) // greatest(1, n_sents) AS wps_milli,
        |         (n_syllables * 1000) // greatest(1, n_words) AS spw_milli
        |  FROM f)
        |SELECT doc_id, n_words, n_sents, n_syllables, wps_milli, spw_milli,
        |       206835 - (1015 * wps_milli) // 1000
        |              - (84600 * spw_milli) // 1000 AS fre_milli
        |FROM g ORDER BY doc_id""".stripMargin,

    // string 5-grams stand for the Spark side's 64-bit gram hashes (the
    // repo-standard trade: counts agree absent a 64-bit collision);
    // LEFT JOIN back to documents keeps zero-gram docs in the audit
    "text_dup_gram_fraction" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(ws) - 3),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
        |                ws[i+3] || ' ' || ws[i+4])) AS grams
        |  FROM w WHERE len(ws) >= 5),
        |p AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        |dfreq AS (SELECT gram, count(*) AS df FROM p GROUP BY 1),
        |agg AS (
        |  SELECT p.doc_id, count(*) AS n_grams,
        |         CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_dup_grams
        |  FROM p JOIN dfreq USING (gram) GROUP BY 1)
        |SELECT d.doc_id,
        |       COALESCE(n_grams, 0) AS n_grams,
        |       COALESCE(n_dup_grams, 0) AS n_dup_grams,
        |       (COALESCE(n_dup_grams, 0) * 1000)
        |         // greatest(1, COALESCE(n_grams, 0)) AS dup_milli
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // same integer idf lattice; df from the matched postings, N scalar,
    // HAVING-style conjunctive gate, (score desc, doc_id) unique order
    "text_search_topk" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN ('vector', 'hash', 'merge')
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT doc_id, token, tf,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m),
        |s AS (
        |  SELECT doc_id, count(*) AS n_terms,
        |         CAST(sum(tf * ((((SELECT count(*) FROM documents) - df + 1)
        |                         * 1000000) // (df + 1))) AS BIGINT) AS score
        |  FROM w GROUP BY doc_id)
        |SELECT doc_id, score FROM s WHERE n_terms = 3
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // the full BM25 lattice replayed: ppm idf, milli k1/b saturation +
    // length normalization, every division integer (// = Spark's div),
    // disjunctive, (score desc, doc_id) unique order. N and T replay the
    // index meta (docs count, post-filter token count)
    "text_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\s+', ' ', 'g'), ' ')) AS token
        |    FROM documents) WHERE token <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN ('vector', 'hash', 'merge')
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |s AS (
        |  SELECT doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w CROSS JOIN meta GROUP BY doc_id)
        |SELECT doc_id, score FROM s
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // phrase matching replayed blind to the index: tokenize with
    // 0-based positions, shift each phrase slot's positions by -slot,
    // and an anchor where BOTH slots land is one occurrence of the
    // consecutive phrase — identical anchor-intersection arithmetic,
    // straight over the raw text
    "text_phrase_topk" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |slots AS (SELECT * FROM (VALUES ('table', 0), ('hash', 1))
        |          AS s(token, slot)),
        |anchors AS (
        |  SELECT t.doc_id, s.slot, t.pos - s.slot AS anchor
        |  FROM toks t JOIN slots s USING (token)
        |  WHERE t.pos - s.slot >= 0),
        |occ AS (
        |  SELECT doc_id, anchor FROM anchors
        |  GROUP BY doc_id, anchor HAVING count(*) = 2)
        |SELECT doc_id, count(*) AS n_occurrences
        |FROM occ GROUP BY doc_id
        |ORDER BY n_occurrences DESC, doc_id LIMIT 20""".stripMargin,

    // both rank lists replayed BLIND TO THE INDEXES — the BM25 lattice
    // over the raw text, and the ANN leg's ENTIRE mechanism over the raw
    // embeddings: integer-Lloyd training (3 rounds, 16 cells — the
    // lloydRoundSql machinery), cell assignment, the query's top-4 probe
    // cells by exact integer distance (ties → lowest cell), cosine order
    // WITHIN the probed cells only — then the identical integer RRF:
    // Σ 1e6 // (60 + rank), union via full outer join, (rrf desc,
    // doc_id) top-20. A drifted centroid, a wrong probe set, or a
    // candidate leaking from an unprobed cell all break the hash
    "retrieval_hybrid_rrf" ->
      s"""WITH toks AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\\s+', ' ', 'g'), ' ')) AS token
        |    FROM documents) WHERE token <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN ('vector', 'hash', 'merge')
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |s AS (
        |  SELECT doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w CROSS JOIN meta GROUP BY doc_id),
        |lex AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |    FROM s) WHERE rank <= 50),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 16),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |${lloydRoundSql(3)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT j FROM (
        |    SELECT j, row_number() OVER (ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id = 0) WHERE rn <= 4),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sem AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT v.vec_id AS doc_id,
        |      CAST(ROW_NUMBER() OVER (
        |        ORDER BY list_cosine_similarity(v.e, q2.e) DESC, v.vec_id)
        |        AS BIGINT) AS rank
        |    FROM v
        |    JOIN fa ON fa.vec_id = v.vec_id
        |    CROSS JOIN (SELECT e FROM v WHERE vec_id = 0) q2
        |    WHERE v.vec_id <> 0
        |      AND fa.cluster IN (SELECT j FROM probe)) WHERE rank <= 50)
        |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
        |       CAST(COALESCE(1000000 // (60 + lex.rank), 0) +
        |            COALESCE(1000000 // (60 + sem.rank), 0) AS BIGINT)
        |         AS rrf_ppm,
        |       lex.rank IS NOT NULL AS in_lexical,
        |       sem.rank IS NOT NULL AS in_semantic
        |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        |ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin,

    // the batch serving form replayed per request: three BM25 rank
    // lists off ONE shared df table (df is a corpus property of the
    // token, independent of which query asked — exactly the batch
    // probe's shape), three Lloyd probe sets + in-cell cosine orders,
    // per-(query_id, doc_id) fusion with ranks per query
    "retrieval_hybrid_serve" ->
      s"""WITH toks AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\\s+', ' ', 'g'), ' ')) AS token
        |    FROM documents) WHERE token <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |qterms(query_id, token) AS (
        |  SELECT * FROM (VALUES (0, 'vector'), (0, 'hash'), (0, 'merge'),
        |         (1, 'table'), (1, 'hash'),
        |         (2, 'merge'), (2, 'vector')) AS qt(query_id, token)),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN (SELECT DISTINCT token FROM qterms)
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |sc AS (
        |  SELECT qt.query_id, w.doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w JOIN qterms qt USING (token) CROSS JOIN meta
        |  GROUP BY 1, 2),
        |lex AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS rank
        |    FROM sc) WHERE rank <= 50),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 16),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |${lloydRoundSql(3)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT vec_id AS query_id, j FROM (
        |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id IN (0, 1, 2)) WHERE rn <= 4),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sem AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT pr.query_id, v.vec_id AS doc_id,
        |      CAST(ROW_NUMBER() OVER (PARTITION BY pr.query_id
        |        ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |        AS BIGINT) AS rank
        |    FROM v
        |    JOIN fa ON fa.vec_id = v.vec_id
        |    JOIN probe pr ON pr.j = fa.cluster
        |    JOIN v qv ON qv.vec_id = pr.query_id
        |    WHERE v.vec_id <> pr.query_id) WHERE rank <= 50),
        |fused AS (
        |  SELECT COALESCE(lex.query_id, sem.query_id) AS query_id,
        |         COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
        |         CAST(COALESCE(1000000 // (60 + lex.rank), 0) +
        |              COALESCE(1000000 // (60 + sem.rank), 0) AS BIGINT)
        |           AS rrf_ppm,
        |         (CASE WHEN lex.rank IS NOT NULL THEN 1 ELSE 0 END +
        |          CASE WHEN sem.rank IS NOT NULL THEN 1 ELSE 0 END)
        |           AS n_legs
        |  FROM lex FULL OUTER JOIN sem
        |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_ppm,
        |       n_legs, rank
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_ppm DESC, doc_id) AS rank FROM fused)
        |WHERE rank <= 20
        |ORDER BY query_id, rank""".stripMargin,

    // all three text rank lists replayed over the raw corpus (the BM25
    // lattice, the phrase anchor intersection, the proximity min-window
    // recurrence), then the identical ONE-cascade 3-way fusion — a fold
    // of 2-leg fuses would not match this
    "retrieval_hybrid_rrf3" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |mb AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN ('vector', 'hash', 'merge')
        |  GROUP BY 1, 2),
        |wb AS (
        |  SELECT mb.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM mb JOIN dl USING (doc_id)),
        |sb AS (
        |  SELECT doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM wb CROSS JOIN meta GROUP BY doc_id),
        |lex AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |    FROM sb) WHERE rank <= 50),
        |slots AS (SELECT * FROM (VALUES ('table', 0), ('hash', 1))
        |          AS s2(token, slot)),
        |anchors AS (
        |  SELECT t.doc_id, s2.slot, t.pos - s2.slot AS anchor
        |  FROM toks t JOIN slots s2 USING (token)
        |  WHERE t.pos - s2.slot >= 0),
        |occ AS (
        |  SELECT doc_id, anchor FROM anchors
        |  GROUP BY doc_id, anchor HAVING count(*) = 2),
        |phr AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |      ORDER BY count(*) DESC, doc_id) AS BIGINT) AS rank
        |    FROM occ GROUP BY doc_id) WHERE rank <= 50),
        |mp AS (
        |  SELECT doc_id, token, pos FROM toks
        |  WHERE token IN ('vector', 'hash', 'merge')),
        |lasts AS (
        |  SELECT doc_id, pos,
        |    max(CASE WHEN token = 'vector' THEN pos END) OVER w AS l0,
        |    max(CASE WHEN token = 'hash' THEN pos END) OVER w AS l1,
        |    max(CASE WHEN token = 'merge' THEN pos END) OVER w AS l2
        |  FROM mp WINDOW w AS (PARTITION BY doc_id ORDER BY pos
        |                      ROWS UNBOUNDED PRECEDING)),
        |wl AS (
        |  SELECT doc_id, pos - least(l0, l1, l2) + 1 AS window_len
        |  FROM lasts
        |  WHERE l0 IS NOT NULL AND l1 IS NOT NULL AND l2 IS NOT NULL),
        |prox AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |      ORDER BY min(window_len), doc_id) AS BIGINT) AS rank
        |    FROM wl GROUP BY doc_id) WHERE rank <= 50),
        |f3 AS (
        |  SELECT COALESCE(l.doc_id, p2.doc_id, x.doc_id) AS doc_id,
        |         CAST(COALESCE(1000000 // (60 + l.rank), 0) +
        |              COALESCE(1000000 // (60 + p2.rank), 0) +
        |              COALESCE(1000000 // (60 + x.rank), 0) AS BIGINT)
        |           AS rrf_ppm,
        |         (CASE WHEN l.rank IS NOT NULL THEN 1 ELSE 0 END +
        |          CASE WHEN p2.rank IS NOT NULL THEN 1 ELSE 0 END +
        |          CASE WHEN x.rank IS NOT NULL THEN 1 ELSE 0 END) AS n_legs
        |  FROM lex l
        |  FULL OUTER JOIN phr p2 ON l.doc_id = p2.doc_id
        |  FULL OUTER JOIN prox x ON COALESCE(l.doc_id, p2.doc_id) = x.doc_id)
        |SELECT CAST(0 AS BIGINT) AS query_id, doc_id, rrf_ppm, n_legs, rank
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_ppm DESC, doc_id) AS rank
        |  FROM f3)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // the snippet batch serving form replayed per request: each
    // request's min-window recurrence, (len, start) argmin, per-query
    // (window_len, doc_id) top-20, and the token-span slice
    "text_snippet_serve" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |m0 AS (
        |  SELECT doc_id, token, pos FROM toks
        |  WHERE token IN ('vector', 'hash', 'merge')),
        |la0 AS (
        |  SELECT doc_id, pos,
        |    max(CASE WHEN token = 'vector' THEN pos END) OVER w AS l0,
        |    max(CASE WHEN token = 'hash' THEN pos END) OVER w AS l1,
        |    max(CASE WHEN token = 'merge' THEN pos END) OVER w AS l2
        |  FROM m0 WINDOW w AS (PARTITION BY doc_id ORDER BY pos
        |                      ROWS UNBOUNDED PRECEDING)),
        |ca0 AS (
        |  SELECT doc_id, pos - least(l0, l1, l2) + 1 AS window_len,
        |         least(l0, l1, l2) AS win_start
        |  FROM la0
        |  WHERE l0 IS NOT NULL AND l1 IS NOT NULL AND l2 IS NOT NULL),
        |be0 AS (
        |  SELECT doc_id, window_len, win_start FROM (
        |    SELECT doc_id, window_len, win_start,
        |           row_number() OVER (PARTITION BY doc_id
        |             ORDER BY window_len, win_start) AS rn
        |    FROM ca0) WHERE rn = 1),
        |tk0 AS (
        |  SELECT CAST(0 AS BIGINT) AS query_id, doc_id, window_len,
        |         win_start, rank FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      ORDER BY window_len, doc_id) AS rank FROM be0)
        |  WHERE rank <= 20),
        |m1 AS (
        |  SELECT doc_id, token, pos FROM toks
        |  WHERE token IN ('table', 'hash')),
        |la1 AS (
        |  SELECT doc_id, pos,
        |    max(CASE WHEN token = 'table' THEN pos END) OVER w AS l0,
        |    max(CASE WHEN token = 'hash' THEN pos END) OVER w AS l1
        |  FROM m1 WINDOW w AS (PARTITION BY doc_id ORDER BY pos
        |                      ROWS UNBOUNDED PRECEDING)),
        |ca1 AS (
        |  SELECT doc_id, pos - least(l0, l1) + 1 AS window_len,
        |         least(l0, l1) AS win_start
        |  FROM la1
        |  WHERE l0 IS NOT NULL AND l1 IS NOT NULL),
        |be1 AS (
        |  SELECT doc_id, window_len, win_start FROM (
        |    SELECT doc_id, window_len, win_start,
        |           row_number() OVER (PARTITION BY doc_id
        |             ORDER BY window_len, win_start) AS rn
        |    FROM ca1) WHERE rn = 1),
        |tk1 AS (
        |  SELECT CAST(1 AS BIGINT) AS query_id, doc_id, window_len,
        |         win_start, rank FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      ORDER BY window_len, doc_id) AS rank FROM be1)
        |  WHERE rank <= 20),
        |u AS (SELECT * FROM tk0 UNION ALL SELECT * FROM tk1)
        |SELECT u.query_id, u.doc_id,
        |       CAST(u.window_len AS BIGINT) AS window_len,
        |       CAST(u.win_start AS BIGINT) AS win_start, u.rank,
        |       array_to_string(
        |         d.lst[CAST(u.win_start + 1 AS BIGINT) :
        |               CAST(u.win_start + u.window_len AS BIGINT)], ' ')
        |         AS snippet
        |FROM u JOIN d USING (doc_id)
        |ORDER BY query_id, rank""".stripMargin,

    // min-window proximity replayed: per doc per position, the running
    // last-seen of each term (window max over the position order), the
    // covering window back to the stalest, min per doc — the exact
    // recurrence the Spark plan runs, straight over the raw text
    "text_proximity_topk" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |m AS (
        |  SELECT doc_id, token, pos FROM toks
        |  WHERE token IN ('vector', 'hash', 'merge')),
        |lasts AS (
        |  SELECT doc_id, pos,
        |    max(CASE WHEN token = 'vector' THEN pos END) OVER w AS l0,
        |    max(CASE WHEN token = 'hash' THEN pos END) OVER w AS l1,
        |    max(CASE WHEN token = 'merge' THEN pos END) OVER w AS l2
        |  FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos
        |                      ROWS UNBOUNDED PRECEDING)),
        |wl AS (
        |  SELECT doc_id, pos - least(l0, l1, l2) + 1 AS window_len
        |  FROM lasts
        |  WHERE l0 IS NOT NULL AND l1 IS NOT NULL AND l2 IS NOT NULL)
        |SELECT doc_id, CAST(min(window_len) AS BIGINT) AS window_len
        |FROM wl GROUP BY doc_id
        |ORDER BY window_len, doc_id LIMIT 20""".stripMargin,

    // best-window argmin + token-span slice replayed: the proximity
    // recurrence keeps win_start = least(lasts), row_number picks the
    // per-doc (len, start) lexicographic minimum, and the snippet is a
    // 1-based inclusive list slice of the SAME normalized token list
    "text_snippet_topk" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |m AS (
        |  SELECT doc_id, token, pos FROM toks
        |  WHERE token IN ('vector', 'hash', 'merge')),
        |lasts AS (
        |  SELECT doc_id, pos,
        |    max(CASE WHEN token = 'vector' THEN pos END) OVER w AS l0,
        |    max(CASE WHEN token = 'hash' THEN pos END) OVER w AS l1,
        |    max(CASE WHEN token = 'merge' THEN pos END) OVER w AS l2
        |  FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos
        |                      ROWS UNBOUNDED PRECEDING)),
        |cand AS (
        |  SELECT doc_id, pos - least(l0, l1, l2) + 1 AS window_len,
        |         least(l0, l1, l2) AS win_start
        |  FROM lasts
        |  WHERE l0 IS NOT NULL AND l1 IS NOT NULL AND l2 IS NOT NULL),
        |best AS (
        |  SELECT doc_id, window_len, win_start FROM (
        |    SELECT doc_id, window_len, win_start,
        |           row_number() OVER (PARTITION BY doc_id
        |             ORDER BY window_len, win_start) AS rn
        |    FROM cand) WHERE rn = 1),
        |topk AS (
        |  SELECT * FROM best ORDER BY window_len, doc_id LIMIT 20)
        |SELECT t.doc_id, CAST(t.window_len AS BIGINT) AS window_len,
        |       CAST(t.win_start AS BIGINT) AS win_start,
        |       array_to_string(
        |         d.lst[CAST(t.win_start + 1 AS BIGINT) :
        |               CAST(t.win_start + t.window_len AS BIGINT)], ' ')
        |         AS snippet
        |FROM topk t JOIN d USING (doc_id)
        |ORDER BY window_len, doc_id""".stripMargin,

    // the SAME full-corpus BM25 replay — the oracle knows nothing about
    // the base/append split or the compaction; a double-counted replay
    // batch, a stale N/T, or a compaction change all break the match
    "text_bm25_incremental" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
        |toks AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\s+', ' ', 'g'), ' ')) AS token
        |    FROM d) WHERE token <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM d) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN ('vector', 'hash', 'merge')
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |s AS (
        |  SELECT doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w CROSS JOIN meta GROUP BY doc_id)
        |SELECT doc_id, score, TRUE AS stable_across_compaction FROM s
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // BM25 over corpus-minus-deleted, BLIND to the tombstone mechanism:
    // the corpus constants (n, t) and df all re-derive from the
    // remaining docs — a stale N/T, a surviving posting, or a
    // double-counted replayed delete all break the hash
    "text_bm25_delete" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 1000 AND doc_id % 10 <> 7),
        |toks AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\s+', ' ', 'g'), ' ')) AS token
        |    FROM d) WHERE token <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM d) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN ('vector', 'hash', 'merge')
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |s AS (
        |  SELECT doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w CROSS JOIN meta GROUP BY doc_id)
        |SELECT doc_id, score, TRUE AS stable_across_compaction FROM s
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // the vector DELETE replayed blind to tombstones: Lloyd training on
    // the ORIGINAL corpus (2 rounds, 8 cells — deletion never retrains),
    // the query's top-3 probe cells by exact integer distance, cosine
    // rank within the probed cells over corpus-minus-deleted
    "embedding_index_delete" ->
      s"""WITH q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 8),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c2 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT j FROM (
        |    SELECT j, row_number() OVER (ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id = 1) WHERE rn <= 3),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT CAST(1 AS BIGINT) AS query_id, vec_id, rank FROM (
        |  SELECT v.vec_id,
        |    ROW_NUMBER() OVER (
        |      ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |      AS rank
        |  FROM v
        |  JOIN fa ON fa.vec_id = v.vec_id
        |  CROSS JOIN (SELECT e FROM v WHERE vec_id = 1) qv
        |  WHERE v.vec_id <> 1 AND v.vec_id % 7 <> 3
        |    AND fa.cluster IN (SELECT j FROM probe))
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // BM25 over the FINAL logical corpus after delete → re-append →
    // delete-replay → compaction → post-fold delete-replay: deleted =
    // doc_id % 10 == 7, re-appended = doc_id % 20 == 7, so gone-forever
    // = doc_id % 20 == 17. The oracle knows none of that mechanism —
    // a swallowed resurrect, a double-counted N/T, or a post-fold
    // re-mask all break the hash
    "text_delete_readd" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 1000 AND doc_id % 20 <> 17),
        |toks AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\s+', ' ', 'g'), ' ')) AS token
        |    FROM d) WHERE token <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM d) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN ('vector', 'hash', 'merge')
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |s AS (
        |  SELECT doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w CROSS JOIN meta GROUP BY doc_id)
        |SELECT doc_id, score, TRUE AS stable_across_compaction FROM s
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // the vector re-add replayed blind: deleted = vec_id % 7 == 3,
    // re-appended = vec_id % 14 == 3 ⇒ gone-forever = vec_id % 14 == 10.
    // The serve probe is exhaustive (nprobe = nlist), so the oracle is
    // plain exact cosine over the final logical corpus — a vector that
    // failed to resurrect, or resurrected twice, breaks rows AND hash
    "embedding_delete_readd" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT CAST(1 AS BIGINT) AS query_id, vec_id, rank FROM (
        |  SELECT v.vec_id,
        |    ROW_NUMBER() OVER (
        |      ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |      AS rank
        |  FROM v
        |  CROSS JOIN (SELECT e FROM v WHERE vec_id = 1) qv
        |  WHERE v.vec_id <> 1 AND v.vec_id % 14 <> 10)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // the CODED layout's delete lifecycle replayed blind: PQ training
    // (2-round integer Lloyd, md5 seeds — the similarity_ann_pq blocks),
    // encoding, the single-query ADC table against the final codebook,
    // the rerank-50 shortlist cut (ties → lowest vec_id), and the exact
    // cosine top-20 — all over the FINAL logical corpus (deleted = % 7
    // == 3, re-added = % 14 == 3 ⇒ gone forever = % 14 == 10). The
    // re-added vector's codes equal its build codes (frozen codebooks,
    // same encoder), so the oracle encodes the logical corpus uniformly.
    // The probe is exhaustive (nprobe = nlist), so no coarse replay
    // needed; a vector that failed to resurrect, resurrected with wrong
    // codes, or escaped its tombstone breaks rows AND hash
    "embedding_pq_delete_readd" -> {
      def pqRound(t: Int): String =
        s"""pd$t AS MATERIALIZED (
           |  SELECT p.vec_id, p.sub, c.j,
           |         sum((p.v - c.c)*(p.v - c.c)) AS dist
           |  FROM p JOIN c${t - 1} c USING (d) GROUP BY 1, 2, 3),
           |pa$t AS MATERIALIZED (
           |  SELECT vec_id, sub, j AS code FROM (
           |    SELECT vec_id, sub, j,
           |           row_number() OVER (PARTITION BY vec_id, sub
           |                              ORDER BY dist, j) AS rn
           |    FROM pd$t) WHERE rn = 1)""".stripMargin
      def pqUpdate(t: Int): String =
        s"""c$t AS MATERIALIZED (
           |  SELECT o.j, o.d, COALESCE(CAST(u.s // u.n AS BIGINT), o.c) AS c
           |  FROM c${t - 1} o LEFT JOIN (
           |    SELECT a.code AS j, p.d, CAST(sum(p.v) AS BIGINT) AS s,
           |           count(*) AS n
           |    FROM p JOIN pa$t a
           |      ON p.vec_id = a.vec_id AND p.sub = a.sub
           |    GROUP BY 1, 2) u
           |    ON o.j = u.j AND o.d = u.d)""".stripMargin
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS qv
         |  FROM embeddings WHERE vec_id < 500),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |p AS MATERIALIZED (
         |  SELECT vec_id, d, (d - 1) // 8 AS sub, qv[d] AS v
         |  FROM q CROSS JOIN dims),
         |seeds AS MATERIALIZED (
         |  SELECT qv, row_number() OVER (
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
         |  FROM q),
         |c0 AS MATERIALIZED (
         |  SELECT s.j, dims.d, s.qv[dims.d] AS c
         |  FROM seeds s CROSS JOIN dims WHERE s.j < 16),
         |${pqRound(1)},
         |${pqUpdate(1)},
         |${pqRound(2)},
         |dt AS MATERIALIZED (
         |  SELECT p.sub, c.j, sum((p.v - c.c)*(p.v - c.c)) AS pd
         |  FROM p JOIN c1 c USING (d)
         |  WHERE p.vec_id = 1
         |  GROUP BY 1, 2),
         |adc AS MATERIALIZED (
         |  SELECT a.vec_id, CAST(sum(d.pd) AS BIGINT) AS adc_dist
         |  FROM pa2 a JOIN dt d ON a.sub = d.sub AND a.code = d.j
         |  WHERE a.vec_id % 14 <> 10
         |  GROUP BY 1),
         |short AS (
         |  SELECT vec_id FROM (
         |    SELECT vec_id,
         |           row_number() OVER (ORDER BY adc_dist, vec_id) AS rn
         |    FROM adc) WHERE rn <= 50),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |      FROM embeddings WHERE vec_id < 500)
         |SELECT CAST(2000001 AS BIGINT) AS query_id, vec_id, rank FROM (
         |  SELECT v.vec_id,
         |    ROW_NUMBER() OVER (
         |      ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
         |      AS rank
         |  FROM v
         |  JOIN short USING (vec_id)
         |  CROSS JOIN (SELECT e FROM v WHERE vec_id = 1) qv)
         |WHERE rank <= 20 ORDER BY rank""".stripMargin
    },

    // the retention sweep replayed blind to EVERYTHING: dates 01/02
    // expire ⇒ docs with doc_id % 5 < 2 leave both indexes. The BM25
    // leg re-derives N/T/df over the retained docs; the ANN leg replays
    // Lloyd on the ORIGINAL corpus (the sweep never retrains), vec 2's
    // top-3 probe cells, and in-cell cosine over the retained vectors.
    // A resurrect-by-replay (the post-drop empty-id-set hazard) would
    // put swept docs back into both legs and break the hash
    "retention_sweep" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 1000 AND doc_id % 5 >= 2),
        |toks AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\\s+', ' ', 'g'), ' ')) AS token
        |    FROM d) WHERE token <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM d) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN ('vector', 'hash', 'merge')
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |sb AS (
        |  SELECT doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w CROSS JOIN meta GROUP BY doc_id),
        |bm AS (
        |  SELECT doc_id AS id, rank FROM (
        |    SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |    FROM sb) WHERE rank <= 20),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 8),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c2 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT j FROM (
        |    SELECT j, row_number() OVER (ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id = 2) WHERE rn <= 3),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |ann AS (
        |  SELECT vec_id AS id, CAST(rank AS BIGINT) AS rank FROM (
        |    SELECT v.vec_id,
        |      ROW_NUMBER() OVER (
        |        ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |        AS rank
        |    FROM v
        |    JOIN fa ON fa.vec_id = v.vec_id
        |    CROSS JOIN (SELECT e FROM v WHERE vec_id = 2) qv
        |    WHERE v.vec_id <> 2
        |      AND NOT (v.vec_id < 1000 AND v.vec_id % 5 < 2)
        |      AND fa.cluster IN (SELECT j FROM probe))
        |  WHERE rank <= 20)
        |SELECT 'bm25' AS leg, id, rank FROM bm
        |UNION ALL
        |SELECT 'ann' AS leg, id, rank FROM ann
        |ORDER BY leg, rank""".stripMargin,

    // the 4-leg serving stack replayed per request: BM25 off one shared
    // df table, a GENERIC per-query phrase-anchor intersection, a
    // GENERIC per-query min-window recurrence (a non-equi last-position
    // join — the oracle's O(occ²) form of the running max), the Lloyd
    // probe + in-cell cosine, then the fusion as a UNION-ALL + GROUP BY
    // (each leg contributes ≤ 1 row per (query, doc), so the grouped sum
    // IS the full-outer cascade)
    "retrieval_hybrid_serve3" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |qterms(query_id, token) AS (
        |  SELECT * FROM (VALUES (0, 'vector'), (0, 'hash'), (0, 'merge'),
        |         (1, 'table'), (1, 'hash')) AS qt(query_id, token)),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN (SELECT DISTINCT token FROM qterms)
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |sc AS (
        |  SELECT qt.query_id, w.doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w JOIN qterms qt USING (token) CROSS JOIN meta
        |  GROUP BY 1, 2),
        |lex AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS rank
        |    FROM sc) WHERE rank <= 50),
        |qphrase(query_id, token, slot) AS (
        |  SELECT * FROM (VALUES (0, 'table', 0), (0, 'hash', 1),
        |         (1, 'vector', 0), (1, 'hash', 1))
        |    AS qp(query_id, token, slot)),
        |plen AS (SELECT query_id, count(*) AS phrase_len
        |         FROM qphrase GROUP BY 1),
        |panchor AS (
        |  SELECT q.query_id, t.doc_id, t.pos - q.slot AS anchor
        |  FROM toks t JOIN qphrase q USING (token)
        |  WHERE t.pos - q.slot >= 0),
        |pocc AS (
        |  SELECT query_id, doc_id, anchor, count(*) AS n_slots
        |  FROM panchor GROUP BY 1, 2, 3),
        |phr AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT o.query_id, o.doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY o.query_id ORDER BY count(*) DESC, o.doc_id)
        |      AS BIGINT) AS rank
        |    FROM pocc o JOIN plen USING (query_id)
        |    WHERE o.n_slots = plen.phrase_len
        |    GROUP BY o.query_id, o.doc_id) WHERE rank <= 50),
        |qprox(query_id, token) AS (
        |  SELECT * FROM (VALUES (0, 'vector'), (0, 'hash'), (0, 'merge'),
        |         (1, 'table'), (1, 'hash')) AS qx(query_id, token)),
        |xpts AS (
        |  SELECT q.query_id, t.doc_id, t.pos, t.token
        |  FROM toks t JOIN qprox q USING (token)),
        |xanchor AS (SELECT DISTINCT query_id, doc_id, pos FROM xpts),
        |xlast AS (
        |  SELECT a.query_id, a.doc_id, a.pos, q.token,
        |         max(t2.pos) AS last_pos
        |  FROM xanchor a
        |  JOIN qprox q ON q.query_id = a.query_id
        |  LEFT JOIN xpts t2 ON t2.query_id = a.query_id
        |    AND t2.doc_id = a.doc_id AND t2.token = q.token
        |    AND t2.pos <= a.pos
        |  GROUP BY 1, 2, 3, 4),
        |xwl AS (
        |  SELECT query_id, doc_id, pos - min(last_pos) + 1 AS window_len
        |  FROM xlast GROUP BY query_id, doc_id, pos
        |  HAVING count(last_pos) = count(*)),
        |prox AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY min(window_len), doc_id)
        |      AS BIGINT) AS rank
        |    FROM xwl GROUP BY query_id, doc_id) WHERE rank <= 50),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 16),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |${lloydRoundSql(3)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT vec_id AS query_id, j FROM (
        |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id IN (0, 1)) WHERE rn <= 4),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sem AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT pr.query_id, v.vec_id AS doc_id,
        |      CAST(ROW_NUMBER() OVER (PARTITION BY pr.query_id
        |        ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |        AS BIGINT) AS rank
        |    FROM v
        |    JOIN fa ON fa.vec_id = v.vec_id
        |    JOIN probe pr ON pr.j = fa.cluster
        |    JOIN v qv ON qv.vec_id = pr.query_id
        |    WHERE v.vec_id <> pr.query_id) WHERE rank <= 50),
        |legs AS (
        |  SELECT query_id, doc_id, rank FROM lex
        |  UNION ALL SELECT query_id, doc_id, rank FROM phr
        |  UNION ALL SELECT query_id, doc_id, rank FROM prox
        |  UNION ALL SELECT query_id, doc_id, rank FROM sem),
        |fused AS (
        |  SELECT query_id, doc_id,
        |         CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm,
        |         count(*) AS n_legs
        |  FROM legs GROUP BY 1, 2)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_ppm,
        |       n_legs, rank
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_ppm DESC, doc_id) AS rank FROM fused)
        |WHERE rank <= 20
        |ORDER BY query_id, rank""".stripMargin,

    // the delete × hybrid composition replayed blind to tombstones:
    // both legs re-derive over corpus-minus-deleted (doc_id % 9 <> 4) —
    // the BM25 constants and df over the retained docs, Lloyd on the
    // ORIGINAL corpus (deletes never retrain) with candidates filtered,
    // then the identical per-(query, doc) fusion. A doc either leg
    // resurrects through the fuse's union breaks the hash
    "retrieval_hybrid_delete" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 1000 AND doc_id % 9 <> 4),
        |toks AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |        '\\s+', ' ', 'g'), ' ')) AS token
        |    FROM d) WHERE token <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM d) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |qterms(query_id, token) AS (
        |  SELECT * FROM (VALUES (0, 'vector'), (0, 'hash'), (0, 'merge'),
        |         (1, 'table'), (1, 'hash')) AS qt(query_id, token)),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN (SELECT DISTINCT token FROM qterms)
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |sc AS (
        |  SELECT qt.query_id, w.doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w JOIN qterms qt USING (token) CROSS JOIN meta
        |  GROUP BY 1, 2),
        |lex AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS rank
        |    FROM sc) WHERE rank <= 50),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 8),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c2 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT vec_id AS query_id, j FROM (
        |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id IN (0, 1)) WHERE rn <= 4),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sem AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT pr.query_id, v.vec_id AS doc_id,
        |      CAST(ROW_NUMBER() OVER (PARTITION BY pr.query_id
        |        ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |        AS BIGINT) AS rank
        |    FROM v
        |    JOIN fa ON fa.vec_id = v.vec_id
        |    JOIN probe pr ON pr.j = fa.cluster
        |    JOIN v qv ON qv.vec_id = pr.query_id
        |    WHERE v.vec_id <> pr.query_id
        |      AND NOT (v.vec_id < 1000 AND v.vec_id % 9 = 4))
        |  WHERE rank <= 50),
        |legs AS (
        |  SELECT query_id, doc_id, rank FROM lex
        |  UNION ALL SELECT query_id, doc_id, rank FROM sem),
        |fused AS (
        |  SELECT query_id, doc_id,
        |         CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm,
        |         count(*) AS n_legs
        |  FROM legs GROUP BY 1, 2)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_ppm,
        |       n_legs, rank
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_ppm DESC, doc_id) AS rank FROM fused)
        |WHERE rank <= 20
        |ORDER BY query_id, rank""".stripMargin,

    // the results-page replay: both legs + fusion (the serve oracle's
    // shape, 2 requests), then per fused winner the GENERIC min-window
    // recurrence over the request's terms — LEFT joined, so a
    // semantic-only hit carries NULL evidence — and the token-span
    // slice for window-bearing winners only
    "retrieval_hybrid_snippet" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |qterms(query_id, token) AS (
        |  SELECT * FROM (VALUES (0, 'vector'), (0, 'hash'), (0, 'merge'),
        |         (1, 'table'), (1, 'hash')) AS qt(query_id, token)),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN (SELECT DISTINCT token FROM qterms)
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |sc AS (
        |  SELECT qt.query_id, w.doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w JOIN qterms qt USING (token) CROSS JOIN meta
        |  GROUP BY 1, 2),
        |lex AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS rank
        |    FROM sc) WHERE rank <= 50),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 16),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |${lloydRoundSql(3)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT vec_id AS query_id, j FROM (
        |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id IN (0, 1)) WHERE rn <= 4),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sem AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT pr.query_id, v.vec_id AS doc_id,
        |      CAST(ROW_NUMBER() OVER (PARTITION BY pr.query_id
        |        ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |        AS BIGINT) AS rank
        |    FROM v
        |    JOIN fa ON fa.vec_id = v.vec_id
        |    JOIN probe pr ON pr.j = fa.cluster
        |    JOIN v qv ON qv.vec_id = pr.query_id
        |    WHERE v.vec_id <> pr.query_id) WHERE rank <= 50),
        |legs AS (
        |  SELECT query_id, doc_id, rank FROM lex
        |  UNION ALL SELECT query_id, doc_id, rank FROM sem),
        |fused AS (
        |  SELECT query_id, doc_id,
        |         CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm,
        |         count(*) AS n_legs
        |  FROM legs GROUP BY 1, 2),
        |win AS (
        |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_ppm,
        |         n_legs, rank
        |  FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY rrf_ppm DESC, doc_id) AS rank FROM fused)
        |  WHERE rank <= 20),
        |xpts AS (
        |  SELECT q.query_id, t.doc_id, t.pos, t.token
        |  FROM toks t JOIN qterms q USING (token)),
        |xanchor AS (SELECT DISTINCT query_id, doc_id, pos FROM xpts),
        |xlast AS (
        |  SELECT a.query_id, a.doc_id, a.pos, q.token,
        |         max(t2.pos) AS last_pos
        |  FROM xanchor a
        |  JOIN qterms q ON q.query_id = a.query_id
        |  LEFT JOIN xpts t2 ON t2.query_id = a.query_id
        |    AND t2.doc_id = a.doc_id AND t2.token = q.token
        |    AND t2.pos <= a.pos
        |  GROUP BY 1, 2, 3, 4),
        |xwl AS (
        |  SELECT query_id, doc_id,
        |         pos - min(last_pos) + 1 AS window_len,
        |         min(last_pos) AS win_start
        |  FROM xlast GROUP BY query_id, doc_id, pos
        |  HAVING count(last_pos) = count(*)),
        |bw AS (
        |  SELECT query_id, doc_id,
        |         CAST(window_len AS BIGINT) AS window_len,
        |         CAST(win_start AS BIGINT) AS win_start FROM (
        |    SELECT query_id, doc_id, window_len, win_start,
        |           row_number() OVER (PARTITION BY query_id, doc_id
        |             ORDER BY window_len, win_start) AS rn
        |    FROM xwl) WHERE rn = 1)
        |SELECT win.query_id, win.doc_id, win.rrf_ppm, win.n_legs,
        |       win.rank, bw.window_len, bw.win_start,
        |       CASE WHEN bw.window_len IS NOT NULL THEN
        |         array_to_string(
        |           d.lst[CAST(bw.win_start + 1 AS BIGINT) :
        |                 CAST(bw.win_start + bw.window_len AS BIGINT)], ' ')
        |       END AS snippet
        |FROM win
        |LEFT JOIN bw ON bw.query_id = win.query_id
        |  AND bw.doc_id = win.doc_id
        |LEFT JOIN d ON d.doc_id = win.doc_id
        |ORDER BY win.query_id, win.rank""".stripMargin,

    // the results-page replay with the exact-phrase boost: THREE rank
    // lists per request (BM25 + phrase-anchor intersection + Lloyd-probe
    // ANN), the identical fusion, then evidence with PHRASE PREFERENCE —
    // per winner, the first full phrase occurrence (min anchor, phrase
    // length) where one exists, COALESCE'd over the terms min-window
    // recurrence; semantic-only winners stay NULL; the token-span slice
    // renders whichever window won
    "retrieval_hybrid_snippet_phrase" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |qterms(query_id, token) AS (
        |  SELECT * FROM (VALUES (0, 'vector'), (0, 'hash'), (0, 'merge'),
        |         (1, 'table'), (1, 'hash')) AS qt(query_id, token)),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN (SELECT DISTINCT token FROM qterms)
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |sc AS (
        |  SELECT qt.query_id, w.doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w JOIN qterms qt USING (token) CROSS JOIN meta
        |  GROUP BY 1, 2),
        |lex AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS rank
        |    FROM sc) WHERE rank <= 50),
        |qphrase(query_id, token, slot) AS (
        |  SELECT * FROM (VALUES (0, 'table', 0), (0, 'hash', 1),
        |         (1, 'vector', 0), (1, 'hash', 1))
        |    AS qp(query_id, token, slot)),
        |plen AS (SELECT query_id, count(*) AS phrase_len
        |         FROM qphrase GROUP BY 1),
        |panchor AS (
        |  SELECT q.query_id, t.doc_id, t.pos - q.slot AS anchor
        |  FROM toks t JOIN qphrase q USING (token)
        |  WHERE t.pos - q.slot >= 0),
        |pocc AS (
        |  SELECT query_id, doc_id, anchor, count(*) AS n_slots
        |  FROM panchor GROUP BY 1, 2, 3),
        |phr AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT o.query_id, o.doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY o.query_id ORDER BY count(*) DESC, o.doc_id)
        |      AS BIGINT) AS rank
        |    FROM pocc o JOIN plen USING (query_id)
        |    WHERE o.n_slots = plen.phrase_len
        |    GROUP BY o.query_id, o.doc_id) WHERE rank <= 50),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 16),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |${lloydRoundSql(3)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT vec_id AS query_id, j FROM (
        |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id IN (0, 1)) WHERE rn <= 4),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sem AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT pr.query_id, v.vec_id AS doc_id,
        |      CAST(ROW_NUMBER() OVER (PARTITION BY pr.query_id
        |        ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |        AS BIGINT) AS rank
        |    FROM v
        |    JOIN fa ON fa.vec_id = v.vec_id
        |    JOIN probe pr ON pr.j = fa.cluster
        |    JOIN v qv ON qv.vec_id = pr.query_id
        |    WHERE v.vec_id <> pr.query_id) WHERE rank <= 50),
        |legs AS (
        |  SELECT query_id, doc_id, rank FROM lex
        |  UNION ALL SELECT query_id, doc_id, rank FROM phr
        |  UNION ALL SELECT query_id, doc_id, rank FROM sem),
        |fused AS (
        |  SELECT query_id, doc_id,
        |         CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm,
        |         count(*) AS n_legs
        |  FROM legs GROUP BY 1, 2),
        |win AS (
        |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_ppm,
        |         n_legs, rank
        |  FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY rrf_ppm DESC, doc_id) AS rank FROM fused)
        |  WHERE rank <= 20),
        |pbw AS (
        |  SELECT o.query_id, o.doc_id,
        |         CAST(plen.phrase_len AS BIGINT) AS window_len,
        |         CAST(min(o.anchor) AS BIGINT) AS win_start
        |  FROM pocc o JOIN plen USING (query_id)
        |  WHERE o.n_slots = plen.phrase_len
        |  GROUP BY o.query_id, o.doc_id, plen.phrase_len),
        |xpts AS (
        |  SELECT q.query_id, t.doc_id, t.pos, t.token
        |  FROM toks t JOIN qterms q USING (token)),
        |xanchor AS (SELECT DISTINCT query_id, doc_id, pos FROM xpts),
        |xlast AS (
        |  SELECT a.query_id, a.doc_id, a.pos, q.token,
        |         max(t2.pos) AS last_pos
        |  FROM xanchor a
        |  JOIN qterms q ON q.query_id = a.query_id
        |  LEFT JOIN xpts t2 ON t2.query_id = a.query_id
        |    AND t2.doc_id = a.doc_id AND t2.token = q.token
        |    AND t2.pos <= a.pos
        |  GROUP BY 1, 2, 3, 4),
        |xwl AS (
        |  SELECT query_id, doc_id,
        |         pos - min(last_pos) + 1 AS window_len,
        |         min(last_pos) AS win_start
        |  FROM xlast GROUP BY query_id, doc_id, pos
        |  HAVING count(last_pos) = count(*)),
        |bw AS (
        |  SELECT query_id, doc_id,
        |         CAST(window_len AS BIGINT) AS window_len,
        |         CAST(win_start AS BIGINT) AS win_start FROM (
        |    SELECT query_id, doc_id, window_len, win_start,
        |           row_number() OVER (PARTITION BY query_id, doc_id
        |             ORDER BY window_len, win_start) AS rn
        |    FROM xwl) WHERE rn = 1),
        |ev AS (
        |  SELECT win.query_id, win.doc_id, win.rrf_ppm, win.n_legs,
        |         win.rank,
        |         COALESCE(pbw.window_len, bw.window_len) AS window_len,
        |         COALESCE(pbw.win_start, bw.win_start) AS win_start
        |  FROM win
        |  LEFT JOIN pbw ON pbw.query_id = win.query_id
        |    AND pbw.doc_id = win.doc_id
        |  LEFT JOIN bw ON bw.query_id = win.query_id
        |    AND bw.doc_id = win.doc_id)
        |SELECT ev.query_id, ev.doc_id, ev.rrf_ppm, ev.n_legs, ev.rank,
        |       ev.window_len, ev.win_start,
        |       CASE WHEN ev.window_len IS NOT NULL THEN
        |         array_to_string(
        |           d.lst[CAST(ev.win_start + 1 AS BIGINT) :
        |                 CAST(ev.win_start + ev.window_len AS BIGINT)], ' ')
        |       END AS snippet
        |FROM ev
        |LEFT JOIN d ON d.doc_id = ev.doc_id
        |ORDER BY ev.query_id, ev.rank""".stripMargin,

    // the maximal results-page replay: serve3's four rank lists (BM25 /
    // phrase / proximity / ANN — prox_terms == terms here, so the one
    // min-window recurrence feeds BOTH the proximity leg and the terms
    // evidence fallback) + the 4-way fusion, then snippet_phrase's
    // evidence tail: phrase-anchor first-occurrence windows COALESCEd
    // over the terms min-window, and the token-span slice
    "retrieval_hybrid_page4" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(COALESCE(text, ''))),
        |      '\\s+', ' ', 'g'), ' ') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lst[i] AS token, i - 1 AS pos
        |  FROM d, LATERAL (
        |    SELECT unnest(generate_series(1, len(lst))) AS i) u
        |  WHERE lst[i] <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |         (SELECT count(*) FROM toks) AS t),
        |qterms(query_id, token) AS (
        |  SELECT * FROM (VALUES (0, 'vector'), (0, 'hash'), (0, 'merge'),
        |         (1, 'table'), (1, 'hash')) AS qt(query_id, token)),
        |m AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM toks WHERE token IN (SELECT DISTINCT token FROM qterms)
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT m.doc_id, token, tf, dl.dl,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM m JOIN dl USING (doc_id)),
        |sc AS (
        |  SELECT qt.query_id, w.doc_id,
        |         CAST(sum(
        |           (((n - df + 1) * 1000000) // (df + 1)) * tf * (1000 + 1200)
        |           // (tf * 1000 +
        |              (1200 * ((1000 - 750) + (750 * dl * n) // t)) // 1000)
        |         ) AS BIGINT) AS score
        |  FROM w JOIN qterms qt USING (token) CROSS JOIN meta
        |  GROUP BY 1, 2),
        |lex AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS rank
        |    FROM sc) WHERE rank <= 50),
        |qphrase(query_id, token, slot) AS (
        |  SELECT * FROM (VALUES (0, 'table', 0), (0, 'hash', 1),
        |         (1, 'vector', 0), (1, 'hash', 1))
        |    AS qp(query_id, token, slot)),
        |plen AS (SELECT query_id, count(*) AS phrase_len
        |         FROM qphrase GROUP BY 1),
        |panchor AS (
        |  SELECT q.query_id, t.doc_id, t.pos - q.slot AS anchor
        |  FROM toks t JOIN qphrase q USING (token)
        |  WHERE t.pos - q.slot >= 0),
        |pocc AS (
        |  SELECT query_id, doc_id, anchor, count(*) AS n_slots
        |  FROM panchor GROUP BY 1, 2, 3),
        |phr AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT o.query_id, o.doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY o.query_id ORDER BY count(*) DESC, o.doc_id)
        |      AS BIGINT) AS rank
        |    FROM pocc o JOIN plen USING (query_id)
        |    WHERE o.n_slots = plen.phrase_len
        |    GROUP BY o.query_id, o.doc_id) WHERE rank <= 50),
        |xpts AS (
        |  SELECT q.query_id, t.doc_id, t.pos, t.token
        |  FROM toks t JOIN qterms q USING (token)),
        |xanchor AS (SELECT DISTINCT query_id, doc_id, pos FROM xpts),
        |xlast AS (
        |  SELECT a.query_id, a.doc_id, a.pos, q.token,
        |         max(t2.pos) AS last_pos
        |  FROM xanchor a
        |  JOIN qterms q ON q.query_id = a.query_id
        |  LEFT JOIN xpts t2 ON t2.query_id = a.query_id
        |    AND t2.doc_id = a.doc_id AND t2.token = q.token
        |    AND t2.pos <= a.pos
        |  GROUP BY 1, 2, 3, 4),
        |xwl AS (
        |  SELECT query_id, doc_id,
        |         pos - min(last_pos) + 1 AS window_len,
        |         min(last_pos) AS win_start
        |  FROM xlast GROUP BY query_id, doc_id, pos
        |  HAVING count(last_pos) = count(*)),
        |prox AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY min(window_len), doc_id)
        |      AS BIGINT) AS rank
        |    FROM xwl GROUP BY query_id, doc_id) WHERE rank <= 50),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(round((x + 1.0) * 4096) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |p AS (SELECT vec_id, d, q[d] AS v FROM q CROSS JOIN dims),
        |seeds AS (
        |  SELECT q, row_number() OVER (
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |  FROM q),
        |c0 AS (
        |  SELECT sd.j, dims.d, sd.q[dims.d] AS c
        |  FROM seeds sd CROSS JOIN dims WHERE sd.j < 16),
        |${lloydRoundSql(1)},
        |${lloydRoundSql(2)},
        |${lloydRoundSql(3)},
        |fd AS (
        |  SELECT p.vec_id, c.j, sum((p.v - c.c)*(p.v - c.c)) AS dist
        |  FROM p JOIN c3 c USING (d) GROUP BY 1, 2),
        |fa AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, j AS cluster,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY dist, j) AS rn
        |    FROM fd) WHERE rn = 1),
        |probe AS (
        |  SELECT vec_id AS query_id, j FROM (
        |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, j) AS rn
        |    FROM fd WHERE vec_id IN (0, 1)) WHERE rn <= 4),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sem AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT pr.query_id, v.vec_id AS doc_id,
        |      CAST(ROW_NUMBER() OVER (PARTITION BY pr.query_id
        |        ORDER BY list_cosine_similarity(v.e, qv.e) DESC, v.vec_id)
        |        AS BIGINT) AS rank
        |    FROM v
        |    JOIN fa ON fa.vec_id = v.vec_id
        |    JOIN probe pr ON pr.j = fa.cluster
        |    JOIN v qv ON qv.vec_id = pr.query_id
        |    WHERE v.vec_id <> pr.query_id) WHERE rank <= 50),
        |legs AS (
        |  SELECT query_id, doc_id, rank FROM lex
        |  UNION ALL SELECT query_id, doc_id, rank FROM phr
        |  UNION ALL SELECT query_id, doc_id, rank FROM prox
        |  UNION ALL SELECT query_id, doc_id, rank FROM sem),
        |fused AS (
        |  SELECT query_id, doc_id,
        |         CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm,
        |         count(*) AS n_legs
        |  FROM legs GROUP BY 1, 2),
        |win AS (
        |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_ppm,
        |         n_legs, rank
        |  FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY rrf_ppm DESC, doc_id) AS rank FROM fused)
        |  WHERE rank <= 20),
        |pbw AS (
        |  SELECT o.query_id, o.doc_id,
        |         CAST(plen.phrase_len AS BIGINT) AS window_len,
        |         CAST(min(o.anchor) AS BIGINT) AS win_start
        |  FROM pocc o JOIN plen USING (query_id)
        |  WHERE o.n_slots = plen.phrase_len
        |  GROUP BY o.query_id, o.doc_id, plen.phrase_len),
        |bw AS (
        |  SELECT query_id, doc_id,
        |         CAST(window_len AS BIGINT) AS window_len,
        |         CAST(win_start AS BIGINT) AS win_start FROM (
        |    SELECT query_id, doc_id, window_len, win_start,
        |           row_number() OVER (PARTITION BY query_id, doc_id
        |             ORDER BY window_len, win_start) AS rn
        |    FROM xwl) WHERE rn = 1),
        |ev AS (
        |  SELECT win.query_id, win.doc_id, win.rrf_ppm, win.n_legs,
        |         win.rank,
        |         COALESCE(pbw.window_len, bw.window_len) AS window_len,
        |         COALESCE(pbw.win_start, bw.win_start) AS win_start
        |  FROM win
        |  LEFT JOIN pbw ON pbw.query_id = win.query_id
        |    AND pbw.doc_id = win.doc_id
        |  LEFT JOIN bw ON bw.query_id = win.query_id
        |    AND bw.doc_id = win.doc_id)
        |SELECT ev.query_id, ev.doc_id, ev.rrf_ppm, ev.n_legs, ev.rank,
        |       ev.window_len, ev.win_start,
        |       CASE WHEN ev.window_len IS NOT NULL THEN
        |         array_to_string(
        |           d.lst[CAST(ev.win_start + 1 AS BIGINT) :
        |                 CAST(ev.win_start + ev.window_len AS BIGINT)], ' ')
        |       END AS snippet
        |FROM ev
        |LEFT JOIN d ON d.doc_id = ev.doc_id
        |ORDER BY ev.query_id, ev.rank""".stripMargin,

    "text_quality_gopher" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |      AS non_ws,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
        |      AS n_symbols,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |                         x -> regexp_matches(x, '[A-Za-z]')))
        |         AS BIGINT) AS alpha_words,
        |    (CASE WHEN regexp_matches(text, '\bthe\b') THEN 1 ELSE 0 END
        |     + CASE WHEN regexp_matches(text, '\ba\b') THEN 1 ELSE 0 END
        |     + CASE WHEN regexp_matches(text, '\bof\b') THEN 1 ELSE 0 END
        |     + CASE WHEN regexp_matches(text, '\band\b') THEN 1 ELSE 0 END
        |     + CASE WHEN regexp_matches(text, '\bor\b') THEN 1 ELSE 0 END
        |     + CASE WHEN regexp_matches(text, '\bin\b') THEN 1 ELSE 0 END)
        |      AS n_stop_present
        |  FROM documents)
        |SELECT doc_id, n_words,
        |  CASE WHEN n_words > 0 THEN non_ws / n_words ELSE 0.0 END
        |    AS mean_word_len,
        |  CASE WHEN n_words > 0 THEN n_symbols / n_words ELSE 0.0 END
        |    AS symbol_ratio,
        |  CASE WHEN n_words > 0
        |       THEN CAST(alpha_words AS DOUBLE) / n_words ELSE 0.0 END
        |    AS alpha_word_ratio,
        |  CAST(n_stop_present AS BIGINT) AS n_stop_present,
        |  (n_words >= 20 AND n_words <= 80) AS flag_word_count,
        |  (CASE WHEN n_words > 0 THEN non_ws / n_words ELSE 0.0 END
        |     BETWEEN 3.0 AND 10.0) AS flag_mean_len,
        |  (CASE WHEN n_words > 0 THEN n_symbols / n_words ELSE 0.0 END
        |     <= 0.1) AS flag_symbols,
        |  (CASE WHEN n_words > 0
        |        THEN CAST(alpha_words AS DOUBLE) / n_words ELSE 0.0 END
        |     >= 0.8) AS flag_alpha,
        |  (n_stop_present >= 2) AS flag_stopwords,
        |  ((n_words >= 20 AND n_words <= 80)
        |   AND (CASE WHEN n_words > 0 THEN non_ws / n_words ELSE 0.0 END
        |          BETWEEN 3.0 AND 10.0)
        |   AND (CASE WHEN n_words > 0 THEN n_symbols / n_words ELSE 0.0 END
        |          <= 0.1)
        |   AND (CASE WHEN n_words > 0
        |             THEN CAST(alpha_words AS DOUBLE) / n_words ELSE 0.0 END
        |          >= 0.8)
        |   AND (n_stop_present >= 2)) AS pass_gopher
        |FROM f
        |ORDER BY doc_id""".stripMargin,

    "text_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         concat(text, ' contact ', source, '_',
        |                CAST(doc_id AS VARCHAR), '@example.com call +1-555-',
        |                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        |                ' from 10.', CAST(doc_id % 256 AS VARCHAR), '.0.1')
        |           AS pii_text
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(pii_text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |      AS n_emails,
        |    CAST(len(regexp_extract_all(pii_text,
        |      '(?:\+|\b)[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}|\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b'))
        |      AS BIGINT) AS n_phones,
        |    CAST(len(regexp_extract_all(pii_text,
        |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |    regexp_replace(regexp_replace(regexp_replace(pii_text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '(?:\+|\b)[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}|\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b', '<PHONE>', 'g'),
        |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS redacted
        |  FROM p)
        |SELECT doc_id, n_emails, n_phones, n_ips,
        |       CAST(length(redacted) AS BIGINT) AS redacted_len,
        |       md5(redacted) AS redacted_md5
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    "dedup_spans" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ws
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
        |         md5(array_to_string(ws[(i*10+1):(i*10+10)], ' ')) AS span_key
        |  FROM (SELECT doc_id, ws,
        |          unnest(generate_series(0,
        |            CAST(floor((len(ws) - 1) / 10.0) AS INT))) AS i
        |        FROM w WHERE len(ws) > 0)),
        |ranked AS (
        |  SELECT doc_id, span_idx, span_key,
        |         row_number() OVER (PARTITION BY span_key
        |                            ORDER BY doc_id, span_idx) AS rn
        |  FROM spans)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_spans,
        |       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |       CASE WHEN count(*) FILTER (WHERE rn = 1) > 0
        |            THEN md5(string_agg(CASE WHEN rn = 1 THEN span_key END,
        |                                ' ' ORDER BY span_idx))
        |            ELSE NULL END AS kept_md5
        |FROM ranked
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "pipeline_curate_neardup" ->
      s"""WITH RECURSIVE f AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_tokens,
         |    CAST(length(text) AS DOUBLE) AS n_chars_d,
         |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS n_punct,
         |    CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|or|in)\\b')) AS DOUBLE) AS n_stop
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang, text, n_tokens,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + (1.0 - CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d ELSE 0.0 END) * 0.3
         |      + least(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 5.0, 1.0) * 0.3
         |      AS quality_score
         |  FROM f),
         |s AS (SELECT * FROM q WHERE quality_score >= 0.5),
         |g AS (
         |  SELECT doc_id, lang,
         |    list_distinct(CASE WHEN length(norm) >= 3
         |      THEN [substring(norm, i, 3) for i in range(1, length(norm) - 1)]
         |      ELSE [norm] END) AS grams
         |  FROM (SELECT doc_id, lang,
         |          regexp_replace(trim(lower(COALESCE(text, ''))), '\\s+', ' ', 'g') AS norm
         |        FROM s) t),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |        / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
         |           - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) AS jaccard
         |    FROM g a JOIN g b
         |      ON a.lang = b.lang AND a.doc_id < b.doc_id
         |     AND least(len(a.grams), len(b.grams)) + 1e-9
         |         >= greatest(len(a.grams), len(b.grams)) * 0.7) p
         |  WHERE jaccard >= 0.7),
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT u AS node, u AS comp FROM edges
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node)
         |SELECT s.doc_id, s.lang, s.n_tokens, s.quality_score,
         |       ${Assembly.hashSplitOracleCase("s.doc_id",
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS split
         |FROM s LEFT JOIN cc ON cc.node = s.doc_id
         |WHERE COALESCE(cc.component, s.doc_id) = s.doc_id
         |ORDER BY s.doc_id""".stripMargin,

    "embedding_label_stats" ->
      """WITH sc AS (
        |  SELECT label,
        |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
        |              AS BIGINT) AS vi,
        |         unnest(range(1, len(embedding) + 1)) AS dim
        |  FROM embeddings),
        |counts AS (
        |  SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label),
        |perdim AS (
        |  SELECT label, dim, SUM(vi) AS sum_vi,
        |         SUM(CAST(vi AS HUGEINT) * vi) AS sumsq_vi
        |  FROM sc GROUP BY label, dim),
        |perlabel AS (
        |  SELECT label,
        |         SUM(CAST(sum_vi AS HUGEINT) * sum_vi) AS csq,
        |         SUM(sumsq_vi) AS ssq
        |  FROM perdim GROUP BY label)
        |SELECT p.label, c.n_vectors,
        |  sqrt(CAST(csq AS DOUBLE)) / (CAST(n_vectors AS DOUBLE) * 1000000.0)
        |    AS centroid_norm,
        |  CAST(ssq AS DOUBLE) / (CAST(n_vectors AS DOUBLE) * 1e12)
        |    AS mean_sq_norm,
        |  CAST(ssq AS DOUBLE) / (CAST(n_vectors AS DOUBLE) * 1e12)
        |    - (sqrt(CAST(csq AS DOUBLE)) / (CAST(n_vectors AS DOUBLE) * 1000000.0))
        |      * (sqrt(CAST(csq AS DOUBLE)) / (CAST(n_vectors AS DOUBLE) * 1000000.0))
        |    AS variance_trace
        |FROM perlabel p JOIN counts c USING (label)
        |ORDER BY label""".stripMargin,

    "profile_documents" ->
      """WITH w AS (
        |  SELECT COUNT(*) AS n_rows,
        |    COUNT(doc_id)  AS c1n, COUNT(DISTINCT doc_id)  AS c1d,
        |      CAST(MIN(doc_id)  AS VARCHAR) AS c1mn, CAST(MAX(doc_id)  AS VARCHAR) AS c1mx,
        |    COUNT(lang)    AS c2n, COUNT(DISTINCT lang)    AS c2d,
        |      CAST(MIN(lang)    AS VARCHAR) AS c2mn, CAST(MAX(lang)    AS VARCHAR) AS c2mx,
        |    COUNT(source)  AS c3n, COUNT(DISTINCT source)  AS c3d,
        |      CAST(MIN(source)  AS VARCHAR) AS c3mn, CAST(MAX(source)  AS VARCHAR) AS c3mx,
        |    COUNT(n_chars) AS c4n, COUNT(DISTINCT n_chars) AS c4d,
        |      CAST(MIN(n_chars) AS VARCHAR) AS c4mn, CAST(MAX(n_chars) AS VARCHAR) AS c4mx
        |  FROM documents)
        |SELECT column_name, n_rows, n_nonnull,
        |       n_rows - n_nonnull AS n_nulls,
        |       n_distinct, min_value, max_value
        |FROM (
        |  SELECT 'doc_id' AS column_name, n_rows, c1n AS n_nonnull,
        |         c1d AS n_distinct, c1mn AS min_value, c1mx AS max_value FROM w
        |  UNION ALL
        |  SELECT 'lang', n_rows, c2n, c2d, c2mn, c2mx FROM w
        |  UNION ALL
        |  SELECT 'source', n_rows, c3n, c3d, c3mn, c3mx FROM w
        |  UNION ALL
        |  SELECT 'n_chars', n_rows, c4n, c4d, c4mn, c4mx FROM w)
        |ORDER BY column_name""".stripMargin)
}
