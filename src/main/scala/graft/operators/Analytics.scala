package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The reference's downstream analytical surface (SURVEY.md §2C — the
  * queries its README and TimescaleDB migration define over landed data,
  * `/root/reference/README.md:519-533`,
  * `migrations/001_initial_schema.sql:38-53`), promoted to first-class
  * engine queries, plus TPC-H-shaped join/window analytics exercising the
  * same operators at scale.
  *
  * Scale posture:
  *   - top-k goes through `orderBy(...).limit(k)` which Spark plans as
  *     TakeOrderedAndProject — per-partition heaps + driver merge of k rows,
  *     never a full sort;
  *   - aggregates are hash aggregates with map-side partial combine;
  *   - small dimensions (nation, region) are broadcast explicitly so the
  *     big fact side never shuffles for them;
  *   - time-bucketing is `date_trunc` — a scalar projection, so bucket+key
  *     aggregation remains a single shuffle.
  *
  * Cross-engine determinism: double aggregates go through exact DECIMAL
  * sums (see [[decSum]]) cast back to DOUBLE, making results independent of
  * partitioning and accumulation order — required for the DuckDB oracle
  * hash-compare and a property worth having at 1000 executors anyway.
  */
object Analytics {

  /** Exact sum of a double expression: cast each value to DECIMAL(18,s)
    * first (decimal addition is associative — no float drift), return
    * DOUBLE. The oracle mirrors: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-insensitive mean with the same trick; mirrors
    * CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x).
    */
  def decAvg(c: Column, scale: Int = 2): Column =
    decSum(c, scale) / count(c)

  /** C1 — recent-N scan (README.md:520-521): top-k by time, newest first.
    * Unique tie-break on event_id keeps the result set deterministic.
    */
  def recentTopK(events: DataFrame, k: Int = 10): DataFrame =
    events
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .limit(k)

  /** C2 — time-range filter + grouped aggregate (README.md:523-527):
    * AVG(value) per event_type over a fixed window (the reference uses
    * NOW()-1h; a literal range keeps the query pure/deterministic).
    */
  def timeRangeAgg(events: DataFrame, fromTs: String, toTs: String): DataFrame =
    events
      .filter(col("ts") >= lit(fromTs).cast("timestamp")
        && col("ts") < lit(toTs).cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(
        decAvg(col("value")).as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** C3 — JSON field extraction + predicate (README.md:529-533). */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"))
      .filter(col("k_str").isNotNull)
      // try_cast, not cast: under ANSI mode one malformed record would
      // otherwise kill a full-corpus scan (null-on-malformed is the
      // documented A4 contract)
      .withColumn("k", expr("try_cast(k_str AS int)"))
      .drop("k_str")
      .orderBy(col("event_id"))

  /** C4 — time-bucketed continuous aggregate
    * (migrations/001_initial_schema.sql:38-53): time_bucket('1 hour') ×
    * topic with AVG/MIN/MAX/COUNT. The streaming twin (watermark + tumbling
    * window) lives in graft.streaming; this is the batch/backfill shape.
    */
  def timeBucketAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"),
        col("event_type"))
      .agg(
        decAvg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("n"))
      .orderBy(col("bucket_us"), col("event_type"))

  /** TPC-H Q1-shaped pricing summary over lineitem: the canonical
    * hash-aggregate-with-partial-combine workload.
    */
  def pricingSummary(li: DataFrame): DataFrame =
    li
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
          .as("sum_disc_price"),
        decAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q5-shaped: revenue per nation through a 5-way join. nation and
    * region are broadcast (tiny dims); lineitem⋈orders and ⋈customer are
    * the only shuffles, on their join keys — the plan that survives 100×.
    */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
          .as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-3 orders per customer by total price — ranking window function.
    * Deterministic tie-break on o_orderkey.
    */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** TPC-H Q6 shape — the pure scan-filter-aggregate workload: every
    * predicate reaches the parquet scan (PushedFilters), one partial+final
    * agg, no shuffle of data rows.
    */
  def forecastRevenue(li: DataFrame): DataFrame =
    li
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.03, 0.05)
        && col("l_quantity") < 24)
      .agg(
        decSum(col("l_extendedprice") * col("l_discount"), 8).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** TPC-H Q3 shape — shipping-priority top-k: selective dimension filter,
    * two key joins, aggregate, then TakeOrderedAndProject for the top 10.
    */
  def shippingPriority(
      li: DataFrame, o: DataFrame, c: DataFrame): DataFrame =
    li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c.filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")
        && col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("revenue"))
      .select(col("l_orderkey"),
        // o_orderdate is TIMESTAMP_NTZ from parquet; cast interprets it in
        // the (UTC) session zone, matching the oracle's epoch_us
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Running total per customer — cumulative window aggregate with
    * decimal-exact accumulation (cast back to double per row).
    */
  def runningOrderTotal(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate_us"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_totalprice"))
      .withColumn("running_total",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double"))
      .orderBy(col("o_custkey"), col("o_orderdate_us"), col("o_orderkey"))
  }

  /** Hierarchical subtotals: revenue by region/nation with ROLLUP —
    * grouping-set aggregation (one shuffle, no union of re-aggregations).
    */
  def revenueRollup(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
          .as("revenue"),
        grouping(col("r_name")).as("g_region"),
        grouping(col("n_name")).as("g_nation"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Set operation: customers active in BOTH 1996 and 1997 (INTERSECT),
    * planned as a semi-join pair — no distinct-union materialization.
    */
  def repeatCustomers(orders: DataFrame): DataFrame = {
    def activeIn(y: Int) = orders
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp")
        && col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    activeIn(1996).intersect(activeIn(1997))
      .orderBy(col("o_custkey"))
  }

  /** Inter-shipment gaps per supplier — lag window + epoch arithmetic
    * (exact microsecond deltas; no date-boundary ambiguity).
    */
  def shipmentGaps(li: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("ship_us"), col("l_orderkey"), col("l_linenumber"))
    li
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      .withColumn("prev_ship_us", lag(col("ship_us"), 1).over(w))
      .filter(col("prev_ship_us").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_gaps"),
        max(col("ship_us") - col("prev_ship_us")).as("max_gap_us"))
      .orderBy(col("l_suppkey"))
  }

  /** Order-priority check (TPC-H Q4 shape): EXISTS as a left-semi join —
    * no row multiplication, partial-agg friendly.
    */
  def orderPriorityCount(orders: DataFrame, li: DataFrame): DataFrame =
    orders
      .join(li.select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q22 shape — "rich but dormant" customers: an UNCORRELATED
    * scalar subquery (the global average balance — a 1-row aggregate,
    * broadcast; never a per-row recomputation) plus NOT EXISTS planned as
    * a LEFT ANTI join against the restricted order book (no pair
    * materialization, no distinct on the build side needed — anti join
    * short-circuits on first match). Per-nation aggregation on top is
    * partial-agg friendly. 100 TB: scan + broadcast + one anti shuffle +
    * one agg shuffle.
    */
  def dormantHighBalance(customer: DataFrame, orders: DataFrame): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0)
      .agg(decAvg(col("c_acctbal")).as("avg_bal"))
    customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_dormant"),
        decSum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H Q17 shape — correlated scalar subquery (`l_quantity <
    * 0.2 * avg(l_quantity) over the same part`) decorrelated the
    * Spark-first way: the inner aggregate becomes a grouped per-part
    * aggregate joined back on the part key — one extra agg + join
    * instead of a per-row subquery. The threshold compare is kept
    * INTEGER-EXACT: `qty < 0.2*avg` ⟺ `qty * 5 * cnt < sum` (quantities
    * are integral, products stay far under 2^53), so no float-division
    * boundary can disagree with the oracle. Brand filter is broadcast
    * and applied BEFORE the per-part aggregate — the subquery only ever
    * aggregates rows that can matter.
    */
  def smallQuantityRevenue(
      li: DataFrame,
      part: DataFrame,
      brand: String = "Brand#1"): DataFrame = {
    val brandParts = broadcast(
      part.filter(col("p_brand") === brand).select(col("p_partkey")))
    val liBrand = li.join(brandParts, col("l_partkey") === col("p_partkey"))
    val perPart = liBrand.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        count(col("l_quantity")).as("cnt_qty"))
    liBrand.join(perPart, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") * 5.0 * col("cnt_qty") < col("sum_qty"))
      .agg((decSum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** PIVOT — per-user activity matrix: event counts spread across one
    * column per event type. The EXPLICIT value list matters twice: it
    * keeps the plan a single grouping pass (no distinct-discovery job
    * over the corpus) and the output schema deterministic. Absent
    * combinations are 0 (matching the SQL FILTER-count formulation),
    * not null.
    */
  def userActivityPivot(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** TPC-H Q14 shape — conditional-aggregation ratio: the share of
    * monthly revenue coming from PROMO parts, both the numerator (CASE
    * inside SUM) and denominator computed in the SAME single aggregation
    * pass — never two scans joined back. Part is broadcast; decimal-exact
    * sums make the ratio bit-stable across partitionings.
    */
  def promoRevenueShare(li: DataFrame, part: DataFrame): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(unix_micros(date_trunc("month", col("l_shipdate")))
        .as("month_us"))
      .agg(
        decSum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 8)
          .as("promo_revenue"),
        decSum(rev, 8).as("total_revenue"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
      .orderBy(col("month_us"))
  }

  /** TPC-H Q16 shape — NOT IN as a LEFT ANTI join + COUNT(DISTINCT):
    * distinct suppliers per part brand, excluding an unwanted supplier
    * set. The exclusion list is tiny → broadcast anti join; the distinct
    * count is a two-phase hash aggregate (partial distinct map-side).
    */
  def supplierCountByBrand(
      li: DataFrame,
      part: DataFrame,
      supplier: DataFrame): DataFrame = {
    val excluded = supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    li.join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("p_brand"))
  }

  /** CUBE over (returnflag, linestatus): all four grouping sets computed
    * in ONE shuffle (Expand + single hash agg), never a union of
    * re-aggregations; GROUPING markers disambiguate subtotal rows from
    * genuine nulls.
    */
  def revenueCube(li: DataFrame): DataFrame =
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
          .as("revenue"),
        count(lit(1)).as("n_items"),
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Groupwise-min (TPC-H Q2 shape: "the supplier offering each part at
    * the minimum price"): the correlated min-subquery decorrelated into a
    * SINGLE aggregation pass — min over struct(price, suppkey) is the
    * lexicographic argmin with a deterministic suppkey tiebreak, so the
    * whole query is one lineitem shuffle on l_partkey. The textbook
    * two-pass form (agg min + join back on price equality) scans and
    * shuffles lineitem twice; the struct-min form halves that. Supplier
    * is a genuine dimension (10k rows/SF) — broadcast; part joins on the
    * already-partkey-shaped agg output.
    */
  def minCostSupplier(
      li: DataFrame,
      part: DataFrame,
      supplier: DataFrame): DataFrame =
    li.groupBy(col("l_partkey"))
      .agg(min(struct(col("l_extendedprice"), col("l_suppkey"))).as("w"))
      .select(col("l_partkey").as("p_partkey"),
        col("w.l_extendedprice").as("min_price"),
        col("w.l_suppkey").as("s_suppkey"))
      .join(part.select(col("p_partkey"), col("p_name")), Seq("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        Seq("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("min_price"))
      .orderBy(col("p_partkey"))

  /** EXCEPT (set difference): customers who ordered in `yearA` but not in
    * `yearB`. Catalyst plans except() as a distinct left-anti hash join —
    * one shuffle on the custkey after per-side pre-aggregation; the
    * anti-join build side is the (much smaller) distinct key set, never
    * raw orders.
    */
  def lapsedCustomers(orders: DataFrame, yearA: Int, yearB: Int): DataFrame = {
    def custsIn(y: Int) = orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
    custsIn(yearA).except(custsIn(yearB)).orderBy(col("o_custkey"))
  }

  /** Equi-width histogram: 10 bins over the global [min, max] of `value`
    * per event_type. Two passes: a 1-row bounds aggregate (broadcast into
    * every task as a literal-free cross join) + one grouped count — the
    * minimal distributed histogram. Bin arithmetic is plain IEEE double
    * ((v−lo)/width, floor, clamp) so the oracle reproduces it bit-exactly
    * given identical bounds (min/max are selections, always identical).
    * Degenerate lo=hi corpus maps everything to bin 0.
    */
  def valueHistogram(events: DataFrame, nBins: Int = 10): DataFrame = {
    val bounds = events.agg(
      min(col("value")).as("lo"), max(col("value")).as("hi"))
    events.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(nBins - 1L),
            floor((col("value") - col("lo"))
              / ((col("hi") - col("lo")) / nBins.toDouble)))))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** TPC-H Q19 shape — disjunctive join predicates (OR of brand×size×qty
    * conjunctions). The planner splits the OR: the common `p_partkey`
    * equi-key drives a broadcast hash join, per-side conjuncts usable as
    * pushdown (size/brand on the part scan, quantity on lineitem) get
    * extracted, and only the residual disjunction evaluates post-join —
    * the shape that matters when filters alone can't prune the scan.
    */
  def brandRevenue(li: DataFrame, part: DataFrame): DataFrame = {
    def clause(brand: String, sizeHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(clause("Brand#1", 5, 1, 11) ||
        clause("Brand#2", 10, 10, 20) ||
        clause("Brand#3", 15, 20, 30))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Per-nation customer spend quartiles: ntile + percent_rank in one
    * window pass, PARTITIONED by nation — a global (unpartitioned) ntile
    * would funnel every row through one task; partitioned quantile
    * assignment is the shape that scales (for a truly global ranking use
    * the range-partitioned sort + offset idiom in Assembly.globalShuffle).
    * percent_rank = (rank−1)/(n−1) is an integer ratio in IEEE double —
    * bit-identical cross-engine.
    */
  def customerSpendQuartiles(orders: DataFrame, customer: DataFrame): DataFrame = {
    val totals = orders.groupBy(col("o_custkey"))
      .agg(decSum(col("o_totalprice")).as("total_spend"),
        count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
    totals
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey"), col("c_nationkey"), col("total_spend"),
        col("n_orders"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"))
      .orderBy(col("o_custkey"))
  }

  /** OHLC downsampling (TimescaleDB candlestick / first-last parity —
    * the same delegated-analytics family as C4): open/high/low/close/
    * volume per hour bucket in ONE aggregation pass. open/close are
    * lexicographic struct-min/max over (ts, event_id, value) — argmin/
    * argmax with a deterministic event_id tiebreak that partial-aggregates
    * map-side like any min/max (no window, no second shuffle).
    */
  def ohlcBuckets(events: DataFrame): DataFrame =
    events
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("volume"))
      .orderBy(col("bucket_us"))

  /** Gap-filled time buckets with LOCF (TimescaleDB
    * `time_bucket_gapfill` + `locf()` parity): hourly per-type averages
    * on a DENSE bucket axis spanning [min, max] — absent buckets appear
    * with n_events = 0 and the average carried forward from the last
    * observed bucket (null before the first observation).
    *
    * Scale shape: the raw corpus is touched ONCE (the grouped aggregate);
    * everything after — bounds, axis generation, the axis⋈agg left join,
    * and the LOCF window — operates on bucket×type cardinality, which is
    * independent of corpus row count (hours × types, thousands of rows at
    * any data scale). The LOCF window partitions by type over that tiny
    * frame; it never sees raw events.
    */
  def gapFillLocf(events: DataFrame): DataFrame = {
    // lazy localCheckpoint: three consumers (axis bounds, the type set,
    // the join build side) share ONE materialization of the tiny
    // bucket×type aggregate — without it each consumer re-scans the raw
    // corpus (measured 3 full scans). Everything below derives from agg.
    val agg = events
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(decSum(col("value")).as("sum_value"), count(lit(1)).as("n_events"))
      .localCheckpoint(false)
    val bounds = agg.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val axis = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("bucket"))
      .crossJoin(agg.select(col("event_type")).distinct())
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    axis.join(agg, Seq("bucket", "event_type"), "left")
      .withColumn("avg_value", col("sum_value") / col("n_events"))
      .withColumn("value_locf", last(col("avg_value"), ignoreNulls = true).over(w))
      .select(unix_micros(col("bucket")).as("bucket_us"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("value_locf"))
      .orderBy(col("bucket_us"), col("event_type"))
  }

  /** TPC-H Q7 shape — directional trade-volume matrix: revenue by
    * (supplier nation, customer nation, ship year). Unlike canonical Q7
    * (one nation pair) the full matrix keeps the query meaningful at every
    * SF; the plan is the same: nation is broadcast TWICE under different
    * aliases, supplier is broadcast (a thin key→nation map even at 100 TB
    * — 10M suppliers ≈ 160 MB; if it outgrows the broadcast threshold AQE
    * falls back to a key shuffle), so the only big shuffles are
    * lineitem⋈orders and ⋈customer on their join keys.
    */
  def nationTradeVolume(li: DataFrame, o: DataFrame, c: DataFrame,
      s: DataFrame, n: DataFrame): DataFrame = {
    val n1 = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = n.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s.join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape — market share of one supplier nation within one
    * customer region, by order year: conditional aggregation over the
    * 6-way join (numerator = CASE WHEN inside the same single shuffle as
    * the denominator — never two passes).
    */
  def marketShare(li: DataFrame, o: DataFrame, c: DataFrame, s: DataFrame,
      n: DataFrame, r: DataFrame, partDf: DataFrame,
      suppNation: String = "NATION_1", custRegion: String = "ASIA",
      pType: String = "ECONOMY"): DataFrame = {
    val n1 = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val custRegionNations = n
      .join(broadcast(r.filter(col("r_name") === custRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    li
      .join(broadcast(partDf.filter(col("p_type") === pType)
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custRegionNations), col("c_nationkey") === col("c_nk"))
      .join(broadcast(s.join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (decSum(when(col("supp_nation") === suppNation,
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0)), 8) /
          decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8))
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape (adapted — this corpus has no partsupp, so profit =
    * discounted revenue without the supplycost term): revenue by supplier
    * nation × order year over parts matching a name token. part is
    * filtered BEFORE the join and broadcast.
    */
  def productTypeProfit(li: DataFrame, o: DataFrame, s: DataFrame,
      n: DataFrame, partDf: DataFrame, nameToken: String = "widget"): DataFrame =
    li
      .join(broadcast(partDf.filter(col("p_name").contains(nameToken))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year"))

  /** TPC-H Q10 shape — returned-item reporting: top 20 customers by
    * revenue lost to returns in a window. The selective filters (return
    * flag, half-year) are pushed to the scans; one agg shuffle on
    * custkey; TakeOrderedAndProject for the top-k.
    */
  def returnedItemLosses(li: DataFrame, o: DataFrame, c: DataFrame,
      n: DataFrame): DataFrame =
    li.filter(col("l_returnflag") === "R")
      .join(o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q13 shape — customer order-count distribution: LEFT join so
    * zero-order customers count, two aggregations (per-customer, then
    * per-count). Both shuffles are on high-cardinality keys; the second
    * input is already one row per customer.
    */
  def orderCountDistribution(c: DataFrame, o: DataFrame): DataFrame =
    c.join(o.filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15 shape — top supplier(s) by quarterly revenue, ties kept:
    * the per-supplier aggregate is tiny (one row per supplier), so the
    * global max is a broadcast scalar join against it — no single-
    * partition window over the big side.
    */
  def topSupplier(li: DataFrame, s: DataFrame): DataFrame = {
    val rev = li
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(top), col("total_revenue") === col("max_revenue"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q18 shape — large-volume orders: HAVING on a per-order
    * aggregate, then enrich with customer. The heavy groupBy(l_orderkey)
    * pre-aggregates lineitem map-side (combiner), and the survivors
    * (p99 of orders) are what joins orders/customer.
    */
  def largeVolumeOrders(li: DataFrame, o: DataFrame, c: DataFrame,
      minQty: Double = 250.0): DataFrame =
    li.groupBy(col("l_orderkey"))
      .agg(decSum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** TPC-H Q11 shape (adapted: this corpus has no partsupp, so "important
    * stock value" becomes important SHIPPED value, and the canonical
    * single-nation supplier filter widens to a region so the sandbox's
    * sparse supplier table stays non-empty at every SF): per-part revenue
    * over one region's suppliers, keeping parts above 2× the mean share.
    *
    * The threshold is Q11's scalar subquery — and the scale story is that
    * it derives from the SAME per-part aggregate: lineitem is scanned
    * once, the one-row (total, count) aggregate of the per-part table is
    * broadcast back as a cross join, and the filter runs on the already-
    * aggregated (part-cardinality) side. Comparisons stay in DECIMAL end
    * to end so both engines make identical keep/drop decisions at the
    * threshold boundary.
    */
  def importantPartValue(li: DataFrame, s: DataFrame, n: DataFrame,
      r: DataFrame, regionName: String = "ASIA"): DataFrame = {
    val regionSupps = s
      .join(broadcast(n.join(broadcast(r.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey")).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = li
      .join(broadcast(regionSupps), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 8))).as("value_dec"))
    val thresh = perPart.agg(sum(col("value_dec")).as("total_dec"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(thresh))
      .filter(col("value_dec") * col("n_parts") > col("total_dec") * lit(2))
      .select(col("l_partkey"), col("value_dec").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q12 shape (adapted: no l_shipmode/l_commitdate here — shipmode
    * → return flag, late-commit → order priority): high- vs low-priority
    * lineitem counts per flag for one ship year. One join + one
    * conditional aggregation in a single shuffle; the outputs are counts,
    * so the oracle compare is integer-exact by construction.
    */
  def shipPriorityDistribution(li: DataFrame, o: DataFrame,
      shipYear: Int = 1997): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.filter(col("l_shipdate") >= lit(s"$shipYear-01-01").cast("timestamp")
        && col("l_shipdate") < lit(s"${shipYear + 1}-01-01").cast("timestamp"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(high, lit(1))).as("high_line_count"),
        count(when(!high, lit(1))).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q20 shape (adapted: availqty → shipped quantity): suppliers who
    * moved more than `minQty` units of any name-matched part in a ship
    * year — a semi-join against an aggregated subquery. part is filtered
    * FIRST and broadcast (never joined raw), the (suppkey, partkey)
    * aggregate combines map-side, and the supplier probe is left_semi so
    * no row multiplication ever happens. The quantity threshold compares
    * in DECIMAL for engine-exact boundary behavior.
    */
  def heavyPartSuppliers(li: DataFrame, s: DataFrame, partDf: DataFrame,
      nameToken: String = "red", shipYear: Int = 1997,
      minQty: Double = 50.0): DataFrame = {
    val qty = li
      .filter(col("l_shipdate") >= lit(s"$shipYear-01-01").cast("timestamp")
        && col("l_shipdate") < lit(s"${shipYear + 1}-01-01").cast("timestamp"))
      .join(broadcast(partDf.filter(col("p_name").contains(nameToken))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"))
      // a Double literal would coerce sum_qty to double for the compare;
      // a DECIMAL literal keeps the comparison in decimal, matching the
      // oracle's DECIMAL 50.0 literal exactly at the boundary
      .filter(col("sum_qty") >
        lit(java.math.BigDecimal.valueOf(minQty)).cast(DecimalType(18, 2)))
      .select(col("l_suppkey"))
      .distinct()
    s.join(qty, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape (adapted: no commit/receipt dates — "kept the order
    * waiting" becomes "sole returned-flag supplier on a multi-supplier
    * finished order"). The canonical formulation is an EXISTS plus a
    * NOT EXISTS correlated self-join on lineitem; here both are
    * decorrelated into ONE per-order aggregate (distinct-supplier count,
    * flagged-supplier count, and the flagged supplier's key via
    * min-over-a-singleton), which is also the only plan that survives
    * 100 TB: lineitem is scanned once and the quadratic self-join never
    * materializes.
    */
  def waitingSuppliers(li: DataFrame, o: DataFrame, s: DataFrame,
      topK: Int = 100): DataFrame =
    // Two plain hash aggregates instead of two COUNT(DISTINCT ...) in one:
    // multiple distinct aggregates make Spark Expand the fact table ×3 and
    // run the distinct machinery over it (measured 3-6 s at sf0.1 vs <1 s
    // for this shape). Collapsing to (orderkey, suppkey [, has_r]) first is
    // a map-side-combinable pre-aggregation — the formulation that also
    // holds at 100 TB, where an Expand of lineitem is 3× the biggest table.
    li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("has_r")).as("n_flagged"),
        min(when(col("has_r") === 1, col("l_suppkey"))).as("suppkey"))
      .filter(col("n_supp") > 1 && col("n_flagged") === 1)
      .join(o.filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(s), col("suppkey") === col("s_suppkey"))
      // keyed by suppkey end to end (names need not be unique); suppkey in
      // the output makes the ordering a total order, so the LIMIT cut is
      // deterministic even under name collisions
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(topK)
}
