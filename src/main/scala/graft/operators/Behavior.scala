package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over the event stream — the product-analytics
  * queries (funnel conversion, cohort retention, robust anomaly flags) a
  * TimescaleDB deployment of the reference would run downstream of the
  * landed `iot_data`/`iot_raw` tables (SURVEY.md §2C scope: documented
  * analytical surface over engine output; the reference itself has no
  * engine-side aggregation, §2D).
  *
  * All three operators are integer-exact end to end (epoch microseconds,
  * cents lattices, integer division), so the DuckDB oracle hash-matches
  * regardless of partitioning.
  */
object Behavior {

  /** Ordered multi-stage funnel: how many users performed stage 1, then
    * stage 2 STRICTLY AFTER their first stage-1 event, then stage 3
    * strictly after that first qualifying stage-2 event, and so on
    * ("first-touch" funnel semantics — each stage anchors at the EARLIEST
    * qualifying event, which is deterministic and order-free, unlike
    * "any-touch" variants that need per-user event scans).
    *
    * Output: one row per stage — `(stage_idx, stage, users, conv_milli)`
    * where `conv_milli` = users·1000 div stage-1 users (integer
    * permillage; 1000 for stage 1 itself; 0-user funnels report 0).
    *
    * 100 TB shape: per stage one filtered scan of events (filter is
    * pushed to the parquet scan — only that stage's rows survive) + one
    * user-keyed partial aggregate, then a user-keyed join against the
    * previous stage's (user, ts) table — which only ever SHRINKS down the
    * funnel. No windows over raw events, no per-user event sorting; every
    * shuffle carries (user_id, long) pairs. The per-stage frontier tables
    * are user-cardinality-sized, so at 1000 executors they co-partition
    * with the event scan's user hashing and the joins never touch a
    * corpus-sized side twice.
    *
    * Each frontier is MATERIALIZED via `materialize` before the census
    * counts read it: with lazy unioned 1-row aggregates, the stage-k
    * count branch would re-run stages 1..k-1 (no cross-branch CSE in
    * Spark), turning the k-stage report into O(k²) event scans.
    * Materialized, each stage's filtered event scan and join run exactly
    * once — stage k's branch aggregates a user-sized in-memory table
    * (BehaviorSpec asserts the one-scan-per-stage receipt on the census
    * plan). The default is the single-JVM `localCheckpoint(true)`; on a
    * cluster pass `_.checkpoint()` (fault-tolerant storage — a
    * localCheckpoint block dies with its executor) — the policy is a
    * parameter, not an edit. Note the default makes CONSTRUCTING the
    * report eager (each stage runs at call time).
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val tsUs = unix_micros(col("ts"))
    // stage 1: first event of the stage type per user
    var frontier = materialize(events
      .filter(col("event_type") === stages.head)
      .groupBy(col("user_id"))
      .agg(min(tsUs).as("t")))
    var frontiers = Vector(frontier)
    for (stage <- stages.tail) {
      // first stage-k event strictly after the user's stage-(k-1) anchor
      frontier = materialize(events
        .filter(col("event_type") === stage)
        .select(col("user_id"), tsUs.as("ts_us"))
        .join(frontier, "user_id")
        .filter(col("ts_us") > col("t"))
        .groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("t")))
      frontiers = frontiers :+ frontier
    }
    // one 1-row aggregate per MATERIALIZED stage frontier, unioned into
    // the (#stages)-row report — each branch reads its checkpointed
    // frontier, never the upstream pipeline (see docstring)
    val perStage = frontiers.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage_idx"), lit(stages(i)).as("stage"),
          col("users"))
    }.reduce(_.unionAll(_))
    val base = Window.orderBy(col("stage_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perStage
      .withColumn("base", first(col("users")).over(base))
      .withColumn("conv_milli",
        when(col("base") === 0L, 0L)
          .otherwise(expr("users * 1000 div base")))
      .drop("base")
      .orderBy(col("stage_idx"))
  }

  /** Cohort retention matrix: users are grouped by the DAY of their first
    * event (the cohort); for every later day a user was active, the
    * (cohort, day-offset) cell counts them once. The classic retention
    * triangle, on an integer day lattice.
    *
    * Output: `(cohort_us, offset_days, active_users)` — cohort day as
    * epoch micros, offset in whole days (0 = the cohort day itself).
    *
    * 100 TB shape: one scan into a distinct (user, day) set (user-keyed
    * shuffle of 16-byte pairs), a user-keyed min for the cohort day
    * (reuses the same hashing), a user join of two user-cardinality
    * tables, and a final (cohort, offset) partial aggregate whose output
    * is at most days² rows. Event payloads never shuffle.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val dayUs = unix_micros(date_trunc("day", col("ts")))
    val userDays = events
      .select(col("user_id"), dayUs.as("day_us"))
      .distinct()
    val cohorts = userDays
      .groupBy(col("user_id"))
      .agg(min(col("day_us")).as("cohort_us"))
    userDays
      .join(cohorts, "user_id")
      .select(
        col("cohort_us"),
        // integer `div`, not `/`: the Column `/` promotes to DOUBLE, and
        // a float quotient truncates where the oracle's `//` floors —
        // exact here only by the day-multiple invariant; div needs no
        // invariant
        expr("(day_us - cohort_us) div 86400000000").as("offset_days"))
      .groupBy(col("cohort_us"), col("offset_days"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy(col("cohort_us"), col("offset_days"))
  }

  /** Linear multi-touch attribution: every conversion event credits the
    * touch events (of the given types) by the SAME user inside the
    * `windowHours` lookback window, splitting one unit of credit equally
    * across the touches — on the integer ppm lattice (each touch earns
    * `1000000 div n_touches`), so totals are exact and engine-portable.
    * First/last-touch are the n=1 degenerate forms; position-weighted
    * variants change only the credit expression.
    *
    * Output: one row per channel — `(channel, touches,
    * conversions_touched, credit_ppm)`; total credit over all channels is
    * ≤ 1000000 × conversions (floor truncation leaks < n_touches ppm per
    * conversion, the documented integer-lattice trade).
    *
    * 100 TB shape: conversions and touches are two pushed-down filtered
    * scans; the attribution join is user-keyed (both sides hash the same
    * key, so the shuffle co-partitions) with per-user fan-out bounded by
    * conversions×touches inside the window — the window predicate is
    * applied inside the join, so only qualifying pairs survive the
    * operator. The per-conversion touch count then rides a
    * conversion-keyed partial aggregate + join of two attribution-sized
    * tables, and the final channel rollup is a map-side-combined
    * aggregate to a channel-cardinality output. Event payloads never
    * shuffle — every row in flight is (id, long) shaped.
    *
    * DENSE-USER switch (`bucketed = true`): the user-keyed join's
    * per-user fan-out is LIFETIME conversions × LIFETIME touches, which
    * a year-long power user (or a bot) turns quadratic. The bucketed
    * variant keys the join on (user, ⌊ts/window⌋) — the
    * [[graft.streaming.StreamJoin.followWithinBatch]] interval-join
    * shape: each conversion probes exactly its own and the previous
    * time bucket (the (conv_us − win, conv_us] lookback spans at most
    * those two), so fan-out is conversions × touches WITHIN ±1 window,
    * bounded by window-local density however long the user's history
    * grows. Identical pairs → identical credit arithmetic → identical
    * output (a pair lands in exactly one probed bucket, so no dedup is
    * ever needed); cost: a ×2 explode of the id-shaped conversion rows.
    */
  def linearAttribution(
      events: DataFrame,
      touchTypes: Seq[String] = Seq("view", "click"),
      convType: String = "purchase",
      windowHours: Int = 24,
      bucketed: Boolean = false): DataFrame = {
    require(touchTypes.nonEmpty && windowHours > 0)
    require(!touchTypes.contains(convType),
      "convType must not be a touch type: a self-crediting conversion " +
        "has no single sane semantics and the streaming twin diverges")
    val winUs = windowHours.toLong * 3600000000L
    val conv = events
      .filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        unix_micros(col("ts")).as("conv_us"))
    val touch = events
      .filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_type").as("channel"),
        unix_micros(col("ts")).as("touch_us"))
    val windowPred = col("touch_us") <= col("conv_us") &&
      col("touch_us") > col("conv_us") - winUs
    val attributed =
      if (!bucketed)
        conv.join(touch, "user_id")
          .filter(windowPred)
          .select(col("conv_id"), col("channel"))
      else {
        // floor division via pmod: exact for pre-1970 (negative-µs)
        // timestamps too, where `div` truncates toward zero
        def bucketOf(c: String) =
          expr(s"($c - pmod($c, $winUs)) div $winUs")
        val tB = touch.withColumn("bucket", bucketOf("touch_us"))
        val cB = conv.withColumn("cb", bucketOf("conv_us"))
          .select(col("user_id"), col("conv_id"), col("conv_us"),
            explode(array(col("cb"), col("cb") - 1)).as("bucket"))
        cB.join(tB, Seq("user_id", "bucket"))
          .filter(windowPred)
          .select(col("conv_id"), col("channel"))
      }
    val perConv = attributed
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_touches"))
    attributed.join(perConv, "conv_id")
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("touches"),
        countDistinct(col("conv_id")).as("conversions_touched"),
        sum(expr("1000000 div n_touches")).as("credit_ppm"))
      .orderBy(col("channel"))
  }

  /** Exponentially-weighted trend per event type on an hourly lattice,
    * with DYADIC weights: bucket the stream into (event_type, hour) cent
    * sums, then for each bucket compute
    *
    *   ewma_num(t) = Σ_{lag=0..L-1} cents(t−lag) · 2^(L−1−lag)
    *
    * — weight halves per hour of age, missing hours contribute zero.
    * Everything is long arithmetic (cents lattice × powers of two), so
    * the trend is bit-reproducible across engines and partitionings; the
    * normalized `ewma_cents = ewma_num div (2^L − 1)` is the comparable
    * smoothed value. A float `exp(−λΔt)` EWMA cannot hash-match across
    * engines; the dyadic lattice is the deterministic twin with the same
    * decay shape.
    *
    * 100 TB shape: one pushed-down scan into an (event_type, hour)
    * partial aggregate (bucket table is time×type sized, corpus-size
    * independent), then the L-lag decomposition is an `explode(sequence)`
    * over the BUCKET table — a bounded ×L fan-out of tiny rows, NOT a
    * window sort — re-aggregated by target hour with map-side combine.
    * A per-row window over raw events would sort the corpus; this never
    * touches raw rows after the first aggregate.
    */
  def ewmaTrend(events: DataFrame, lags: Int = 12): DataFrame = {
    // overflow precondition (NOT fully enforced by the cap): per-bucket
    // |cents| must stay below 2^(63−lags) — at the default L=12 that is
    // ~4.6·10^15 cents per (type, hour). Under ANSI mode (this engine's
    // default) a violation THROWS loudly rather than wrapping; for
    // corpora beyond the bound, lower `lags` or move the weighted sum to
    // DECIMAL(38) in the same plan shape
    require(lags >= 1 && lags <= 42, "lags out of range (1..42)")
    val buckets = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(sum(col("value").cast("decimal(18,2)").multiply(lit(100))
        .cast("long")).as("cents"))
      .localCheckpoint(true) // read by the lag fan-out AND the output join
    val den = (1L << lags) - 1
    val num = buckets
      .select(col("event_type"), col("h"), col("cents"),
        explode(sequence(lit(0), lit(lags - 1))).as("lag"))
      .select(col("event_type"), (col("h") + col("lag")).as("h"),
        expr(s"cents * shiftleft(1L, ${lags - 1} - lag)").as("w"))
      .groupBy(col("event_type"), col("h"))
      .agg(sum(col("w")).as("ewma_num"))
    // emit only REAL buckets: the fan-out also lands on horizon hours
    // past each bucket (and gap hours), which are forecasts, not trend
    // rows — the inner join keeps the output bucket-table-shaped
    buckets.join(num, Seq("event_type", "h"))
      .select(col("event_type"), col("h"), col("cents").as("bucket_cents"),
        col("ewma_num"), expr(s"ewma_num div $den").as("ewma_cents"))
      .orderBy(col("event_type"), col("h"))
  }

  /** Lower median on an integer lattice, computed the scalable way: a
    * per-(key, value) histogram, a cumulative window over the DISTINCT
    * value lattice (value-cardinality-sized — corpus-size-independent,
    * unlike a per-row row_number sort), and the smallest value whose
    * cumulative count reaches ceil(n/2). Integer and engine-portable:
    * DuckDB replays the same histogram walk.
    */
  private def lowerMedian(
      df: DataFrame, key: String, value: String): DataFrame = {
    val cum = Window.partitionBy(col(key)).orderBy(col(value))
    val tot = Window.partitionBy(col(key))
    df.groupBy(col(key), col(value))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(tot))
      // cum ≥ ceil(n/2)  ⟺  2·cum ≥ n (integers): rank-⌈n/2⌉ element,
      // the lower of the two middles on even counts
      .filter(col("cum") * 2 >= col("n"))
      .groupBy(col(key))
      .agg(min(col(value)).as("med"))
  }

  /** Robust per-type anomaly audit: median + MAD (median absolute
    * deviation) of `value` per event_type on an exact cents lattice, and
    * the count of events deviating more than `k`·MAD from the median —
    * the standard outlier rule that a handful of broken sensors cannot
    * drag (unlike mean/stddev). Medians are LOWER medians (the element at
    * rank ceil(n/2)), which keeps everything integer and cross-engine
    * exact — no interpolation, no float boundary.
    *
    * Output: `(event_type, n, med_cents, mad_cents, n_outliers,
    * max_abs_dev)`.
    *
    * 100 TB shape: both median passes run on (type, value)-histogram
    * tables — the cumulative windows sort the value LATTICE (bounded by
    * the value domain), never the corpus. The median/MAD tables are
    * type-cardinality-sized and broadcast back; the flag pass is one
    * map-side-combined aggregate. Three corpus scans total (histogram,
    * deviation histogram, flags), each narrow before its partial agg. At
    * web scale swap the exact lattice for `approx_percentile` in the same
    * plan shape when the value domain is unbounded floats.
    */
  def madOutliers(events: DataFrame, k: Int = 3): DataFrame = {
    val cents = col("value").cast("decimal(18,2)")
      .multiply(lit(100)).cast("long")
    val base = events.select(col("event_type"), cents.as("cents"))
    val med = lowerMedian(base, "event_type", "cents")
      .withColumnRenamed("med", "med_cents")
    val dev = base
      .join(broadcast(med), "event_type")
      .select(col("event_type"),
        abs(col("cents") - col("med_cents")).as("d"))
    val mad = lowerMedian(dev, "event_type", "d")
      .withColumnRenamed("med", "mad_cents")
    dev
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("d") > col("mad_cents") * k, 1L).otherwise(0L))
          .as("n_outliers"),
        max(col("d")).as("max_abs_dev"))
      .join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .select(col("event_type"), col("n"), col("med_cents"),
        col("mad_cents"), col("n_outliers"), col("max_abs_dev"))
      .orderBy(col("event_type"))
  }
}
