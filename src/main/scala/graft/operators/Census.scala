package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ThetaSketch.{theta_estimate, theta_intersect, theta_sketch, theta_union, theta_union_agg}

/** Incremental distinct-census over unbounded key streams — the sketch
  * lifecycle that replaces "re-run COUNT(DISTINCT) over all history"
  * with "merge yesterday's summary with today's delta".
  *
  * Two sketch families, chosen by the question:
  *   - **HLL** (Spark's built-in DataSketches `hll_sketch_agg` /
  *     `hll_union_agg` — codegen'd, ≤(2^lgK + ε) bytes per group): pure
  *     cardinality. Union-only algebra, smallest state.
  *   - **Theta** ([[graft.functions.ThetaSketchAgg]], custom
  *     TypedImperativeAggregate): cardinality PLUS set algebra —
  *     intersections and unions of arbitrary key sets, the primitive
  *     behind "how much would cross-corpus dedup remove" and
  *     "how contaminated is this corpus against that benchmark"
  *     answered in one scan per side instead of a key-set shuffle join.
  *
  * 100 TB shape: every operator here is one scan into per-group partial
  * sketches that merge associatively map-side — reducer state is
  * sketch-sized (KiB), never key-set-sized. The persisted census table
  * (one row per (group, sketch)) is the index-like artifact: appending a
  * day costs one scan of THAT DAY, and any roll-up (per-group, global,
  * cross-group overlap) runs on the census table alone — the corpus is
  * never rescanned. Mirrors the reference's continuous-aggregate stance
  * (delegated there to TimescaleDB caggs, `hermod.go` §readme "data
  * retention"): the engine maintains small mergeable state, queries hit
  * the state.
  */
object Census {

  /** Per-group HLL distinct sketches of `keyCol` — the census table's
    * delta builder. `groupCols` typically (entity, day): the finest
    * grain you'll ever roll up from.
    */
  def distinctSketch(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))

  /** Fold a delta census into the base (sketch union per group) — the
    * incremental maintenance step. Groups present in only one side pass
    * through; sketches never rescan the rows that built them.
    */
  def mergeCensus(
      base: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String]): DataFrame =
    base.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  /** Census rows with their rounded cardinality estimates. */
  def withEstimates(census: DataFrame): DataFrame =
    census.withColumn(
      "distinct_est", round(hll_sketch_estimate(col("sketch"))).cast("long"))

  /** Roll a census up to coarser groups (or, with `groupCols` empty, to
    * one global row) WITHOUT rescanning the corpus — register-max union
    * of the stored sketches. The estimate at any roll-up level is
    * identical to what a direct sketch of that level would report
    * (registers merge losslessly), spec-asserted.
    */
  def rollup(census: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) census.groupBy()
      else census.groupBy(groupCols.map(col): _*)
    grouped.agg(
      round(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))))
        .cast("long").as("distinct_est"))
  }

  /** Theta-sketch set algebra over two key sets: |A|, |B|, |A∩B|,
    * |A∪B| and Jaccard (ppm, floor-div — the repo-standard integer
    * lattice). One scan per side into a ≤2^lgK-entry sketch, then
    * sketch-on-sketch algebra on a single crossed row — no join of the
    * key sets ever happens. Exact (hash-matchable against a DISTINCT
    * join oracle) while both sides stay under 2^lgK distinct keys;
    * beyond that, correct within theta bounds.
    */
  def overlap(
      dfA: DataFrame,
      dfB: DataFrame,
      keyCol: String,
      lgK: Int = 12): DataFrame = {
    val skA = dfA.agg(theta_sketch(col(keyCol), lgK).as("sk_a"))
    val skB = dfB.agg(theta_sketch(col(keyCol), lgK).as("sk_b"))
    skA.crossJoin(skB)
      .select(overlapStats(col("sk_a"), col("sk_b"), lgK): _*)
      .withColumn("jaccard_ppm",
        expr("(card_intersection * 1000000L) div card_union"))
  }

  /** |A|, |B|, |A∩B|, |A∪B| from two sketch COLUMNS — the shared
    * projection of [[overlap]] (fresh sketches) and [[overlapFromCensus]]
    * (persisted sketches). The union expression is sized to the inputs'
    * lgK so exact mode survives the set algebra.
    */
  private def overlapStats(skA: org.apache.spark.sql.Column,
      skB: org.apache.spark.sql.Column, lgK: Int) = Seq(
    theta_estimate(skA).as("card_a"),
    theta_estimate(skB).as("card_b"),
    theta_estimate(theta_intersect(skA, skB)).as("card_intersection"),
    theta_estimate(theta_union(skA, skB, lgK)).as("card_union"))

  /** Per-group THETA sketches of `keyCol` — the delta builder of the
    * PERSISTED theta census ([[graft.sinks.Sink.mergeThetaCensusTable]]):
    * the HLL census answers "how many distinct", this one also answers
    * "how many SHARED" ([[overlapFromCensus]]) without rescanning. Same
    * shape as [[distinctSketch]]: one scan into KiB-per-group partials.
    */
  def thetaSketchTable(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.ThetaSketch
        .theta_sketch(col(keyCol), lgK).as("sketch"))

  /** Fold a theta delta census into the base — sketch union per group,
    * sized to lgK so exact mode survives (the incremental maintenance
    * step; union is idempotent register...retained-set max, so a replayed
    * delta merges to a set-identical sketch).
    */
  def mergeThetaCensus(
      base: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String],
      lgK: Int = 12): DataFrame =
    base.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(theta_union_agg(col("sketch"), lgK).as("sketch"))

  /** [[overlap]] computed from a PERSISTED theta census instead of the
    * corpus: roll each side's census rows up to one sketch
    * (`theta_union_agg`), then the same single-row set algebra. The
    * corpus is NEVER rescanned — overlap between any two groups of an
    * incrementally-maintained census costs census-table rows only.
    * Exactness contract unchanged: exact while every contributing
    * sketch stayed under 2^lgK retained keys.
    */
  def overlapFromCensus(
      censusA: DataFrame,
      censusB: DataFrame,
      lgK: Int = 12): DataFrame = {
    val skA = censusA.agg(theta_union_agg(col("sketch"), lgK).as("sk_a"))
    val skB = censusB.agg(theta_union_agg(col("sketch"), lgK).as("sk_b"))
    skA.crossJoin(skB)
      .select(overlapStats(col("sk_a"), col("sk_b"), lgK): _*)
      .withColumn("jaccard_ppm",
        expr("(card_intersection * 1000000L) div card_union"))
  }

  // ---------------------------------------- quantile census (KLL)

  import graft.functions.KllSketch.{kll_ks, kll_merge_agg, kll_n, kll_quantile, kll_sketch}
  import graft.functions.FreqItemsSketch.{freq_items, freq_items_len, freq_items_max_error, freq_items_merge_agg, freq_items_sketch}

  /** Per-group KLL quantile sketches of `valueCol` (LongType lattice) —
    * the delta builder of the PERSISTED quantile census
    * ([[graft.sinks.Sink.mergeKllCensusTable]]): the HLL census answers
    * "how many distinct", this one answers "how are values DISTRIBUTED"
    * (any percentile, rank, or drift test) without rescanning history.
    * Same shape as [[distinctSketch]]: one scan into ~3 KiB-per-group
    * partials that merge associatively map-side.
    */
  def quantileSketchTable(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Int = 200): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(kll_sketch(col(valueCol).cast("long"), k).as("sketch"))

  /** Fold a KLL delta census into the base — sketch merge per group.
    * COUNTING algebra: NOT idempotent (a replayed delta double-counts),
    * so the persisted lifecycle's batchId guard is load-bearing alone —
    * see [[graft.functions.KllSketchAgg]]'s contract note.
    */
  def mergeQuantileCensus(
      base: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String],
      k: Int = 200): DataFrame =
    base.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(kll_merge_agg(col("sketch"), k).as("sketch"))

  /** Roll a quantile census up to coarser `groupCols` and report, per
    * group and per requested rank (ppm lattice): exact stream length
    * `n` (deterministic through any merge tree) and the quantile
    * ESTIMATE at that rank. The corpus is never rescanned — this is
    * sketch-rows-in, percentile-report-out.
    */
  def quantilesFromCensus(
      census: DataFrame,
      groupCols: Seq[String],
      ranksPpm: Seq[Long],
      k: Int = 200): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) census.groupBy()
      else census.groupBy(groupCols.map(col): _*)
    grouped.agg(kll_merge_agg(col("sketch"), k).as("sketch"))
      .withColumn("rank_ppm", explode(typedLit(ranksPpm)))
      .select(groupCols.map(col) ++ Seq(
        col("rank_ppm"),
        kll_n(col("sketch")).as("n"),
        kll_quantile(col("sketch"), col("rank_ppm")).as("quantile_est")): _*)
  }

  /** Two-sample distribution-drift report from two quantile censuses
    * (each rolled to one sketch): exact per-side counts and the
    * Kolmogorov–Smirnov statistic (ppm) between the estimated CDFs —
    * the "did this week's latency/price/length distribution move"
    * monitor answered from census rows alone. KS error ≤ the two
    * sketches' rank-error sum + 2/256 grid slack
    * ([[graft.functions.KllKsExpr]]); size `driftThresholdPpm` above
    * that budget.
    */
  def distributionDrift(
      censusA: DataFrame,
      censusB: DataFrame,
      k: Int = 200): DataFrame = {
    val skA = censusA.agg(kll_merge_agg(col("sketch"), k).as("sk_a"))
    val skB = censusB.agg(kll_merge_agg(col("sketch"), k).as("sk_b"))
    skA.crossJoin(skB).select(
      kll_n(col("sk_a")).as("n_a"),
      kll_n(col("sk_b")).as("n_b"),
      kll_ks(col("sk_a"), col("sk_b")).as("ks_ppm"))
  }

  /** EXACT two-sample KS on the integer lattice — the ground-truth twin
    * of [[distributionDrift]] (specs and the oracle-checked query
    * compare the sketch statistic against this within the error
    * budget). One value-keyed shuffle with map-side partial counts,
    * then a cumulative window over the DISTINCT-VALUE lattice — the
    * single-partition window runs on lattice rows (bounded by distinct
    * values, like the EWMA bucket table), never corpus rows. All
    * arithmetic on the ppm floor-div lattice, so the result is
    * hash-matchable by a SQL replay.
    */
  def exactKs(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String): DataFrame = {
    val u = dfA.select(col(valueCol).cast("long").as("v"),
        lit(1L).as("ia"), lit(0L).as("ib"))
      .unionByName(dfB.select(col(valueCol).cast("long").as("v"),
        lit(0L).as("ia"), lit(1L).as("ib")))
    val g = u.groupBy("v").agg(sum("ia").as("ka"), sum("ib").as("kb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    g.select(sum("ka").over(w).as("ca"), sum("kb").over(w).as("cb"))
      .crossJoin(broadcast(
        g.agg(sum("ka").as("n_a"), sum("kb").as("n_b"))))
      .agg(max(abs(expr("ca * 1000000 div n_a - cb * 1000000 div n_b")))
        .as("ks_exact_ppm"))
  }

  // ------------------------------------ heavy-hitter census (freq)

  /** Per-group frequent-items sketches of `itemCol` — the delta builder
    * of the PERSISTED heavy-hitter census
    * ([[graft.sinks.Sink.mergeFreqCensusTable]]): "which terms/domains/
    * users dominate, over all history" in ≤ maxMapSize counters per
    * group, no vocabulary-sized state anywhere. Exact while distinct
    * items stay under the purge point; no-false-negative bounded error
    * beyond ([[graft.functions.FreqItemsAgg]]).
    */
  def freqSketchTable(
      df: DataFrame,
      itemCol: String,
      groupCols: Seq[String],
      maxMapSize: Int = 1024): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(freq_items_sketch(col(itemCol), maxMapSize).as("sketch"))

  /** Fold a freq delta census into the base — counter-merge per group.
    * Counting algebra, like the KLL census: the batchId guard alone
    * carries exactly-once.
    */
  def mergeFreqCensus(
      base: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String],
      maxMapSize: Int = 1024): DataFrame =
    base.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(freq_items_merge_agg(col("sketch"), maxMapSize).as("sketch"))

  /** Roll a freq census up to coarser `groupCols` and report every item
    * whose ESTIMATE reaches `threshold`, with its (lb, ub) bracket, the
    * exact total stream length, and the sketch's max error (0 ⇔ exact
    * mode ⇒ `freq` IS the true count). Census-rows-in, report-out.
    */
  def heavyHittersFromCensus(
      census: DataFrame,
      groupCols: Seq[String],
      threshold: Long,
      maxMapSize: Int = 1024): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) census.groupBy()
      else census.groupBy(groupCols.map(col): _*)
    grouped.agg(freq_items_merge_agg(col("sketch"), maxMapSize).as("sketch"))
      .select(groupCols.map(col) ++ Seq(
        freq_items_len(col("sketch")).as("stream_len"),
        freq_items_max_error(col("sketch")).as("max_error"),
        explode(freq_items(col("sketch"))).as("hh")): _*)
      .filter(col("hh.est") >= threshold)
      .select(groupCols.map(col) ++ Seq(
        col("hh.item").as("item"), col("hh.est").as("freq"),
        col("hh.lb").as("freq_lb"), col("hh.ub").as("freq_ub"),
        col("stream_len"), col("max_error")): _*)
  }
}
