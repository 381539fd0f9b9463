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
}
