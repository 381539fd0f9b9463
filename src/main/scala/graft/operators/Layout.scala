package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional layout — the data-skipping
  * physical design for scans filtered on MORE THAN ONE column.
  *
  * A table partitioned/sorted on one key skips beautifully on that key
  * and not at all on any other: sorting lexicographically on (a, b)
  * leaves b's span ≈ the full range inside every file. Interleaving the
  * bits of range-normalized coordinates (Morton 1966; the same design as
  * Delta/Iceberg's OPTIMIZE ZORDER) makes file locality n-dimensional:
  * every z-contiguous tile is an axis-aligned box in coordinate space,
  * so parquet per-file/row-group min-max stats prune scans filtered on
  * ANY subset of the z columns.
  *
  * Everything here is narrow codegen'd column arithmetic on the integer
  * lattice — no UDF, and no shuffle beyond the one range-partition the
  * write itself pays (the bucketing trade: pay the layout shuffle once
  * at write, amortize it over every downstream scan).
  *
  * Two normalizers, chosen by the column's shape:
  *   - **min-max** ([[withZValue]]): linear scaling to `bits`-bit
  *     coordinates — deterministic and SQL-replayable (the registered
  *     census hash-matches a DuckDB replay of the identical integer
  *     arithmetic). Right for roughly-uniform columns; on heavy-tailed
  *     columns a single outlier crushes most rows into a few buckets
  *     and the skipping evaporates.
  *   - **quantile** ([[withZValueQuantile]]): equi-DEPTH buckets from
  *     `approx_percentile` cut points (2^bits − 1 cuts, one agg pass,
  *     cuts become broadcast literals) — every bucket holds ~the same
  *     row count REGARDLESS of the value distribution, so a point/range
  *     probe prunes ~(1 − probed buckets / 2^bits) of the data even on
  *     prices/counts/durations. The interleave and everything downstream
  *     are identical; the registered `layout_zorder_skewed` query proves
  *     the quantile layout beats min-max on scan fraction on a cubed
  *     heavy-tail column, oracle-checked.
  */
object Layout {

  /** Morton-interleave `bits`-bit bucket coordinates: bit b of
    * coordinate i lands at position b·n + i. n·bits ≤ 63.
    */
  def interleaveBits(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 2, "z-order needs at least 2 columns")
    require(n * bits <= 63, s"$n cols x $bits bits exceeds a long")
    val terms = for {
      i <- 0 until n
      b <- 0 until bits
    } yield shiftleft(shiftright(buckets(i), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `df` plus a `zval` column: each of `cols` (integral; put fractional
    * values on a cents/ppm lattice upstream) min-max-normalized to
    * [0, 2^bits) by floor division and Morton-interleaved. The min/max
    * pass is one columnar agg broadcast back as a 1-row cross join.
    * The `(value − min) · (2^bits − 1)` product is computed on
    * DECIMAL(38,0) so column spans up to ~10^35 normalize correctly
    * (raw nanosecond timestamps or hash-valued columns overflow a
    * BIGINT product at spans above ~2^63/255 ≈ 3.6·10^16); `div`
    * brings the bucket back to a long.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    val aggExprs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__min_$c"),
      max(col(c)).cast("long").as(s"__max_$c")))
    val ranges = df.agg(aggExprs.head, aggExprs.tail: _*)
    val hi = (1L << bits) - 1
    val buckets = cols.map { c =>
      val span = col(s"__max_$c") - col(s"__min_$c")
      // span 0 (constant column) → bucket 0 everywhere
      when(span === 0L, lit(0L)).otherwise(expr(
        s"((CAST(`$c` AS DECIMAL(38,0)) - `__min_$c`) * $hi) div " +
          s"(CAST(`__max_$c` AS DECIMAL(38,0)) - `__min_$c`)"))
    }
    // fanned AFTER the stats pass (r17, [[Fanout]]): the ranges agg sees
    // the original scan (min/max are order-independent), while the
    // per-row normalize + interleave — the operator's CPU — lands in the
    // post-exchange stage when the source is single-split
    Fanout.bySessionCores(df, cols.map(col): _*)
      .crossJoin(broadcast(ranges))
      .withColumn("zval", interleaveBits(buckets, bits))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Equi-depth cut points per column: `approx_percentile` at
    * i/2^bits for i in 1..2^bits−1, ONE agg pass over all columns
    * (KSS quantile summaries merge map-side; the result is
    * (2^bits − 1) · |cols| longs to the driver — layout metadata, like
    * IVF centroids). Deterministic for a fixed file layout (summary
    * merges follow the deterministic scan order).
    */
  def quantileCuts(
      df: DataFrame, cols: Seq[String], bits: Int = 8)
      : Map[String, Array[Long]] = {
    val nCuts = (1 << bits) - 1
    val ps = (1 to nCuts).map(i => i.toDouble / (1 << bits))
    val aggExprs = cols.map(c =>
      percentile_approx(col(c).cast("long"),
        typedLit(ps), lit(10000)).as(s"__cuts_$c"))
    val row = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      c -> row.getSeq[Long](i).toArray
    }.toMap
  }

  /** Bucket = number of cuts ≤ value — rank within the equi-depth
    * histogram, in [0, 2^bits). A codegen'd fold over the cut-point
    * array LITERAL (no join, no shuffle): ~2^bits compares per row per
    * column, the price of distribution-proof skipping. Duplicate cuts
    * (heavy ties) skip bucket ids — monotonicity, the property pruning
    * needs, is unaffected.
    */
  private def bucketByCuts(c: Column, cuts: Array[Long]): Column =
    aggregate(
      typedLit(cuts.toSeq),
      lit(0L),
      (acc, cut) => acc + when(c.cast("long") >= cut, 1L).otherwise(0L))

  /** [[withZValue]] with QUANTILE (equi-depth) normalization — the
    * heavy-tail-proof variant: bucket boundaries are approx-percentile
    * cuts instead of a linear min-max split, so an outlier shifts one
    * cut, not every bucket. Same interleave, same downstream contract.
    * Pass precomputed `cuts` to pin the layout (e.g. bucket new data
    * with the cuts the existing files were written with); by default
    * they are computed from `df` in one agg pass.
    */
  def withZValueQuantile(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      cuts: Map[String, Array[Long]] = Map.empty): DataFrame = {
    val cutMap = if (cuts.nonEmpty) cuts else quantileCuts(df, cols, bits)
    require(cols.forall(cutMap.contains), "missing cuts for a z column")
    val buckets = cols.map(c => bucketByCuts(col(c), cutMap(c)))
    // fanned AFTER the cuts pass (r17, [[Fanout]]) — quantileCuts MUST
    // see the original scan order (approx_percentile summary merges are
    // layout-deterministic, the oracle contract); the ~2^bits-compare
    // bucket fold per row/column is what fans out
    Fanout.bySessionCores(df, cols.map(col): _*)
      .withColumn("zval", interleaveBits(buckets, bits))
  }

  /** Per-tile min-max census of the z-ordered layout PLUS its skipping
    * verdict, computed entirely in-plan (no files written): tiles are
    * the top `tileBits` bits of zval — exactly the z-curve prefix ranges
    * a range-partitioned write cuts into files. Per tile: row count,
    * each column's min-max box edges, and whether a scan filtered to
    * `probes` (per-column equality points) could skip the tile on
    * min-max stats alone — the pruning decision a parquet reader makes
    * from footer stats, made oracle-checkable.
    */
  def zorderSkippingCensus(
      df: DataFrame,
      cols: Seq[String],
      probes: Map[String, Long],
      bits: Int = 8,
      tileBits: Int = 6): DataFrame =
    skippingCensus(withZValue(df, cols, bits), cols, probes, bits, tileBits)

  /** [[zorderSkippingCensus]] over the QUANTILE-normalized layout — same
    * tiles, same boxes, same pruning verdict; only the bucket assignment
    * (equi-depth cuts instead of min-max) differs.
    */
  def zorderSkippingCensusQuantile(
      df: DataFrame,
      cols: Seq[String],
      probes: Map[String, Long],
      bits: Int = 8,
      tileBits: Int = 6): DataFrame =
    skippingCensus(
      withZValueQuantile(df, cols, bits), cols, probes, bits, tileBits)

  private def skippingCensus(
      z0: DataFrame,
      cols: Seq[String],
      probes: Map[String, Long],
      bits: Int,
      tileBits: Int): DataFrame = {
    require(probes.nonEmpty, "need at least one probe column")
    require(probes.keySet.subsetOf(cols.toSet), "probe on a non-z column")
    val z = z0
      .withColumn("tile", shiftright(col("zval"), cols.size * bits - tileBits))
    val tiles = z.groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          min(col(c)).cast("long").as(s"min_$c"),
          max(col(c)).cast("long").as(s"max_$c"))): _*)
    val skippable = probes.toSeq.sortBy(_._1).map { case (c, v) =>
      (lit(v) < col(s"min_$c")) || (lit(v) > col(s"max_$c"))
    }.reduce(_ || _)
    tiles
      .withColumn("skippable", skippable)
      .orderBy(col("tile"))
  }

  /** Fraction of ROWS a point scan must still read (ppm, floor-div) —
    * the census's one-number verdict: Σ n_rows over non-skippable tiles
    * relative to the corpus. THE metric the normalizer choice moves on
    * skewed columns.
    */
  def scanFractionPpm(census: DataFrame): DataFrame =
    census.agg(expr(
      "sum(CASE WHEN skippable THEN 0L ELSE n_rows END) * 1000000 " +
        "div sum(n_rows)").as("scan_ppm"))

  /** Mean per-tile coordinate-span fraction of each column (ppm,
    * integer lattice: (Σ tile spans)·10⁶ div (tiles · global span)) —
    * the locality scalar. Lexicographic layouts score ~10⁶ on every
    * column after the first; z-order scores low on ALL columns.
    */
  def tileSpanPpm(census: DataFrame, cols: Seq[String]): DataFrame = {
    val aggExprs = count(lit(1)).as("n_tiles") +: cols.flatMap(c => Seq(
      sum(col(s"max_$c") - col(s"min_$c")).as(s"__sumspan_$c"),
      (max(col(s"max_$c")) - min(col(s"min_$c"))).as(s"__gspan_$c")))
    census.agg(aggExprs.head, aggExprs.tail: _*)
      .select(cols.map(c => expr(
        s"(`__sumspan_$c` * 1000000) div (n_tiles * greatest(`__gspan_$c`, 1))")
        .as(s"span_ppm_$c")): _*)
  }
}
