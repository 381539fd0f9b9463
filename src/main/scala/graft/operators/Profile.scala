package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the per-column audit (row/null/distinct counts,
  * min/max) a pipeline runs before trusting a new corpus drop, in the
  * spirit of the open-source data-quality checkers built on Spark.
  *
  * One aggregation pass computes every column's stats simultaneously; the
  * wide single-row result is then unpivoted (stack) to the long
  * (column, stats) form — so profiling N columns costs ONE scan, not N.
  *
  * Distinct counts: `exact = true` uses COUNT(DISTINCT col) per column,
  * which makes Spark Expand the input ×(N+1) — acceptable for a
  * profiling pass at test scale and for the DuckDB oracle, but at 100 TB
  * set `exact = false`: `approx_count_distinct` (HLL) profiles every
  * column in the same single non-expanded pass with map-side partials.
  *
  * min/max are cast to strings so heterogeneous column types share one
  * schema; callers profile numeric-only or string-only column sets when
  * they need typed extremes. Only deterministic string renderings
  * (integers, strings) should be oracle-compared — float formatting
  * differs across engines.
  */
object Profile {

  def profile(
      df: DataFrame,
      columns: Seq[String],
      exact: Boolean = false): DataFrame = {
    // names are spliced into selectExpr ('$c' literal + backtick
    // identifiers) — restrict to identifier characters so a quote or
    // backtick in a column name cannot produce malformed/injected SQL
    columns.foreach { c =>
      require(c.matches("[A-Za-z0-9_]+"),
        s"profile: column name must match [A-Za-z0-9_]+, got '$c'")
    }
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackExpr = columns.map { c =>
      s"'$c', `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr(
      "__rows",
      s"stack(${columns.size}, $stackExpr) AS " +
        "(column_name, n_nonnull, n_distinct, min_value, max_value)")
      .select(
        col("column_name"),
        col("__rows").as("n_rows"),
        col("n_nonnull"),
        (col("__rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"),
        col("min_value"), col("max_value"))
      .orderBy(col("column_name"))
  }
}
