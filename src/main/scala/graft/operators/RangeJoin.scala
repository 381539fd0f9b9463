package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE (interval-containment) JOIN — match every point row to the
  * interval rows of the same key that CONTAIN it (start ≤ t ≤ end). The
  * other classic timeseries join Spark has no native operator for: the
  * naive `points.join(intervals, pred)` has no equi-condition, so Catalyst
  * falls back to broadcast-nested-loop — every point × every interval.
  *
  * Spark-first design: BUCKETIZE time. Intervals explode into the fixed-
  * width buckets they overlap (an interval of length L covers
  * ⌈L/width⌉+1 buckets); points land in exactly one bucket; the join is a
  * plain equi-join on (keys…, bucket) with the containment predicate as a
  * post-filter. Each qualifying (point, interval) pair matches EXACTLY
  * once — the point's bucket is unique — so no dedup pass is needed.
  * Shuffle cost is linear in points + interval-bucket covers; candidate
  * pairs are bounded by per-bucket density instead of |points|×|intervals|.
  * `bucketWidthUs` tunes the tradeoff: ~the typical interval length keeps
  * the explode factor ≈ 2 while keeping buckets selective.
  */
object RangeJoin {

  /** @param points        rows with an instant column
    * @param intervals     rows with [startCol, endCol] (inclusive both ends)
    * @param keys          equi-join key columns present on both sides
    * @param pointTimeUs   point instant column (epoch micros, long)
    * @param startUs       interval start column (epoch micros, long)
    * @param endUs         interval end column (epoch micros, long)
    * @param bucketWidthUs bucket width in micros
    * @return every (point × containing interval) row: all point columns
    *         plus the interval's non-key columns
    */
  def bucketedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTimeUs: String,
      startUs: String,
      endUs: String,
      bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucketWidthUs must be positive")
    val keyCols = keys.map(col)
    // sequence() is inclusive on both ends, so every overlapped bucket of
    // the interval is covered; coalesce keeps the key non-nullable (an
    // inferred isnotnull on a nullable join key re-evaluates the
    // expression below the exchange and breaks exchange reuse)
    val ib = intervals.withColumn("_bucket",
      explode(sequence(
        (col(startUs) / bucketWidthUs).cast("long"),
        (col(endUs) / bucketWidthUs).cast("long"))))
      .withColumn("_bucket", coalesce(col("_bucket"), lit(0L)))
    val pb = points.withColumn("_bucket",
      coalesce((col(pointTimeUs) / bucketWidthUs).cast("long"), lit(0L)))
    pb.join(ib, keys :+ "_bucket")
      .filter(col(pointTimeUs) >= col(startUs) &&
        col(pointTimeUs) <= col(endUs))
      .drop("_bucket")
  }
}
