package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-update audit a long-lived
  * training corpus needs: given yesterday's snapshot and today's, report
  * per-document what was added, removed, changed, or unchanged, by
  * content fingerprint. The reference engine appends rows forever
  * (`/root/reference/internal/db/db.go` INSERT path) and leaves "what
  * changed between loads" to the operator; this is that operator,
  * Spark-first.
  *
  * 100 TB shape: one key-partitioned shuffle per side feeding a
  * sort-merge full-outer join — the minimum data movement any diff can
  * do. Only (key, 16-byte fingerprint) crosses the network: text is
  * hashed in place at the scan, so the join carries ~24 bytes/doc
  * regardless of document size. When both snapshots are written bucketed
  * by the key (Sink.writeBucketed), the exchange disappears entirely and
  * the diff is a zero-shuffle zip of co-located buckets.
  */
object Snapshot {

  /** Per-document diff of two corpus snapshots keyed by `keyCol`,
    * comparing md5 of `textCol`. Output: (keyCol, old_md5, new_md5,
    * status) with status ∈ added | removed | changed | unchanged,
    * ordered by key. `added` = only in `newDf`, `removed` = only in
    * `oldDf`.
    */
  def corpusDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val o = oldDf.select(col(keyCol).as("k"), md5(col(textCol)).as("old_md5"))
    val n = newDf.select(col(keyCol).as("k"), md5(col(textCol)).as("new_md5"))
    o.join(n, Seq("k"), "full_outer")
      .select(
        col("k").as(keyCol),
        col("old_md5"),
        col("new_md5"),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .orderBy(col(keyCol))
  }

  /** Roll-up of [[corpusDiff]]: rows and distinct-content counts per
    * status — the one-line health check before promoting a snapshot.
    */
  def diffSummary(diff: DataFrame, keyCol: String = "doc_id"): DataFrame =
    diff.groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(coalesce(col("new_md5"), col("old_md5")))
          .as("n_distinct_contents"))
      .orderBy(col("status"))
}
