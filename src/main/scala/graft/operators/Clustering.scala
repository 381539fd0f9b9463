package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-replayable distributed k-means (integer-quantized Lloyd's).
  *
  * The IVF/SemDeDup surface ([[graft.operators.Similarity.buildIvfIndex]])
  * trains float k-means via Spark ML, whose centroids are NOT
  * SQL-replayable — float reduction order differs run to run, so those
  * operators carry property specs instead of hash oracles. This operator
  * closes that gap for the cases where a pinned, cross-engine-reproducible
  * clustering is worth a quantization step (corpus bucketing for SemDeDup,
  * deterministic shard assignment, audit-grade cluster stats):
  *
  *   - embeddings are quantized to non-negative longs
  *     (`round((x + 1.0) * 4096)` — the +1.0 shift keeps every component
  *     positive so truncating integer division below equals floor division
  *     in BOTH engines; 4096 is a power of two, so the scale multiply is
  *     exact in IEEE double and the rounding boundary is computed
  *     identically by Spark and DuckDB);
  *   - seeds = the k vectors with smallest `(md5(vec_id), vec_id)` — the
  *     repo-standard engine-portable "random but pinned" order
  *     ([[graft.operators.Assembly]] splits use the same md5 idiom);
  *   - Lloyd iterations run entirely in integer arithmetic: assignment by
  *     exact squared L2 ([[graft.functions.VectorOps.vec_l2sq_long]],
  *     ties → lowest cluster id), update by per-dimension `sum div n`
  *     (exact — no float accumulation order anywhere);
  *   - empty clusters keep their previous centroid (deterministic, no
  *     re-seeding).
  *
  * Scale shape (the 100 TB story): each iteration is ONE scan of the
  * corpus — a narrow codegen'd argmin map (k distance loops per row, no
  * join, centroids are literals in the plan) followed by a groupBy(cluster)
  * with map-side partial aggregation, shuffling at most
  * `shufflePartitions × k` rows of (cluster, 64 sums, count). Driver state
  * is k×dim longs per iteration — the same collect-and-rebroadcast
  * structure Spark ML's own KMeans uses. No crossJoin, no all-pairs stage;
  * cost is O(iters × scan).
  *
  * Reference parity: the reference engine has no clustering surface — this
  * is part of the north-star training-data-pipeline extension
  * (SemDeDup-style corpus bucketing needs a clusterer whose output an
  * auditor can replay).
  */
object Clustering {

  /** Quantization scale: power of two so `(x + shift) * scale` is exact in
    * double arithmetic (only the exponent changes), making the HALF_UP
    * rounding boundary identical across engines.
    */
  val Scale = 4096.0

  /** Component shift applied before scaling. Corpus components are unit-ish
    * (|x| < 1 by construction of the synthetic embeddings; asserted in the
    * spec), so +1.0 makes every quantized value strictly positive and
    * truncating division == floor division engine-independently.
    */
  val Shift = 1.0

  /** `(vec_id, q: array<long>)` — the quantized corpus. */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      transform(
        col("embedding"),
        x => round((x.cast("double") + lit(Shift)) * lit(Scale)).cast("long")
      ).as("q"))

  /** Deterministic seeds: quantized vectors of the k smallest
    * `(md5(vec_id), vec_id)` — TakeOrdered over the corpus, k×dim longs to
    * the driver.
    */
  def initCentroids(quant: DataFrame, k: Int): Array[Array[Long]] =
    quant
      .select(
        col("q"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"),
        col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Long](0).toArray)

  /** `struct(dist, cluster)` of the nearest centroid — array_min over
    * per-centroid structs compares (dist, id) lexicographically, so ties
    * break to the lowest cluster id, matching the oracle's
    * `ORDER BY dist, j` row_number.
    */
  private def nearest(centroids: Array[Array[Long]]) = {
    val cands = centroids.zipWithIndex.map { case (c, j) =>
      struct(
        graft.functions.VectorOps
          .vec_l2sq_long(col("q"), typedLit(c.toSeq)).as("dist"),
        lit(j).as("cluster"))
    }
    array_min(array(cands.toIndexedSeq: _*))
  }

  /** Run `iters` Lloyd iterations from the md5 seeds; returns the final
    * centroids. Each iteration: one scan (assign + 64 partial sums + count),
    * k rows collected, empty clusters carry the previous centroid.
    */
  def lloyd(
      quant: DataFrame,
      k: Int,
      iters: Int): Array[Array[Long]] = {
    var cents = initCentroids(quant, k)
    if (cents.isEmpty) return cents // empty corpus: nothing to iterate
    val dim = cents.head.length
    for (_ <- 1 to iters) {
      val assigned = quant
        .withColumn("cluster", nearest(cents).getField("cluster"))
      val sums = (0 until dim).map(d => sum(col("q")(d)).as(s"s$d"))
      val rows = assigned
        .groupBy("cluster")
        .agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
        .collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val j = r.getInt(0)
        val n = r.getLong(dim + 1)
        var d = 0
        while (d < dim) {
          // non-negative operands: truncating 'div' == floor — identical to
          // DuckDB's '//' on the same sums
          next(j)(d) = java.lang.Math.floorDiv(r.getLong(d + 1), n)
          d += 1
        }
      }
      cents = next
    }
    cents
  }

  /** Per-cluster audit summary under the final centroids:
    * `(cluster, n, inertia, centroid_checksum)` — every value an exact
    * integer, hash-matched by the DuckDB oracle replaying the identical
    * iterations. Clusters that end empty still appear (n = 0), so there is
    * exactly one row per seed — min(k, corpus size) rows (initCentroids
    * clamps the seed count to the corpus size when n < k; EdgeCaseSpec
    * pins 2 rows for k=8 on a 2-vector corpus).
    */
  def kmeansSummary(
      spark: SparkSession,
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3): DataFrame = {
    import spark.implicits._
    val quant = quantized(embeddings)
    val cents = lloyd(quant, k, iters)
    if (cents.isEmpty)
      // empty corpus: no seeds, no clusters — an empty summary with the
      // contract schema, not a crash in the argmin builder
      return Seq.empty[(Int, Long, Long, Long)]
        .toDF("cluster", "n", "inertia", "centroid_checksum")
    val near = nearest(cents)
    val stats = quant
      .select(
        near.getField("cluster").as("cluster"),
        near.getField("dist").as("dist"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum("dist").as("inertia"))
    // checksum Σ_d (d+1-based) * c_jd is driver-side exact arithmetic on the
    // collected centroids — k rows, broadcast into the left join below
    val checks = cents.zipWithIndex.map { case (c, j) =>
      (j, c.zipWithIndex.map { case (v, d) => (d + 1L) * v }.sum)
    }.toSeq.toDF("cluster", "centroid_checksum")
    checks
      .join(stats, Seq("cluster"), "left")
      .select(
        col("cluster"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("inertia"), lit(0L)).as("inertia"),
        col("centroid_checksum"))
      .orderBy("cluster")
  }

  /** Final cluster assignment `(vec_id, cluster)` — the piece SemDeDup-style
    * pipelines consume as their pre-clustering.
    */
  def kmeansAssign(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3): DataFrame = {
    val quant = quantized(embeddings)
    val cents = lloyd(quant, k, iters)
    if (cents.isEmpty)
      return quant.select(col("vec_id"), lit(-1).as("cluster")).limit(0)
    quant.select(
      col("vec_id"),
      nearest(cents).getField("cluster").as("cluster"))
  }

  /** The corpus with its cluster id attached and the embedding column kept
    * — `(vec_id, embedding, cluster)` via a NARROW final-assignment map
    * (no self-join back onto the corpus). This is the cell-assignment
    * input shape [[graft.operators.Dedup.semanticDedupExact]] consumes.
    */
  def assignedCorpus(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3): DataFrame = fit(embeddings, k, iters)._2

  /** Cluster-vs-label agreement audit: the contingency table between the
    * learned cells and a pre-existing `label` column —
    * `(cluster, label, n, cluster_n, is_majority)`, one row per observed
    * (cell, label) pair with the cell's total and a majority-label flag
    * (ties → lowest label). All integers/booleans, hash-matched by the
    * oracle replaying the same Lloyd rounds.
    *
    * This is the "do my learned cells mean anything" report: high
    * per-cell majority mass ⇒ the clustering recovers the labeling (or
    * the labels leak into the embedding space); a uniform table on a
    * supposedly-clustered corpus flags an encoder or pipeline regression.
    *
    * 100 TB shape: the assignment scan (label rides along — no join back
    * to the corpus) + one (cluster, label) partial-agg shuffle of count
    * tuples + a k×|labels|-row window. Nothing corpus-sized leaves the
    * scan stage.
    */
  def clusterLabelProfile(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3): DataFrame = {
    val quant = quantized(embeddings)
    val cents = lloyd(quant, k, iters)
    val spark = embeddings.sparkSession
    import spark.implicits._
    if (cents.isEmpty)
      return Seq.empty[(Int, Int, Long, Long, Boolean)]
        .toDF("cluster", "label", "n", "cluster_n", "is_majority")
    val counts = embeddings
      .select(
        col("label"),
        transform(
          col("embedding"),
          x => round((x.cast("double") + lit(Shift)) * lit(Scale)).cast("long")
        ).as("q"))
      .select(nearest(cents).getField("cluster").as("cluster"), col("label"))
      .groupBy("cluster", "label")
      .agg(count(lit(1)).as("n"))
    val byCluster = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("n").desc, col("label"))
    counts
      .withColumn("cluster_n", sum(col("n")).over(byCluster))
      .withColumn("is_majority", row_number().over(rank) === 1)
      .orderBy(col("cluster"), col("label"))
  }

  /** Batch occupancy-drift audit — the oracle-checkable twin of
    * [[graft.streaming.StreamKmeans.windowedCellCounts]]: hash-split the
    * corpus (engine-portable md5 boundaries, [[Assembly.splitExpr]]),
    * train the replayable Lloyd cells on the `train` half ONLY, assign
    * BOTH halves in one scan, and report per-cell occupancy side by side
    * — `(cluster, n_train, n_live)`. A live profile that diverges from
    * the training profile is training-serving skew (new content domain,
    * encoder change, ingestion bug); here the halves come from one
    * corpus, so the audit doubles as a split-balance sanity check. All
    * integers, hash-matched end to end (`embedding_occupancy_drift`).
    *
    * 100 TB shape: training touches only the train half (iters scans);
    * the report is ONE assignment scan over everything + a k-row
    * (cluster) partial-agg shuffle. Empty cells still report (0, 0).
    */
  def occupancyDrift(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3,
      salt: String = "drift"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val halves = Seq("train" -> 0.5, "live" -> 0.5)
    val withSplit = embeddings
      .withColumn("split", Assembly.splitExpr(col("vec_id"), halves, salt))
    val cents = lloyd(
      quantized(withSplit.filter(col("split") === "train")), k, iters)
    if (cents.isEmpty)
      return Seq.empty[(Int, Long, Long)]
        .toDF("cluster", "n_train", "n_live")
    val counts = withSplit
      .select(
        col("split"),
        transform(
          col("embedding"),
          x => round((x.cast("double") + lit(Shift)) * lit(Scale)).cast("long")
        ).as("q"))
      .select(nearest(cents).getField("cluster").as("cluster"), col("split"))
      .groupBy("cluster")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "live", 1L).otherwise(0L)).as("n_live"))
    val clusters = cents.indices.toDF("cluster")
    clusters
      .join(counts, Seq("cluster"), "left")
      .select(
        col("cluster"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_live"), lit(0L)).as("n_live"))
      .orderBy("cluster")
  }

  /** Cluster-coverage diversity sample: `perCell` vectors from EVERY
    * learned Lloyd cell, picked by the repo-standard pinned hash order
    * (smallest (md5(vec_id), vec_id) within the cell). Uniform hash
    * sampling over-represents dense regions; equal per-cell quotas keep
    * the sparse corners of the embedding space in the sample — the
    * coverage-preserving subset used for eval sets, human-review panels
    * and seed corpora. Deterministic end to end, so the DuckDB oracle
    * replays the identical picks.
    *
    * 100 TB shape: k-means is the bounded Lloyd loop; selection is
    * TWO-PHASE like [[Curation.capPerSource]] — phase 1 keeps each
    * partition's `perCell` smallest (hash, id) per cell in a bounded
    * in-memory heap (narrow map, no shuffle, provably lossless: a row
    * outside its partition's local smallest-N cannot be in the global
    * smallest-N), so the final window sorts at most
    * perCell × partitions × k rows — never a corpus-sized cell.
    */
  def diverseSample(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3,
      perCell: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val assigned = kmeansAssign(embeddings, k, iters)
      .select(col("vec_id").cast("long"), col("cluster"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
    // phase 1: bounded per-partition heap (worst kept pick at the head)
    val local = assigned.as[(Long, Int, String)].mapPartitions { it =>
      val ord = Ordering.Tuple2(Ordering.String, Ordering.Long)
      val heaps = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.PriorityQueue[(String, Long)]]
      it.foreach { case (id, c, h) =>
        val q = heaps.getOrElseUpdate(c,
          scala.collection.mutable.PriorityQueue.empty(ord))
        if (q.size < perCell) q.enqueue((h, id))
        else if (ord.lt((h, id), q.head)) { q.dequeue(); q.enqueue((h, id)) }
      }
      heaps.iterator.flatMap { case (c, q) =>
        q.iterator.map { case (h, id) => (id, c, h) }
      }
    }.toDF("vec_id", "cluster", "h")
    // phase 2: exact quota over the bounded survivor set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("h"), col("vec_id"))
    local
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= perCell)
      .select(col("vec_id"), col("cluster"), col("pick_rank"))
      .orderBy(col("cluster"), col("pick_rank"))
  }

  /** Train + assign in one call, returning both the final quantized
    * centroids (for consumers that need the model itself — e.g. the
    * deterministic IVF build, or a streaming assignment against pinned
    * centroids) and the assigned corpus `(vec_id, embedding, cluster)`.
    */
  def fit(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3): (Array[Array[Long]], DataFrame) = {
    val full = embeddings.select(
      col("vec_id"), col("embedding"),
      transform(
        col("embedding"),
        x => round((x.cast("double") + lit(Shift)) * lit(Scale)).cast("long")
      ).as("q"))
    val cents = lloyd(full.select("vec_id", "q"), k, iters)
    if (cents.isEmpty)
      return (cents, full
        .select(col("vec_id"), col("embedding"), lit(-1).as("cluster"))
        .limit(0))
    (cents, full.select(
      col("vec_id"), col("embedding"),
      nearest(cents).getField("cluster").as("cluster")))
  }
}
