package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** North-star similarity search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Two paths, per the mandate:
  *
  *   - brute-force cosine top-k — the exact baseline. Queries are a small
  *     fixed set, so the candidate side is broadcast-joined against them:
  *     one scan of the corpus, per-partition top-k via window, no n²
  *     anywhere. At 100 TB this is exactly the shape you want (corpus scan
  *     × small query batch);
  *   - hyperplane-LSH ANN — the scale path when the query side is also
  *     large: sign-random-projection signatures bucket the corpus; probing
  *     compares only same-bucket candidates, then exact-reranks.
  *
  * All arithmetic is double-precision with a fixed left-to-right fold
  * (`aggregate` over `zip_with`), matching DuckDB's sequential loop so
  * oracle scores are bit-identical.
  */
object Similarity {

  /** Dot product of two array<double> columns — one codegen'd loop
    * (graft.functions.VectorOps; the HOF `aggregate(zip_with(...))` form is
    * CodegenFallback and its interpreted per-element dispatch dominated the
    * pairwise workloads). Accumulation order is identical, so scores are
    * bit-equal to the composable form and to DuckDB's loop.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize (array<float|double> → unit array<double>);
    * pre-normalizing once turns every downstream cosine into a plain dot
    * product.
    */
  def normalized(a: Column): Column =
    graft.functions.VectorOps.vec_unit(a)

  /** Exact cosine top-k: for each query vector (small fixed set), the k
    * nearest corpus vectors. Query side broadcast; ranking via window with
    * deterministic tie-break.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10): DataFrame = {
    val unit = embeddings.select(
      col("vec_id"), normalized(col("embedding")).as("unit"))
    val queries = unit
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
    val scored = unit
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into nlist cells; each query probes its nprobe nearest cells
    * and exact-reranks only those candidates. The complementary scale path
    * to SRP-LSH: cells adapt to the data distribution, and at 100 TB the
    * cell id becomes the partition key (each probe touches nprobe
    * partitions, not the corpus).
    *
    * Centroids are trained with Spark ML KMeans (fixed seed); assignment
    * and probing are pure column expressions over the broadcast centroid
    * literals (argmax of vec_dot against each centroid — unit vectors, so
    * max dot = nearest).
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val unit = embeddings.select(
      col("vec_id"), normalized(col("embedding")).as("unit"))
    val train = unit.select(array_to_vector(col("unit")).as("features"))
    val model = new KMeans()
      .setK(nlist).setSeed(7L).setMaxIter(10).setFeaturesCol("features")
      .fit(train)
    // unit-normalized centroids as literal arrays (tiny: nlist × dim)
    val centroids = model.clusterCenters.map { c =>
      val a = c.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / n)
    }
    def centroidDots(v: Column): Seq[Column] =
      centroids.toSeq.map(c => dot(v, typedLit(c.toSeq)))
    // cell assignment = argmax over centroid dots. NOTE: a when/otherwise
    // fold here duplicates the running-best subtree at every step — a
    // 2^nlist-node expression that hangs the analyzer. array_position of
    // the max keeps the tree linear (first occurrence = deterministic
    // tie-break on the lower cell id).
    def cellOf(v: Column): Column = {
      val dots = array(centroidDots(v): _*)
      (array_position(dots, array_max(dots)) - 1).cast("int")
    }
    val celled = unit.withColumn("cell", cellOf(col("unit")))
    // queries probe their nprobe nearest cells
    val queries = celled
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
      .withColumn("probe_cells",
        slice(sortByDotDesc(centroidDots(col("q_unit"))), 1, nprobe))
      .select(col("query_id"), col("q_unit"),
        explode(col("probe_cells")).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    celled
      .join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Cell ids ordered by descending dot product: build (dot, id) structs,
    * sort descending via sort_array on negated dot, project the ids.
    */
  private def sortByDotDesc(dots: Seq[Column]): Column =
    transform(
      sort_array(array(dots.zipWithIndex.map { case (d, i) =>
        struct((-d).as("negdot"), lit(i).as("id"))
      }: _*)),
      s => s.getField("id"))

  /** Deterministic random hyperplanes: nBits × dim doubles seeded once. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Sign-random-projection signature (one long, nBits ≤ 64). */
  def srpSignature(unit: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(unit, typedLit(p.toSeq))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: candidates share the signature bucket of the query
    * (multi-probe via band sub-signatures), exact-reranked by true cosine.
    * Recall < 1 by construction; the companion spec measures it against
    * [[bruteForceTopK]].
    */
  /** Nearest within-label neighbor for every vector — the argmax join shape
    * (label is the blocking key; at scale the label partitions bound the
    * pair space, and each block is an independent shuffle-local problem).
    */
  def nnWithinLabel(embeddings: DataFrame): DataFrame = {
    // repartition before aliasing: materializes the normalized vectors
    // ahead of the self-join (no per-pair renormalization) and lets
    // ReuseExchange share one exchange between both branches
    val v = embeddings.select(
      col("label"), col("vec_id"), normalized(col("embedding")).as("unit"))
      .repartition(col("label"))
    val a = v.select(col("label"), col("vec_id"), col("unit"))
    val b = v.select(col("label"), col("vec_id").as("nn_vec_id"),
      col("unit").as("nn_unit"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nn_vec_id"))
    a.join(b, "label")
      .filter(col("vec_id") =!= col("nn_vec_id"))
      .select(col("label"), col("vec_id"), col("nn_vec_id"),
        dot(col("unit"), col("nn_unit")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("label"), col("vec_id"), col("nn_vec_id"))
      .orderBy(col("vec_id"))
  }

  def lshTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nBits: Int = 64,
      bands: Int = 16,
      dim: Int = 64): DataFrame = {
    // dim must match the embedding column; vec_dot throws loudly on a
    // mismatch rather than silently projecting a truncated signature
    val planes = hyperplanes(nBits, dim)
    val bitsPerBand = nBits / bands
    val mask = (1L << bitsPerBand) - 1
    val unit = embeddings.select(
      col("vec_id"), normalized(col("embedding")).as("unit"))
      .withColumn("sig", srpSignature(col("unit"), planes))
    val banded = unit.select(
      col("vec_id"), col("unit"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)): _*))
        .as(Seq("band", "bucket")))
    val queries = banded
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("band"), col("bucket"),
        col("vec_id").as("query_id"), col("unit").as("q_unit"))
    val candidates = banded
      .join(broadcast(queries), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("unit"), col("q_unit"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    candidates
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }
}
