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
