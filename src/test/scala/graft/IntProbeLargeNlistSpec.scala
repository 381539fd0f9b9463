package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The large-nlist guard on the integer-lattice probe: below
  * [[Similarity.IntProbeInlineMaxNlist]] probe-cell selection inlines
  * the quantized centroids as literals into one `array_sort` expression
  * (zero joins); above it, that expression is a codegen bomb (nlist
  * struct nodes in one tree — FAISS-normal nlist=4096 blows the JIT
  * method limit), so the centroids become a broadcast nlist-row
  * relation ranked per query. The two forms must be BIT-EQUAL —
  * exact integer distances, ties → lowest cell id — or a deployment
  * crossing the threshold would silently change its candidate sets.
  */
class IntProbeLargeNlistSpec extends SparkSpec {
  import spark.implicits._

  private def collectRows(df: DataFrame): Seq[(Long, Long, Int)] =
    df.select(col("query_id"), col("vec_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSeq

  test("nlist=512: the broadcast-join probe is bit-equal to the " +
      "inline-expression probe, and its plan carries a join, not a " +
      "512-literal expression") {
    val dim = 8
    val nlist = 512
    // deterministic synthetic fixture: the guard is about PLAN SHAPE at
    // large nlist, not Lloyd training (spec'd elsewhere) — integer
    // lattice centroids and celled rows fabricated directly
    def qc(j: Int): Array[Long] =
      Array.tabulate(dim)(d => (((j * 31 + d * 17) % 97) + 4000).toLong)
    val qcents = Array.tabulate(nlist)(qc)
    val centroids = qcents.map(_.map(_.toDouble / 4096.0 - 1.0))
    val celled = spark.range(2000).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          d => (pmod(col("vec_id") * d * lit(37) + d, lit(200)) -
            lit(100)).cast("double") / lit(100.0)).as("embedding"))
      .select(col("vec_id"),
        Similarity.normalized(col("embedding")).as("unit"),
        pmod(col("vec_id"), lit(nlist)).cast("int").as("cell"))
    val index = Similarity.IvfIndex(centroids, celled, qcents)
    val queries = spark.range(3).toDF("query_id")
      .select(col("query_id"),
        transform(sequence(lit(1), lit(dim)),
          d => (pmod(col("query_id") * d * lit(53) + d * 7, lit(200)) -
            lit(100)).cast("double") / lit(100.0)).as("embedding"))

    val joined = Similarity.ivfQueryVectorsIntProbe(
      index, queries, k = 25, nprobe = 6) // 512 > threshold → join form
    val inline = Similarity.ivfQueryVectorsIntProbe(
      index, queries, k = 25, nprobe = 6, inlineMaxNlist = 4096)
    assert(collectRows(joined) === collectRows(inline),
      "probe forms must be bit-equal across the nlist threshold")
    assert(collectRows(joined).nonEmpty)
  }

  test("tie-break parity on a real exact-Lloyd index: forcing the join " +
      "form at small nlist reproduces the expression form exactly") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
    try {
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val inline = Similarity.ivfQueryVectorsIntProbe(
        idx, queries, k = 20, nprobe = 3)
      val joined = Similarity.ivfQueryVectorsIntProbe(
        idx, queries, k = 20, nprobe = 3, inlineMaxNlist = 0)
      assert(collectRows(inline) === collectRows(joined),
        "real-index parity: same cells, same candidates, same ranks")
    } finally idx.unpersist()
  }

  test("duplicate query_id rows with DIFFERENT embeddings: both forms " +
      "emit per-ROW probe sets and stay bit-equal (the r14-advice " +
      "divergence — the join form's window used to collapse them)") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
    try {
      // one query_id, two distinct embeddings — malformed per the
      // serving contract, but the two physical forms must still agree
      val dup = emb.filter(col("vec_id").isin(5L, 17L))
        .select(lit(900L).as("query_id"), col("embedding"))
      val inline = Similarity.ivfQueryVectorsIntProbe(
        idx, dup, k = 20, nprobe = 2)
      val joined = Similarity.ivfQueryVectorsIntProbe(
        idx, dup, k = 20, nprobe = 2, inlineMaxNlist = 0)
      assert(collectRows(inline) === collectRows(joined),
        "per-row probe sets: the forms must not diverge on duplicates")
      // and the probe genuinely saw BOTH rows' cells: the candidate
      // union must cover each embedding's own nearest vector
      val served = collectRows(inline).map(_._2).toSet
      assert(served.contains(5L) && served.contains(17L),
        "each duplicate row's own neighborhood must be probed")
    } finally idx.unpersist()
  }
}
