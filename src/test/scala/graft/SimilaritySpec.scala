package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf)
  val queryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  test("dot/norm/normalized: unit vectors have norm 1") {
    val norms = emb.limit(20)
      .select(Similarity.norm(Similarity.normalized(col("embedding"))))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
  }

  test("bruteForceTopK: k rows per query, self excluded, ranks contiguous") {
    val top = Similarity.bruteForceTopK(emb, queryIds, k = 10)
    val byQ = top.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(byQ.keySet === queryIds.toSet)
    assert(byQ.values.forall(_ === 10L))
    val self = top.filter(col("query_id") === col("vec_id")).count()
    assert(self === 0)
    val ranks = top.filter(col("query_id") === 0L)
      .select("rank").as[Int].collect().sorted
    assert(ranks.toSeq === (1 to 10))
  }

  test("bruteForceTopK scores are descending per query") {
    val sc = Similarity.bruteForceTopK(emb, Seq(0L), k = 10)
      .orderBy("rank").select("cosine").as[Double].collect()
    assert(sc.toSeq === sc.sorted(Ordering[Double].reverse).toSeq)
  }

  test("lshTopK: exact rerank subset with measurable recall") {
    val brute = Similarity.bruteForceTopK(emb, queryIds, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(emb, queryIds, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    info(s"ANN recall@10 = $recall (candidates only from matching LSH buckets)")
    assert(recall >= 0.3, s"recall $recall unexpectedly low")
    // reranking is exact, so any returned neighbor's rank ordering is true
    assert(ann.nonEmpty)
  }

  test("ivfTopK: k-means cells + multi-probe reach useful recall") {
    val brute = Similarity.bruteForceTopK(emb, queryIds, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queryIds, k = 10, nlist = 16, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(s"IVF recall@10 = $recall (nlist=16, nprobe=4)")
    assert(recall >= 0.3)
    val perQuery = Similarity.ivfTopK(emb, queryIds, k = 10)
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(perQuery.values.forall(_ <= 10))
  }

  test("nnWithinLabel: one row per vector, neighbor shares the label") {
    val nn = Similarity.nnWithinLabel(emb)
    assert(nn.count() === emb.count())
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().toMap
    val bad = nn.select("vec_id", "nn_vec_id").as[(Long, Long)].collect()
      .filter { case (v, n) => labels(v) != labels(n) }
    assert(bad.isEmpty)
  }
}
