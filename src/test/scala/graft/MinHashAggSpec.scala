package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinHash, MinHashAgg}
import graft.operators.Dedup

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private def shingled =
    Tables.documents(spark, sf).select(col("doc_id"), col("lang"),
      MinHash.word_shingle_hashes(Dedup.normText(col("text")), 3).as("sh"))

  test("group signature equals the signature of the union of element sets") {
    val agg = shingled.groupBy(col("lang"))
      .agg(MinHashAgg.minhash_agg(col("sh")).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    val union = shingled
      .select(col("lang"), explode(col("sh")).as("h")).distinct()
      .groupBy(col("lang")).agg(collect_list(col("h")).as("hs"))
      .select(col("lang"), MinHash.minhash_sig(col("hs"), 64).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(agg.keySet === union.keySet)
    agg.foreach { case (lang, sig) => assert(sig === union(lang), lang) }
  }

  test("partition-layout invariance: merge path gives identical signatures") {
    val base = shingled.groupBy(col("lang"))
      .agg(MinHashAgg.minhash_agg(col("sh")).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    val reparted = shingled.repartition(17)
      .groupBy(col("lang"))
      .agg(MinHashAgg.minhash_agg(col("sh")).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(base === reparted)
  }

  test("estimated jaccard between group signatures tracks the exact value") {
    // group a = elements 0..99, group b = 50..149: exact J = 50/150
    val rows = (0 until 100).map(i => ("a", i.toLong)) ++
      (50 until 150).map(i => ("b", i.toLong))
    val df = rows.toDF("g", "h").groupBy(col("g"))
      .agg(MinHashAgg.minhash_agg(array(xxhash64(col("h")))).as("sig"))
    val sigs = df.as[(String, Seq[Long])].collect().toMap
    val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 64.0
    val exact = 50.0 / 150.0
    info(s"estimated=$est exact=$exact")
    assert(math.abs(est - exact) < 0.2, s"est=$est exact=$exact")
  }

  test("all-null input and empty-set members finalize as the zero signature") {
    val df = Seq(("g", null: Seq[Long])).toDF("g", "sh")
      .groupBy(col("g")).agg(MinHashAgg.minhash_agg(col("sh")).as("sig"))
    assert(df.as[(String, Seq[Long])].head()._2 === Seq.fill(64)(0L))
  }

  test("pairwise signature compare plans as a broadcast join, no shuffle") {
    // the dedup_group_minhash shape: one signature row per SOURCE, so the
    // pairwise cross join is |sources|^2 and must broadcast the build side
    // rather than shuffle it as sources grow
    val sigs = shingled.groupBy(col("lang"))
      .agg(MinHashAgg.minhash_agg(col("sh")).as("sig"))
    val a = sigs.select(col("lang").as("la"), col("sig").as("siga"))
    val b = sigs.select(col("lang").as("lb"), col("sig").as("sigb"))
    val pairs = a.crossJoin(broadcast(b)).filter(col("la") < col("lb"))
    pairs.count() // finalize AQE
    val plan = pairs.queryExecution.executedPlan.toString
    // the signature AGGREGATION shuffles on the group key (inherent); the
    // pairwise JOIN must broadcast, never CartesianProduct/shuffle
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast NLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"signature compare must not run as a shuffled cartesian:\n$plan")
  }
}
