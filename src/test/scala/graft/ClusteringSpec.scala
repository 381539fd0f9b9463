package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf)

  test("quantization precondition: components inside the +1.0 shift range") {
    // the engine-portable floor-division argument needs every quantized
    // value strictly positive — i.e. every raw component > -1.0 (and < 1.0
    // so the long arithmetic headroom analysis holds)
    val bad = emb
      .select(explode(col("embedding")).as("x"))
      .filter(col("x") <= -1.0f || col("x") >= 1.0f)
      .count()
    assert(bad === 0)
    val qMin = Clustering.quantized(emb)
      .select(min(array_min(col("q")))).as[Long].head()
    assert(qMin > 0L)
  }

  test("seeds are the k smallest (md5, vec_id) and deterministic") {
    val quant = Clustering.quantized(emb)
    val a = Clustering.initCentroids(quant, 4)
    val b = Clustering.initCentroids(quant, 4)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.length === 4)
    assert(a.forall(_.length === 64))
  }

  test("kmeansAssign partitions the corpus; ids within [0, k)") {
    val n = emb.count()
    val assigned = Clustering.kmeansAssign(emb, k = 4, iters = 2)
    assert(assigned.count() === n)
    assert(assigned.select(countDistinct("vec_id")).as[Long].head() === n)
    val ids = assigned.select("cluster").distinct().as[Int].collect()
    assert(ids.forall(j => j >= 0 && j < 4))
  }

  test("summary: rows = k exactly, sizes sum to corpus, run-over-run equal") {
    val s1 = Clustering.kmeansSummary(spark, emb, k = 4, iters = 2).collect()
    val s2 = Clustering.kmeansSummary(spark, emb, k = 4, iters = 2).collect()
    assert(s1.toSeq === s2.toSeq)
    assert(s1.length === 4)
    assert(s1.map(_.getLong(1)).sum === emb.count())
  }

  test("Lloyd monotonicity: inertia non-increasing as iterations grow") {
    // classical Lloyd's descent survives the integer quantization here:
    // each measured config is a strict refinement (same seeds, same exact
    // arithmetic, more rounds). Floored centroid components can in theory
    // break monotonicity by a hair; on this corpus they don't — and a
    // regression in assignment or update logic shows up as a large jump.
    def inertia(iters: Int): Long =
      Clustering.kmeansSummary(spark, emb, k = 4, iters = iters)
        .agg(sum("inertia")).as[Long].head()
    val i1 = inertia(1)
    val i2 = inertia(2)
    val i3 = inertia(3)
    assert(i2 <= i1)
    assert(i3 <= i2)
  }

  test("clusterLabelProfile: partition of corpus, one majority per cell") {
    val prof = Clustering.clusterLabelProfile(emb, k = 4, iters = 2)
      .as[(Int, Int, Long, Long, Boolean)].collect()
    assert(prof.map(_._3).sum === emb.count(), "counts partition the corpus")
    val byCluster = prof.groupBy(_._1)
    byCluster.foreach { case (c, rows) =>
      assert(rows.count(_._5) === 1, s"exactly one majority row in cell $c")
      assert(rows.forall(_._4 === rows.map(_._3).sum),
        s"cluster_n consistent in cell $c")
      val maj = rows.find(_._5).get
      // majority = max n, ties to the lowest label
      assert(rows.forall(r => r._3 < maj._3 ||
        (r._3 === maj._3 && r._2 >= maj._2)))
    }
    // labels come straight from the corpus domain
    val labels = emb.select("label").distinct().as[Int].collect().toSet
    assert(prof.map(_._2).toSet.subsetOf(labels))
  }

  test("occupancyDrift: halves reconcile with the hash split, k rows, stable") {
    import graft.operators.Assembly
    val drift = Clustering.occupancyDrift(emb, k = 4, iters = 2)
      .as[(Int, Long, Long)].collect()
    assert(drift.length === 4)
    assert(drift.map(r => r._2 + r._3).sum === emb.count(),
      "every vector lands in exactly one (cell, half)")
    // per-half totals equal the split's own sizes — occupancy is a
    // partition of each half, whatever the cells look like
    val sizes = Assembly
      .hashSplit(emb, "vec_id", Seq("train" -> 0.5, "live" -> 0.5), "drift")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(drift.map(_._2).sum === sizes("train"))
    assert(drift.map(_._3).sum === sizes("live"))
    val again = Clustering.occupancyDrift(emb, k = 4, iters = 2)
      .as[(Int, Long, Long)].collect()
    assert(drift.toSeq === again.toSeq)
  }

  test("assignment agrees with a brute-force scala replay (exact integers)") {
    val quant = Clustering.quantized(emb)
    val cents = Clustering.lloyd(quant, 4, 2)
    val rows = quant.select("vec_id", "q").as[(Long, Seq[Long])].collect()
    val expected = rows.map { case (id, q) =>
      val dists = cents.map(c =>
        q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      id -> dists.zipWithIndex.min._2
    }.toMap
    val got = Clustering.kmeansAssign(emb, k = 4, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === expected)
  }

  test("diverseSample: per-cell quota, pinned picks, partition invariance") {
    val perCell = 5
    val picks = Clustering.diverseSample(emb, k = 4, iters = 2,
      perCell = perCell).as[(Long, Int, Long)].collect().toSeq
    // quotas: at most perCell per cell, ranks contiguous from 1
    val byCell = picks.groupBy(_._2)
    byCell.foreach { case (_, rows) =>
      assert(rows.length <= perCell)
      assert(rows.map(_._3).sorted === (1L to rows.length.toLong))
    }
    // picks equal the single-window definition: smallest (md5(id), id)
    // within each cell of the same assignment
    val assigned = Clustering.kmeansAssign(emb, k = 4, iters = 2)
      .as[(Long, Int)].collect().toSeq
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = assigned.groupBy(_._2).flatMap { case (c, rows) =>
      rows.map(_._1).sortBy(id => (md5hex(id.toString), id))
        .take(perCell).zipWithIndex
        .map { case (id, i) => (id, c, i + 1L) }
    }.toSet
    assert(picks.toSet === expected)
    // the bounded-heap phase must not depend on partition layout
    val repart = Clustering.diverseSample(emb.repartition(13), k = 4,
      iters = 2, perCell = perCell).as[(Long, Int, Long)].collect().toSet
    assert(repart === picks.toSet)
  }
}
