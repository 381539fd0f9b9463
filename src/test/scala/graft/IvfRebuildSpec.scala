package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sinks.Sink

/** The drift-and-retrain maintenance valve of the persisted IVF index:
  * build census written at build time, occupancy drift read off disk,
  * rebuild fires only past the threshold, post-rebuild queries are
  * bit-identical under exhaustive probes, and cell balance actually
  * recovers (the reason the valve exists).
  */
class IvfRebuildSpec extends SparkSpec {
  import spark.implicits._

  test("drift census, threshold no-op, rebuild parity + balance recovery") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 1000)
    val dir = java.nio.file.Files.createTempDirectory("ivf_rebuild").toString
    val idx = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
    try {
      Sink.writeIvfIndex(idx, dir)
      val n = emb.count()

      // fresh index: drift census covers every cell, growth 0 everywhere
      val fresh = Sink.ivfOccupancyDrift(spark, dir).collect()
      assert(fresh.map(_.getAs[Long]("n_build")).sum === n)
      assert(fresh.forall(r =>
        r.getAs[Long]("n_now") === r.getAs[Long]("n_build")))
      assert(fresh.forall(_.getAs[Long]("growth_ppm") === 0L))

      // below-threshold ingest: a small balanced ADD must NOT rebuild
      val mild = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
      Sink.appendIvfIndex(spark, dir, mild, batchId = 0L)
      val (rebuilt0, ppm0) =
        Sink.rebuildIvfIndex(spark, dir, nlist = 8, thresholdPpm = 500000L)
      assert(!rebuilt0, s"balanced +2% ingest must not rebuild (ppm $ppm0)")
      assert(new java.io.File(s"$dir/ingested").exists(),
        "no-op path must leave the layout untouched")

      // skewed ingest: clones of one vector all land in ONE cell
      val skew = emb.filter(col("vec_id") === 0L)
        .select(col("embedding"))
        .crossJoin(spark.range(600000L, 600500L).toDF("vec_id"))
        .select(col("vec_id"), col("embedding"))
      Sink.appendIvfIndex(spark, dir, skew, batchId = 1L)
      val drifted = Sink.ivfOccupancyDrift(spark, dir).collect()
      val maxGrow = drifted.map(_.getAs[Long]("growth_ppm")).max
      assert(maxGrow >= 500000L,
        s"500 clones into ~${n / 8}-row cells must balloon one (got $maxGrow)")
      val maxOccBefore = drifted.map(_.getAs[Long]("n_now")).max

      // exhaustive-probe answers are layout-independent: pin them
      val queries = emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 900000L).as("query_id"), col("embedding"))
      def exhaustive() = Similarity.ivfQueryVectors(
        Sink.readIvfIndex(spark, dir), queries, k = 8, nprobe = 8)
      val before = exhaustive().collect().toSeq

      val (rebuilt, ppm) =
        Sink.rebuildIvfIndex(spark, dir, nlist = 8, thresholdPpm = 500000L)
      assert(rebuilt && ppm === maxGrow)
      assert(!new java.io.File(s"$dir/ingested").exists(),
        "rebuild must absorb the ingested layout")

      // parity: bit-identical rows (unit arrays preserved, not
      // re-normalized — cosine doubles must not drift)
      assert(exhaustive().collect().toSeq === before,
        "exhaustive-probe answers must survive the rebuild bit for bit")

      // census refreshed: drift zero again, all rows accounted for
      val after = Sink.ivfOccupancyDrift(spark, dir).collect()
      assert(after.map(_.getAs[Long]("n_build")).sum === n + 20 + 500)
      assert(after.forall(_.getAs[Long]("growth_ppm") === 0L))
      // balance recovered: the fattest cell shrank — the retrained
      // quantizer splits the ballooned region instead of stacking it
      val maxOccAfter = after.map(_.getAs[Long]("n_now")).max
      assert(maxOccAfter < maxOccBefore,
        s"max cell $maxOccBefore -> $maxOccAfter must shrink")
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
