package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity
import graft.sinks.Sink
import graft.streaming.StreamLshIngest

/** The incremental half of the LSH index lifecycle — the
  * StreamAnnIngestSpec twin: vectors streamed into a persisted SRP-LSH
  * index are signed with the PERSISTED hyperplanes (never a resample),
  * become immediately queryable with the same static bucket pruning,
  * land exactly once across kill/replay, and fold back into the base
  * layout under a query-bit-parity compaction.
  */
class StreamLshIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeVecFile(
      dir: Path, name: String, rows: Seq[(Long, Seq[Float])]): Unit = {
    val lines = rows.map { case (id, emb) =>
      s"""{"vec_id":$id,"embedding":[${emb.mkString(",")}]}"""
    }
    val tmp = dir.resolve(s".$name.tmp")
    Files.write(tmp, String.join("\n", lines: _*).getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(name))
  }

  private def vecStream(dir: Path): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.readStream.schema(schema).json(dir.toString)
  }

  test("streamed LSH ingest: persisted planes, exactly-once across " +
      "kill/replay, pruning on both layouts, bit-parity compaction") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250 && col("vec_id") < 260)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val idx = Similarity.buildLshIndex(half, nBits = 64, bands = 16, dim = 64)
    val idxDir = Files.createTempDirectory("lsh_ingest_idx").toString
    val input = Files.createTempDirectory("lsh_ingest_in")
    val checkpoint = Files.createTempDirectory("lsh_ingest_ckpt")
    try {
      Sink.writeLshIndex(idx, idxDir)
      val nBase = spark.read.parquet(s"$idxDir/signed").count()

      def run(): Unit = {
        val q = StreamLshIngest.ingestWriter(vecStream(input), idxDir)
          .option("checkpointLocation", checkpoint.toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }

      val (batch1, batch2) = (rest.take(5), rest.drop(5))
      writeVecFile(input, "batch1.json", batch1)
      run() // epoch 1, then the driver "dies"

      // hyperplanes untouched, and the ingested signatures EQUAL what
      // the persisted planes produce — the never-resample contract: a
      // fresh hash family would strand every existing posting
      val loaded1 = Sink.readLshIndex(spark, idxDir)
      assert(loaded1.planes.map(_.toSeq).toSeq
        === idx.planes.map(_.toSeq).toSeq)
      assert(loaded1.signed.count() === nBase + 5)
      val expectedSigs = half.sparkSession
        .createDataFrame(batch1).toDF("vec_id", "embedding")
        .select(col("vec_id"),
          Similarity.srpSignature(
            Similarity.normalized(col("embedding")), idx.planes).as("sig"))
        .as[(Long, Long)].collect().toMap
      loaded1.signed.filter(col("vec_id") >= 250)
        .select(col("vec_id"), col("sig")).as[(Long, Long)]
        .collect().foreach { case (id, sig) =>
          assert(sig === expectedSigs(id),
            s"ingested $id must be signed with the persisted planes")
        }

      writeVecFile(input, "batch2.json", batch2)
      run() // epoch 2 from the same checkpoint

      val loaded2 = Sink.readLshIndex(spark, idxDir)
      assert(loaded2.signed.count() === nBase + 10)
      val ingestedIds = loaded2.signed
        .filter(col("vec_id") >= 250).select(col("vec_id"))
        .as[Long].collect().toSeq
      assert(ingestedIds.sorted === rest.map(_._1).sorted)
      // postings: bands rows per ingested vector, exactly once
      assert(loaded2.postings.filter(col("vec_id") >= 250).count()
        === 10L * idx.bands)

      // REPLAY epoch 1's rows as batch 0 directly: the dynamic
      // overwrite must land them on top of themselves, not duplicate
      Sink.appendLshIndex(spark, idxDir,
        batch1.toDF("vec_id", "embedding"), batchId = 0L)
      val replayed = Sink.readLshIndex(spark, idxDir)
      assert(replayed.signed.count() === nBase + 10,
        "replayed batches must overwrite their own signed partitions")
      assert(replayed.postings.count()
        === (nBase + 10) * idx.bands,
        "replayed batches must overwrite their own postings partitions")

      // ingested vectors are queryable through the pruned path, and the
      // probe plan prunes BOTH postings layouts (base + ingested)
      val qids = Seq(250L, 255L)
      val res = Similarity.lshQueryPruned(replayed, qids, k = 5)
      val rows = res.select(col("query_id"), col("vec_id"))
        .as[(Long, Long)].collect().toSeq
      assert(rows.map(_._1).toSet === qids.toSet,
        "ingested ids must be answerable queries")
      val planStr = res.queryExecution.executedPlan.toString
      val prunes = "PartitionFilters: \\[[^\\]]*band".r
        .findAllIn(planStr).toSeq
      assert(prunes.size === 2,
        s"both postings scans must carry band/bucket filters:\n$planStr")

      // COMPACTION: queries bit-identical before and after; ingested
      // dirs dropped; base tables absorb the rows
      val before = res.collect().toSeq
      val (nRows, nFolded) = Sink.compactLshIndex(spark, idxDir)
      assert(nRows === nBase + 10)
      assert(nFolded > 0L, "compaction must report the files it folded")
      assert(!new java.io.File(s"$idxDir/signed_ingested").exists())
      assert(!new java.io.File(s"$idxDir/postings_ingested").exists())
      val compacted = Sink.readLshIndex(spark, idxDir)
      assert(compacted.signed.count() === nBase + 10)
      assert(compacted.postings.count() === (nBase + 10) * idx.bands)
      val after = Similarity.lshQueryPruned(compacted, qids, k = 5)
        .collect().toSeq
      assert(after === before,
        "compaction must not change any query result")
      // compacting an already-compact index is a no-op report
      assert(Sink.compactLshIndex(spark, idxDir) === ((nBase + 10, 0L)))
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(input.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(checkpoint.toFile)
    }
  }
}
