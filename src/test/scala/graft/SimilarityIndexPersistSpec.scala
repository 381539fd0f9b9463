package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sinks.Sink

/** Round-trip of the on-disk IVF index layout: build → writeIvfIndex
  * (celled corpus partitioned by cell) → readIvfIndex → query, asserting
  * (a) bit-equal results vs the in-memory index and (b) REAL partition
  * pruning — the probe scan's PartitionFilters restrict to the probed
  * cells, the property that makes the layout the 100 TB design.
  */
class SimilarityIndexPersistSpec extends SparkSpec {
  import spark.implicits._

  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  test("IVF index parquet round-trip: reloaded queries are bit-equal") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      Sink.writeIvfIndex(idx, dir)
      val loaded = Sink.readIvfIndex(spark, dir)
      assert(loaded.centroids.map(_.toSeq).toSeq
        === idx.centroids.map(_.toSeq).toSeq, "centroids survive verbatim")
      assert(loaded.celled.count() === idx.celled.count())
      // on-disk layout: one directory per cell that actually has vectors
      val cellDirs = new java.io.File(s"$dir/celled")
        .listFiles().filter(_.getName.startsWith("cell=")).map(_.getName)
      assert(cellDirs.nonEmpty && cellDirs.length <= 8)
      val mem = Similarity.ivfQuery(idx, qids, k = 10, nprobe = 4)
        .collect().toSeq
      val disk = Similarity.ivfQuery(loaded, qids, k = 10, nprobe = 4)
        .collect().toSeq
      assert(disk === mem, "reloaded index must reproduce the ranking")
      val pruned = Similarity.ivfQueryPruned(loaded, qids, k = 10, nprobe = 4)
        .collect().toSeq
      assert(pruned === mem, "static-pruned path must reproduce the ranking")
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("unknown query ids yield empty results on both query paths") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.buildIvfIndexExact(emb, nlist = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx3").toString
    try {
      Sink.writeIvfIndex(idx, dir)
      val loaded = Sink.readIvfIndex(spark, dir)
      val ghosts = Seq(-1L, 999999999L)
      assert(Similarity.ivfQuery(loaded, ghosts, k = 5).count() === 0L)
      // pruned path: empty probe union -> isin() over nothing -> empty,
      // no degenerate scan or exception
      assert(Similarity.ivfQueryPruned(loaded, ghosts, k = 5).count() === 0L)
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pruned probe scan reads only the probed cell partitions") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx2").toString
    try {
      Sink.writeIvfIndex(idx, dir)
      val loaded = Sink.readIvfIndex(spark, dir)
      // ONE query, nprobe=2: at most 2 of the nlist cells may be scanned
      val df = Similarity.ivfQueryPruned(loaded, Seq(0L), k = 10, nprobe = 2)
      val planStr = df.queryExecution.executedPlan.toString
      // the candidate scan must carry the static cell predicate as a
      // PARTITION filter (directory pruning), not a data filter
      assert(planStr.contains("PartitionFilters: [cell"),
        s"expected a partition filter on cell in:\n$planStr")
      val inList = "PartitionFilters: \\[cell#\\d+ IN \\(([^)]+)\\)".r
        .findFirstMatchIn(planStr)
      assert(inList.isDefined, s"expected cell IN (...) filter in:\n$planStr")
      val probedCount = inList.get.group(1).split(",").length
      assert(probedCount <= 2, s"probe must touch <= nprobe cells, saw $probedCount")
      val allCells = new java.io.File(s"$dir/celled")
        .listFiles().count(_.getName.startsWith("cell="))
      assert(allCells > probedCount,
        s"pruning must skip cells ($probedCount probed of $allCells on disk)")
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("LSH index parquet round-trip: pruned queries are bit-equal to the in-memory path") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.buildLshIndex(emb, nBits = 64, bands = 16, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    try {
      Sink.writeLshIndex(idx, dir)
      val loaded = Sink.readLshIndex(spark, dir)
      assert(loaded.planes.map(_.toSeq).toSeq
        === idx.planes.map(_.toSeq).toSeq, "hyperplanes survive verbatim")
      assert(loaded.bands === idx.bands)
      assert(loaded.signed.count() === idx.signed.count())
      // the postings table carries every (vector, band) posting
      assert(loaded.postings.count() === idx.signed.count() * idx.bands)
      val mem = Similarity.lshQuery(idx, qids, k = 10).collect().toSeq
      val disk = Similarity.lshQueryPruned(loaded, qids, k = 10)
        .collect().toSeq
      assert(disk === mem,
        "reloaded pruned path must reproduce the in-memory ranking")
      // unknown ids: empty probe set -> lit(false) partition filter ->
      // empty result, no degenerate scan or exception
      assert(Similarity.lshQueryPruned(loaded, Seq(-1L, 999999999L),
        k = 5).count() === 0L)
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pruned LSH probe scan reads only the probed bucket directories") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.buildLshIndex(emb, nBits = 64, bands = 16, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx2").toString
    try {
      Sink.writeLshIndex(idx, dir)
      val loaded = Sink.readLshIndex(spark, dir)
      // ONE query: it multi-probes ≤ bands × (1 + bits/band) = 80
      // (band, bucket) pairs of the 16 × 16 = 256 on disk
      val df = Similarity.lshQueryPruned(loaded, Seq(0L), k = 10)
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("PartitionFilters: ["),
        s"expected a static partition filter in:\n$planStr")
      assert("PartitionFilters: \\[[^\\]]*band".r
        .findFirstIn(planStr).isDefined,
        s"partition filter must constrain band in:\n$planStr")
      // receipt on actual I/O: the pruned scan lists at most the probed
      // pair count of directories, strictly fewer than exist on disk
      df.collect()
      val bandDirs = new java.io.File(s"$dir/postings")
        .listFiles().filter(_.getName.startsWith("band="))
      val allPairs = bandDirs.map(b =>
        b.listFiles().count(_.getName.startsWith("bucket="))).sum
      // AQE wraps subtrees in query stages — walk through them
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
        p.collect {
          case f: FileSourceScanExec => Seq(f)
          case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
          case q: QueryStageExec => scansOf(q.plan)
        }.flatten
      val scan = scansOf(df.queryExecution.executedPlan)
        .find(_.metadata.get("Location").exists(_.contains("postings")))
      assert(scan.isDefined, "postings scan must be a FileSourceScan")
      // the prune contract is on DIRECTORIES (the (band, bucket)
      // partitions), not files: index writes are n-way distributed so
      // a bucket dir may hold several files — selectedPartitions is
      // the partition count the static predicate let through
      val dirsRead = scan.get.selectedPartitions.partitionCount
      assert(dirsRead <= 80,
        s"probe must read <= 80 bucket dirs, read $dirsRead")
      assert(dirsRead < allPairs,
        s"pruning must skip buckets ($dirsRead read of $allPairs on disk)")
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("IVF-PQ index round-trip: bit-equal ranking, partition AND column pruning") {
    val emb = Tables.embeddings(spark, sf)
    // iters = 3 matches IndexCache.ivfExact's default, so the in-memory
    // ivfPqQuery below trains the IDENTICAL coarse quantizer
    val idx = Similarity.buildIvfIndexExact(emb, nlist = 8, iters = 3)
    val quant = graft.operators.Clustering.quantized(emb)
    val pqCents = Similarity.pqTrain(quant, m = 8, k = 16, iters = 2)
    val codes = Similarity.pqEncode(quant, pqCents)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    try {
      Sink.writeIvfPqIndex(idx, pqCents, codes, dir)
      val (loaded, loadedCents) = Sink.readIvfPqIndex(spark, dir)
      assert(loadedCents.map(_.map(_.toSeq).toSeq).toSeq ===
        pqCents.map(_.map(_.toSeq).toSeq).toSeq, "codebooks survive verbatim")
      // the in-memory composed query on the same corpus/codebook params
      val mem = Similarity.ivfPqQuery(emb, qids, nlist = 8, nprobe = 4,
        kCodes = 16, rerank = 32).collect().toSeq
      val disk = Similarity.ivfPqQueryPruned(loaded, loadedCents, emb, qids,
        nprobe = 4, rerank = 32).collect().toSeq
      assert(disk === mem,
        "persisted IVF-PQ path must reproduce the in-memory ranking")
      // plan receipts: the ADC candidate scan carries the static cell
      // partition filter AND projects codes without unit (column pruning
      // = the full-width vectors stay on disk for non-shortlist rows)
      val df = Similarity.ivfPqQueryPruned(loaded, loadedCents, emb,
        Seq(0L), nprobe = 2, rerank = 16)
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("PartitionFilters: [cell"),
        s"expected a static cell partition filter in:\n$planStr")
      val adcScan = "ReadSchema: [^\\n]*codes[^\\n]*".r
        .findAllIn(planStr).toSeq
      assert(adcScan.nonEmpty, s"expected a codes scan in:\n$planStr")
      assert(adcScan.exists(!_.contains("unit")),
        s"ADC scan must NOT read unit (column pruning), saw:\n$adcScan")
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
