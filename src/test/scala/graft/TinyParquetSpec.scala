package graft

import org.apache.spark.sql.functions._

import graft.sinks.TinyParquet

/** The r18 driver-side metadata reader must return EXACTLY what
  * `spark.read.parquet(...).collect()` returned from the same layouts —
  * every index-read call site swapped a collect job for it, so parity
  * here is the whole correctness argument. Layouts are produced by the
  * real writers (never hand-built files): primitives, arrays of
  * double/long, a string column, and Hive-partitioned commit records.
  */
class TinyParquetSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmp(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_tinyparquet_$name").toFile
    d.deleteOnExit()
    d.toString
  }

  test("flat primitives round-trip (text-index meta shape)") {
    val dir = tmp("meta")
    Seq((42L, 1234L, 16)).toDF("n_docs", "total_tokens", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val rows = TinyParquet.readDir(conf, dir)
    assert(rows.size == 1)
    assert(TinyParquet.long(rows.head, "n_docs") == 42L)
    assert(TinyParquet.long(rows.head, "total_tokens") == 1234L)
    assert(TinyParquet.int(rows.head, "buckets") == 16)
  }

  test("array<double> + array<long> + string round-trip (centroid shapes)") {
    val dir = tmp("cents")
    Seq(
      (1, Seq(0.5, -0.25, 3.0), Seq(7L, -8L), "unit"),
      (0, Seq(1.0, 2.0, -0.125), Seq(0L, 42L), "unit"))
      .toDF("cell", "centroid", "qcentroid", "space")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val rows = TinyParquet.readDir(conf, dir)
      .sortBy(TinyParquet.long(_, "cell"))
    assert(rows.map(TinyParquet.long(_, "cell")) == Seq(0L, 1L))
    assert(TinyParquet.doubles(rows(0), "centroid").toSeq ==
      Seq(1.0, 2.0, -0.125))
    assert(TinyParquet.doubles(rows(1), "centroid").toSeq ==
      Seq(0.5, -0.25, 3.0))
    assert(TinyParquet.longs(rows(0), "qcentroid").toSeq == Seq(0L, 42L))
    assert(TinyParquet.string(rows.head, "space") == "unit")
  }

  test("partition-directory columns surface as LONG (commit records)") {
    val dir = tmp("commits")
    Seq((5L, 100L, 3L), (7L, 200L, 9L))
      .toDF("n_ids", "adj", "batch_id")
      .coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)
    val rows = TinyParquet.readDir(conf, dir)
      .sortBy(TinyParquet.long(_, "batch_id"))
    assert(rows.map(r => (TinyParquet.long(r, "batch_id"),
      TinyParquet.long(r, "n_ids"), TinyParquet.long(r, "adj"))) ==
      Seq((3L, 5L, 100L), (9L, 7L, 200L)))
  }

  test("missing directory reads as empty") {
    assert(TinyParquet.readDir(conf, "/tmp/graft_tinyparquet_nope").isEmpty)
  }

  test("parity with spark.read on a REAL persisted text-index meta") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val dir = tmp("realmeta")
    graft.sinks.Sink.writeTextIndex(docs, dir, buckets = 4)
    val viaSpark = spark.read.parquet(s"$dir/meta").head
    val viaTiny = TinyParquet.readDir(conf, s"$dir/meta").head
    assert(TinyParquet.long(viaTiny, "n_docs") == viaSpark.getLong(0))
    assert(TinyParquet.long(viaTiny, "total_tokens") == viaSpark.getLong(1))
    assert(TinyParquet.int(viaTiny, "buckets") == viaSpark.getInt(2))
  }
}
