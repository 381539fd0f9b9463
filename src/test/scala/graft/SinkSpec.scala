package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.Sink

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("insertSql: sorted columns, $n placeholders (storage.go:87-151)") {
    val Right((sql, values)) = Sink.insertSql("iot_data",
      Map("zeta" -> 1.5, "alpha" -> "x", "mid" -> true))
    assert(sql === "INSERT INTO iot_data (alpha, mid, zeta) VALUES ($1, $2, $3)")
    assert(values === Seq("x", true, 1.5))
  }

  test("insertSql: nested values JSON-marshaled (storage.go:118-128)") {
    val Right((_, values)) = Sink.insertSql("t",
      Map("j" -> Map("a" -> 1.0, "b" -> Seq("x", "y"))))
    assert(values === Seq("""{"a":1,"b":["x","y"]}"""))
  }

  test("insertSql: identifier validation rejects injection (storage_test.go:7-126)") {
    assert(Sink.insertSql("t; DROP TABLE users;", Map("a" -> 1)).isLeft)
    assert(Sink.insertSql("t", Map("bad-col" -> 1)).isLeft)
    assert(Sink.insertSql("t", Map.empty).isLeft)
    assert(Sink.insertSql("valid_table_2", Map("ok_col" -> 1)).isRight)
  }

  test("insertSql: non-finite doubles rejected, large doubles not clamped") {
    assert(Sink.insertSql("t", Map("v" -> Map("x" -> Double.NaN))).isLeft)
    val Right((_, values)) = Sink.insertSql("t", Map("j" -> Map("v" -> 1e20)))
    assert(values === Seq("""{"v":1.0E20}"""))
  }

  test("writeJdbc round-trips routed fan-out rows through a real database (A10)") {
    import java.sql.Timestamp
    import graft.model.Message
    import graft.operators.{Route, Router}
    val url = "jdbc:derby:memory:graft_sink_spec;create=true"
    val messages = Seq(
      Message("sensors/t1", """{"temperature": 20}""".getBytes("UTF-8"), 0, retain = false, new Timestamp(1000L)),
      Message("sensors/t2", """{"temperature": 21}""".getBytes("UTF-8"), 1, retain = false, new Timestamp(2000L)),
      Message("devices/d1", """{"value": 9}""".getBytes("UTF-8"), 0, retain = true, new Timestamp(3000L)),
      Message("other/x", "plain".getBytes("UTF-8"), 0, retain = false, new Timestamp(4000L)))
      .toDS().toDF()
    val r = new Router(Seq(
      Route("s", "sensors/#", table = "sensor_raw"),
      Route("d", "devices/#", table = "device_raw")))
    val out = r.fanOut(messages)
    // two routed tables + the raw fallthrough, all through the wire
    out.foreach { case (table, df) =>
      Sink.writeJdbc(df, url, table,
        org.apache.spark.sql.SaveMode.Overwrite)
    }
    val sensors = spark.read.jdbc(url, "sensor_raw", new java.util.Properties)
    assert(sensors.count() === 2)
    assert(sensors.columns.sorted.toSeq ===
      Seq("json", "qos", "raw", "retain", "time", "topic"))
    // Derby maps StringType to CLOB, and pushed-down CLOB=CHAR predicates
    // are unsupported there — compare client-side (production: pass
    // createTableColumnTypes in properties for VARCHAR columns)
    val rows = sensors.select("topic", "raw").as[(String, String)]
      .collect().toMap
    assert(rows.keySet === Set("sensors/t1", "sensors/t2"))
    assert(rows("sensors/t1") === """{"temperature": 20}""")
    assert(spark.read.jdbc(url, "device_raw", new java.util.Properties).count() === 1)
    assert(spark.read.jdbc(url, "iot_raw", new java.util.Properties).count() === 1)
  }

  test("writeJdbc refuses invalid identifiers before opening a connection") {
    val df = Seq((1, "x")).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Sink.writeJdbc(df, "jdbc:derby:memory:never;create=true", "t; DROP TABLE x;")
    }
    intercept[IllegalArgumentException] {
      Sink.writeJdbc(df.withColumnRenamed("a", "bad-col"),
        "jdbc:derby:memory:never;create=true", "t")
    }
  }

  test("jdbcFanOutBatch appends each micro-batch per table (streaming twin)") {
    import java.sql.Timestamp
    import graft.model.Message
    import graft.operators.{Route, Router}
    val url = "jdbc:derby:memory:graft_sink_stream;create=true"
    val r = new Router(Seq(Route("s", "sensors/#", table = "s_rows")))
    def batchOf(ts: Long) = Seq(
      Message("sensors/t1", "{}".getBytes("UTF-8"), 0, retain = false, new Timestamp(ts)))
      .toDS().toDF()
    // seed tables so Append mode has a target
    Sink.writeJdbc(graft.model.Envelope.passthrough(batchOf(0L)).limit(0),
      url, "s_rows", org.apache.spark.sql.SaveMode.Overwrite)
    Sink.writeJdbc(graft.model.Envelope.passthrough(batchOf(0L)).limit(0),
      url, "iot_raw", org.apache.spark.sql.SaveMode.Overwrite)
    val write = Sink.jdbcFanOutBatch(url, r.fanOut(_)) _
    write(batchOf(1000L), 0L)
    write(batchOf(2000L), 1L)
    assert(spark.read.jdbc(url, "s_rows", new java.util.Properties).count() === 2)
  }

  test("date-partitioned write + retention drop (C5/C6)") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = Seq(
      ("2024-01-01 10:00:00", "a"),
      ("2024-01-15 11:00:00", "b"),
      ("2024-02-01 12:00:00", "c"))
      .toDF("time", "v")
      .withColumn("time", col("time").cast("timestamp"))
    Sink.writePartitionedByDate(df, dir)
    // explicit file: URI — retention goes through the Hadoop FileSystem
    // API, the path an HDFS/S3A table takes at scale
    val dropped = Sink.applyRetention(spark, s"file:$dir", "2024-01-10")
    assert(dropped === Seq("2024-01-01"))
    assert(Sink.applyRetention(spark, s"$dir/nonexistent", "2024-01-10") === Nil)
    val remaining = spark.read.parquet(dir).select("v").as[String]
      .collect().toSet
    assert(remaining === Set("b", "c"))
    // partition pruning: a date predicate should prune to one partition
    val pruned = spark.read.parquet(dir).filter(col("date") === "2024-01-15")
    assert(pruned.count() === 1)
  }

  test("date predicate prunes partitions AT THE SCAN, not post-filter (C6)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = Files.createTempDirectory("graft-prune").toString
    val df = Seq(
      ("2024-01-01 10:00:00", "a"),
      ("2024-01-15 11:00:00", "b"),
      ("2024-02-01 12:00:00", "c"))
      .toDF("time", "v")
      .withColumn("time", col("time").cast("timestamp"))
    Sink.writePartitionedByDate(df, dir) // 3 date dirs, 1 file each
    val read = spark.read.parquet(dir).filter(col("date") === "2024-01-15")
    read.collect() // executes THIS queryExecution so scan metrics populate
    val scan = read.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    // the predicate must reach the scan as a partition filter...
    assert(scan.metadata("PartitionFilters").contains("date"),
      s"no partition filter in scan: ${scan.metadata}")
    // ...and only the matching partition's file may be listed/read
    assert(scan.metrics("numFiles").value === 1,
      s"scan read ${scan.metrics("numFiles").value} of 3 files — not pruned")
  }

  test("bucketed co-located join: zero exchange on the bucket key") {
    import graft.sinks.Sink
    // default warehouse dir (cwd/spark-warehouse, gitignored); tables
    // are dropped at the end so nothing persists between runs
    Sink.writeBucketed(Tables.orders(spark, sf), "b_orders",
      "o_orderkey", nBuckets = 4)
    Sink.writeBucketed(
      Tables.lineitem(spark, sf)
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", nBuckets = 4)
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), "o_orderkey")
    joined.count() // force AQE finalization
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed equi-join must not shuffle:\n$plan")
    // aggregation on the bucket key is exchange-free too
    val agg = spark.table("b_lineitem")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    agg.count()
    assert(!agg.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      "bucket-key aggregation must not shuffle")
    // correctness: same cardinality as the unbucketed join
    val expected = Tables.orders(spark, sf).join(
      Tables.lineitem(spark, sf),
      col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.count() === expected)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
  test("compact: many small files -> few sized files, data preserved") {
    import graft.sinks.Sink
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val inPath = s"$dir/small"
    val outPath = s"$dir/compacted"
    val df = Tables.lineitem(spark, sf).limit(2000)
    df.repartition(20).write.parquet(inPath)
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files(inPath).size === 20)
    Sink.compact(spark, inPath, outPath, targetBytes = 512L * 1024)
    assert(files(outPath).size < 20, "compaction must reduce file count")
    // content identical (same rows, any order)
    val a = spark.read.parquet(inPath).orderBy("l_orderkey", "l_linenumber")
      .collect().toSeq
    val b = spark.read.parquet(outPath).orderBy("l_orderkey", "l_linenumber")
      .collect().toSeq
    assert(a === b)
    // swap demonstration: rename compacted over the old dir
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(inPath), true)
    fs.rename(new org.apache.hadoop.fs.Path(outPath),
      new org.apache.hadoop.fs.Path(inPath))
    assert(spark.read.parquet(inPath).count() === 2000)
  }
}
