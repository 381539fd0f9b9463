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

  test("date-partitioned write + retention drop (C5/C6)") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = Seq(
      ("2024-01-01 10:00:00", "a"),
      ("2024-01-15 11:00:00", "b"),
      ("2024-02-01 12:00:00", "c"))
      .toDF("time", "v")
      .withColumn("time", col("time").cast("timestamp"))
    Sink.writePartitionedByDate(df, dir)
    val dropped = Sink.applyRetention(dir, "2024-01-10")
    assert(dropped === Seq("2024-01-01"))
    val remaining = spark.read.parquet(dir).select("v").as[String]
      .collect().toSet
    assert(remaining === Set("b", "c"))
    // partition pruning: a date predicate should prune to one partition
    val pruned = spark.read.parquet(dir).filter(col("date") === "2024-01-15")
    assert(pruned.count() === 1)
  }
}
