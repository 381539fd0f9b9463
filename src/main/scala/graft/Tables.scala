package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (see /root/repo/TESTDATA.md).
  *
  * All engine code reads through here so that source-level concerns (the
  * nanosecond-timestamp workaround, future partition/bucket layout) live in
  * one place. At 100 TB these become real table definitions (catalog +
  * partitioned layout); the API — `(spark, sfDir) => DataFrame` — stays.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `events.parquet` has shipped with two physical types for `ts` across
    * corpus generations, so the loader adapts to the file's schema:
    *   - TIMESTAMP(NANOS): Spark's parquet reader rejects it outright
    *     ([PARQUET_TYPE_ILLEGAL]); read nanos as long and truncate to
    *     microseconds — integer division floors (all epochs here are
    *     positive), which matches DuckDB's ns→us truncation exactly;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark infers
    *     TIMESTAMP_NTZ; cast to TimestampType so every downstream consumer
    *     (watermarks, epoch arithmetic, parquet dumps the oracle compares)
    *     sees the same type the nanos path produced. The NTZ→Timestamp
    *     cast interprets the naive value in the SESSION zone, so that zone
    *     is pinned to UTC here (not left to the builder) — the file's
    *     naive micros are UTC by the corpus contract, and an unpinned
    *     non-UTC session would silently shift every event timestamp.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/` — the latter is double division and loses
        // microsecond precision at 2024-epoch nanosecond magnitudes (~1.7e18)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
    }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
