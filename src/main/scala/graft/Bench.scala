package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Time one thunk: (seconds, error). A failing query must surface in the
    * output, not silently time as ~0 and "improve" the total.
    */
  def timeQuery(fn: => Unit): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    val err =
      try { fn; None }
      catch {
        case e: Throwable => Some(
          e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").take(200))
      }
    ((System.nanoTime() - t0) / 1e9, err)
  }

  /** Minimal JSON string escape for the error payload. */
  def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up pass: JIT + janino codegen + parquet footers are per-JVM
    // one-time costs that otherwise land on whichever query runs first and
    // dominate its time (measured swings of 2-10×). The measured pass below
    // reports steady-state throughput — the quantity comparable round over
    // round and to a long-lived cluster.
    //
    // Execution is forced via queryExecution.toRdd.count(): a plain
    // df.count() plants a COUNT on top and lets the optimizer prune the
    // registered plan under it — in particular a left outer join whose
    // right side is unique-keyed gets ELIMINATED, so queries shaped
    // "per-row table LEFT JOIN per-key aggregate" (contamination,
    // repetition) were timed with their dominant branch never executing
    // (measured 0.2 s "cost" for a 2.6 s computation). toRdd executes the
    // registered plan exactly as Verify's parquet write does.
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.queries.foreach { case (_, fn) =>
      try force(fn(spark, sfDir)) catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> timeQuery { force(fn(spark, sfDir)) }
    }
    // 0.1 ms precision per query keeps the full line ~40% shorter — the
    // driver's tail buffer is ~4 KB and round 4's full line overflowed it.
    def fmt(sec: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(sec))
    val qs = results.map { case (k, (sec, _)) => s"\"" + k + "\":" + fmt(sec) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) =>
      s"\"" + k + "\":\"" + jsonEscape(e) + "\""
    }
    val errField =
      if (errs.isEmpty) "" else errs.mkString(",\"errors\":{", ",", "}")
    val total = results.values.map(_._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errField,"sf":"$sfDir"}""")
    // The driver keeps only the TAIL of sbt output; with 70+ per-query
    // entries the leading "metric":"total" prefix of the line above can be
    // truncated away (it was in rounds 3 and 4). Repeat the headline
    // numbers as a short trailing line so they always survive tail
    // capture — under a DISTINCT metric name so a by-metric consumer
    // cannot double-count the total.
    println(s"""{"metric":"total_tail","value":$total,"unit":"sec","nqueries":${results.size},"nerrors":${errs.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
