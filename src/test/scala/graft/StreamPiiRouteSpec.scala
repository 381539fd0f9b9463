package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.operators.Pii
import graft.streaming.StreamRoutes

/** The config-deployment and streaming layers composed with the PII
  * surface: a route whose transform — deployed from TOML alone, no
  * registry entry — scrubs emails/phones out of the payload BEFORE the
  * record lands anywhere. This is the shape a compliance team actually
  * ships: redaction lives in the ingestion config, applies to the live
  * stream, and the landed tables never contain the raw identifier.
  */
class StreamPiiRouteSpec extends SparkSpec {

  // Two escape layers sit between the Scala pattern and the regex engine:
  // TOML basic strings unescape \\ -> \, then Spark SQL single-quoted
  // literals do the same — so each regex backslash must appear 4× in the
  // TOML text
  private def sqlPat(p: String): String =
    p.replace("\\", "\\\\").replace("\\", "\\\\")

  private def piiToml: String =
    s"""[[routes]]
       |filter = "users/#"
       |select = ["time", "topic", "regexp_replace(regexp_replace(cast(payload as string), '${sqlPat(Pii.emailPattern)}', '<EMAIL>'), '${sqlPat(Pii.phonePattern)}', '<PHONE>') as scrubbed"]
       |table = "scrubbed_msgs"
       |""".stripMargin

  private def msgs = {
    import spark.implicits._
    Seq(
      graft.model.Message("users/1",
        "signup jane.doe@example.com ok".getBytes("UTF-8"),
        0, retain = false, Timestamp.valueOf("2026-01-01 00:00:00")),
      graft.model.Message("users/2",
        "call +1-555-0134 today".getBytes("UTF-8"),
        0, retain = false, Timestamp.valueOf("2026-01-01 00:00:01")),
      graft.model.Message("users/3",
        "nothing sensitive".getBytes("UTF-8"),
        0, retain = false, Timestamp.valueOf("2026-01-01 00:00:02"))
    ).toDF()
  }

  test("TOML-deployed scrub route redacts the live stream before landing") {
    val router = EngineConfig.fromToml(piiToml).buildRouter(Map.empty)

    // batch truth
    val batchRows = router.fanOut(msgs)("scrubbed_msgs")
      .orderBy(col("topic")).select("topic", "scrubbed")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(batchRows === Seq(
      ("users/1", "signup <EMAIL> ok"),
      ("users/2", "call <PHONE> today"),
      ("users/3", "nothing sensitive")))

    // the same config against a real streaming source
    val dir = Files.createTempDirectory("graft-pii-stream").toString
    msgs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(msgs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val landed = mutable.ArrayBuffer.empty[(String, String)]
    val writer = StreamRoutes.routedWriter(stream, router) { (table, df) =>
      if (table == "scrubbed_msgs")
        landed.synchronized {
          landed ++= df.select("topic", "scrubbed").collect()
            .map((r: Row) => (r.getString(0), r.getString(1)))
        }
    }
    val q = StreamRoutes.runOnce(writer)
    q.stop()
    assert(landed.sortBy(_._1).toSeq === batchRows,
      "streaming fan-out must land exactly the batch-scrubbed rows")
    // and nothing that landed carries raw PII
    landed.foreach { case (_, s) =>
      assert(!s.contains("@") && !s.contains("555-0134"), s)
    }
  }
}
