package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Message
import graft.schema.{Catalog, TableSchema}

/** One output record of a generic transform: an optional per-record sink
  * table override (absent/empty → the route's default table) and a dynamic
  * column map. The reference's `Record`
  * (`/root/reference/internal/router/router.go:33-37`).
  */
final case class GenericRecord(
    table: Option[String],
    columns: Map[String, String])

/** Operator A5's FULL contract — the escape hatch for user transforms that
  * are genuinely not expressible as column expressions: an arbitrary
  * row-level function `Message => 0..N records`, each record carrying its
  * own dynamic column map and optional per-record table override
  * (`/root/reference/internal/router/router.go:248-341`; behavioral spec
  * `internal/router/integration_test.go:151-283`).
  *
  * Everything the three example Lua scripts need stays on the
  * column-expression fast path ([[Transforms]] — codegen, pushdown,
  * pruning); this path trades those for generality, so its use is a
  * per-route opt-in, exactly like the reference's per-route script.
  *
  * Spark shape: one UDF `envelope → array<struct<table,columns>>`, then
  * `explode` — the 0..N fan-out is a generator, not a driver loop, so the
  * transform is embarrassingly parallel over partitions at any scale.
  *
  * Contract parity with `parseRecords` (router.go:291-341):
  *   - a record with no/empty `table` lands in the route's default table;
  *   - column names failing `^[A-Za-z0-9_]+$` are silently SKIPPED
  *     (router.go:330-333), not errors;
  *   - an empty result array is fine (message produces nothing);
  *   - values travel as strings (the reference funnels every Lua value
  *     through one dynamic channel the same way); [[fanOut]] casts them
  *     back per the declared catalog types, null on uncastable — and
  *     enforces the closed-world column check per RECORD at runtime
  *     (storage-side validateRecord parity, schema.go:200-207).
  */
object GenericTransform {

  /** Tagged dynamic-record frame: (table: string, columns: map<string,string>). */
  def apply(
      messages: DataFrame,
      defaultTable: String,
      f: Message => Seq[GenericRecord]): DataFrame = {
    require(Catalog.validIdentifier(defaultTable),
      s"invalid default table identifier: $defaultTable")
    val transform = udf {
      (topic: String, payload: Array[Byte], qos: Int, retain: Boolean,
          time: java.sql.Timestamp) =>
        f(Message(topic, payload, qos, retain, time)).map { r =>
          GenericOut(
            r.table.filter(_.nonEmpty).getOrElse(defaultTable),
            r.columns.filter { case (k, _) => Catalog.validIdentifier(k) })
        }
    }
    messages
      .select(explode(transform(
        col("topic"), col("payload"), col("qos"), col("retain"), col("time")))
        .as("rec"))
      .select(col("rec.table").as("table"), col("rec.columns").as("columns"))
  }

  /** UDF output row (needs a stable case class for the encoder). */
  final case class GenericOut(table: String, columns: Map[String, String])

  /** Split a tagged dynamic-record frame into one typed DataFrame per
    * DECLARED table: project the declared columns out of the map (sorted —
    * the reference's deterministic column order), cast each to its
    * declared type (`try_cast` semantics: uncastable → null, mirroring the
    * reference's never-type-checked inserts), and enforce the closed-world
    * presence check per record at runtime — an undeclared emitted column
    * fails the query like storage.validateRecord fails the insert.
    *
    * Undeclared TABLES are not validated at all (schema.go:38-41): their
    * rows stay accessible by filtering the tagged frame directly.
    */
  /** N consumers of the returned map each evaluate the transform
    * pipeline independently — Spark has no sound plan-level way to share
    * one computation across sibling subtrees of a single query (filters
    * push below any repartition once unused barrier columns are pruned,
    * so ReuseExchange never fires; this was measured, not assumed). When
    * the transform is expensive and several tables are consumed in one
    * job, persist the TAGGED frame first (bounded lifetime, caller owns
    * it) — the streaming fan-out sink does exactly that per micro-batch.
    */
  def fanOut(tagged: DataFrame, catalog: Catalog): Map[String, DataFrame] =
    catalog.tables.map { case (name, ts) =>
      name -> project(tagged.filter(col("table") === name), ts)
    }

  private def project(rows: DataFrame, ts: TableSchema): DataFrame = {
    val declared = ts.columns.keys.toSeq.sorted
    val undeclared = array_except(
      map_keys(col("columns")), typedLit(declared))
    // assert_true returns null when the predicate holds, so the coalesce
    // filter passes every valid row and THROWS on the first closed-world
    // violation; a filter (unlike an unused projected column) survives
    // column pruning
    val checked = rows.filter(coalesce(
      assert_true(size(undeclared) === 0,
        concat(lit("column "), array_join(undeclared, ","),
          lit(s" not defined in schema for table ${ts.name}"))),
      lit(true)))
    checked.select(declared.map { c =>
      cast(element_at(col("columns"), c), ts.columns(c)).as(c)
    }: _*)
  }

  /** Lenient string→declared-type cast (uncastable → null, never a crash —
    * ANSI mode would otherwise kill a scan on one bad dynamic value).
    */
  private def cast(c: Column, sqlType: String): Column =
    c.try_cast(Catalog.sqlTypeToSpark(sqlType))

  // ---------------------------------------------------- worked example

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** `examples/multi_table.lua` re-implemented through the GENERIC path —
    * arbitrary Scala instead of column expressions — used by the
    * `transform_generic_multi_table` query to hash-match the expression
    * version ([[Transforms.multiTable]]): same records, same fan-out,
    * different engine path.
    *
    * Deviation noted: `details` carries the original raw JSON string
    * (the reference re-marshals the parsed Lua table; byte-identical only
    * up to key order, and the raw string is the honest provenance).
    */
  def multiTableExample(msg: Message): Seq[GenericRecord] = {
    val raw = new String(Option(msg.payload).getOrElse(Array.empty), "UTF-8")
    val json =
      try Option(mapper.readTree(raw)) catch { case _: Exception => None }
    json match {
      case None => Seq.empty
      case Some(j) =>
        val sensorId = "sensors/([^/]+)".r.findFirstMatchIn(msg.topic)
          .map(_.group(1)).filter(_.nonEmpty).getOrElse("unknown")
        val ts = msg.time.toInstant.toString // RFC3339, msg.ts parity
        def num(field: String): Option[Double] =
          Option(j.get(field)).filterNot(_.isNull).map(_.asDouble())
        val reading =
          if (num("temperature").isDefined || num("humidity").isDefined)
            Seq(GenericRecord(Some("sensor_readings"), Map(
              "time" -> ts,
              "sensor_id" -> sensorId,
              "temperature" -> num("temperature").getOrElse(0.0).toString,
              "humidity" -> num("humidity").getOrElse(0.0).toString,
              "battery" -> num("battery").getOrElse(100.0).toString)))
          else Seq.empty
        val event =
          if (j.has("alert") && !j.get("alert").isNull)
            Seq(GenericRecord(Some("sensor_events"), Map(
              "time" -> ts,
              "sensor_id" -> sensorId,
              "event_type" -> "alert",
              "details" -> raw)))
          else Seq.empty
        reading ++ event
    }
  }

  /** The schema multi_table.lua declares (examples/multi_table.lua:3-19). */
  val multiTableCatalog: Catalog = graft.schema.CatalogBuilder(
    TableSchema("sensor_readings", Map(
      "time" -> "timestamptz", "sensor_id" -> "text",
      "temperature" -> "double precision", "humidity" -> "double precision",
      "battery" -> "double precision")),
    TableSchema("sensor_events", Map(
      "time" -> "timestamptz", "sensor_id" -> "text",
      "event_type" -> "text", "details" -> "jsonb")))
}
