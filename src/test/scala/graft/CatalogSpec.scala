package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{Catalog, CatalogBuilder, TableSchema}

/** Ports the reference schema-system tests (schema_test.go). */
class CatalogSpec extends AnyFunSuite {

  val metrics: TableSchema = TableSchema("iot_metrics", Map(
    "time" -> "timestamptz",
    "device" -> "text",
    "value" -> "double precision"))

  test("DDL: sorted columns, deterministic text (schema_test.go:103-171)") {
    assert(metrics.createTableSql ===
      """CREATE TABLE IF NOT EXISTS iot_metrics (
        |  device text,
        |  time timestamptz,
        |  value double precision
        |);""".stripMargin)
  }

  test("DDL: empty schema yields empty string (schema_test.go:166-171)") {
    assert(Catalog(Map.empty).generateSql === "")
  }

  test("DDL: tables sorted (schema.go:113-134)") {
    val cat = CatalogBuilder(
      TableSchema("zzz", Map("a" -> "int")),
      TableSchema("aaa", Map("b" -> "text")))
    val sql = cat.generateSql
    assert(sql.indexOf("aaa") < sql.indexOf("zzz"))
    assert(sql.contains("CREATE TABLE IF NOT EXISTS aaa"))
  }

  test("merge: disjoint tables union (schema_test.go:173-253)") {
    val a = CatalogBuilder(TableSchema("t1", Map("a" -> "int")))
    val b = CatalogBuilder(TableSchema("t2", Map("b" -> "text")))
    val m = a.merge(b)
    assert(m.tables.keySet === Set("t1", "t2"))
  }

  test("merge: same table unions columns, first wins conflicts (schema.go:164-197)") {
    val first = CatalogBuilder(TableSchema("t", Map("a" -> "int", "c" -> "text")))
    val second = CatalogBuilder(TableSchema("t", Map("a" -> "bigint", "b" -> "text")))
    val m = first.merge(second)
    assert(m.tables("t").columns === Map("a" -> "int", "b" -> "text", "c" -> "text"))
  }

  test("validate: subset ok, undeclared column rejected, empty ok (schema_test.go:255-307)") {
    assert(metrics.validateRecord(Seq("time", "device")).isRight)
    assert(metrics.validateRecord(Nil).isRight)
    assert(metrics.validateRecord(Seq("time", "bogus")).isLeft)
  }

  test("no declared schema means no validation (schema.go:38-41)") {
    assert(Catalog(Map.empty).validate("whatever", Seq("x", "y")).isRight)
  }

  test("strict mode: declared SQL type vs emitted Spark type at plan-build") {
    import org.apache.spark.sql.types._
    val t = TableSchema("m", Map(
      "time" -> "timestamptz", "device" -> "text", "value" -> "double precision",
      "n" -> "bigint", "flags" -> "jsonb", "ok" -> "boolean"))
    def f(n: String, dt: DataType) = StructField(n, dt)
    // exact matches accept
    assert(t.validateRecordTyped(Seq(
      f("time", TimestampType), f("device", StringType),
      f("value", DoubleType), f("n", LongType), f("ok", BooleanType))).isRight)
    // lossless widenings + NTZ + nested-into-jsonb accept
    assert(t.validateRecordTyped(Seq(
      f("time", TimestampNTZType),                 // sink casts in UTC
      f("n", IntegerType),                         // int -> bigint
      f("value", IntegerType),                     // int -> double
      f("flags", MapType(StringType, StringType)), // marshaled to jsonb
      f("flags", StringType))).isRight)            // pre-marshaled json
    // type mismatches reject, with the declared/emitted pair in the error
    val bad = t.validateRecordTyped(Seq(f("n", StringType)))
    assert(bad.isLeft && bad.swap.exists(e =>
      e.contains("bigint") && e.contains("string")))
    assert(t.validateRecordTyped(Seq(f("n", DoubleType))).isLeft)   // narrowing
    assert(t.validateRecordTyped(Seq(f("value", LongType))).isLeft) // lossy
    assert(t.validateRecordTyped(Seq(
      f("device", new StructType().add("x", StringType)))).isLeft)
    // presence violation still reported first (reference-parity message)
    assert(t.validateRecordTyped(Seq(f("bogus", StringType))).swap
      .exists(_.contains("not defined")))
    // catalog plumbing: undeclared table still skips validation
    val cat = CatalogBuilder(t)
    assert(cat.validateTyped("m",
      StructType(Seq(f("n", LongType)))).isRight)
    assert(cat.validateTyped("m",
      StructType(Seq(f("n", StringType)))).isLeft)
    assert(cat.validateTyped("undeclared",
      StructType(Seq(f("anything", BinaryType)))).isRight)
  }

  test("identifier regex (router.go:77, storage_test.go:7-126)") {
    assert(Catalog.validIdentifier("sensor_data_2"))
    assert(!Catalog.validIdentifier("bad-name"))
    assert(!Catalog.validIdentifier("bad name"))
    assert(!Catalog.validIdentifier("t;DROP TABLE users;"))
    assert(!Catalog.validIdentifier("a.b"))
    assert(!Catalog.validIdentifier("$x"))
    intercept[IllegalArgumentException] {
      TableSchema("ok", Map("bad col" -> "int"))
    }
  }
}
