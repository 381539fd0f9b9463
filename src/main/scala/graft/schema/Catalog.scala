package graft.schema

import org.apache.spark.sql.types._

/** The reference's schema system (`/root/reference/internal/schema/schema.go`)
  * as a `StructType`-backed catalog.
  *
  * Reference semantics preserved:
  *   - declaration is optional; an undeclared table means no validation
  *     (schema.go:38-41);
  *   - validation is presence-only and closed-world — every emitted column
  *     must be declared, missing declared columns are fine, types are never
  *     checked (schema.go:200-207);
  *   - identifiers restricted to `^[A-Za-z0-9_]+$` (schema.go:24, router.go:77);
  *   - multi-script merge = union of tables, first-wins on column conflicts
  *     (schema.go:164-197);
  *   - DDL output is deterministic: sorted tables, sorted columns
  *     (schema.go:113-161).
  */
object Catalog {
  val IdentifierRe = "^[A-Za-z0-9_]+$".r

  def validIdentifier(s: String): Boolean =
    IdentifierRe.pattern.matcher(s).matches()

  /** Sink-side SQL type strings observed in the reference (SURVEY.md §1.2)
    * mapped to Spark types. Unknown types land as StringType (the reference
    * never checks types, so this is a permissive superset).
    */
  def sqlTypeToSpark(t: String): DataType = t.trim.toLowerCase match {
    case "timestamptz" | "timestamp"        => TimestampType
    case "text" | "jsonb" | "json"          => StringType
    case "double precision" | "double"      => DoubleType
    case "bigint" | "bigserial"             => LongType
    case "int" | "integer"                  => IntegerType
    case "boolean" | "bool"                 => BooleanType
    case _                                  => StringType
  }

  /** STRICT-mode type affinity (beyond the reference — schema.go never
    * checks types): may a column emitted with Spark type `emitted` land in
    * a sink column declared as SQL type `declared`?
    *
    *   - exact Spark-type match after [[sqlTypeToSpark]] mapping;
    *   - lossless widenings: int → bigint, int/float → double precision;
    *   - timestamptz accepts TIMESTAMP_NTZ (the sink casts in the pinned
    *     UTC session zone — the [[graft.Tables.events]] contract);
    *   - jsonb/json accept string AND map/array/struct (the engine
    *     JSON-marshals nested values at the sink, storage.go:118-128);
    *   - unknown declared types map to text (permissive superset, same as
    *     [[sqlTypeToSpark]]) and therefore accept only strings.
    */
  def typeCompatible(declared: String, emitted: DataType): Boolean =
    declared.trim.toLowerCase match {
      case "jsonb" | "json" => emitted match {
        case StringType | _: MapType | _: ArrayType | _: StructType => true
        case _                                                      => false
      }
      case d => (sqlTypeToSpark(d), emitted) match {
        case (t, e) if t == e                       => true
        case (LongType, IntegerType)                => true
        case (DoubleType, FloatType | IntegerType)  => true
        case (TimestampType, TimestampNTZType)      => true
        case _                                      => false
      }
    }

  def sparkTypeToSql(t: DataType): String = t match {
    case TimestampType       => "timestamptz"
    case StringType          => "text"
    case DoubleType          => "double precision"
    case LongType            => "bigint"
    case IntegerType         => "int"
    case BooleanType         => "boolean"
    case _: MapType          => "jsonb"
    case _: ArrayType        => "jsonb"
    case _: StructType       => "jsonb"
    case other               => other.sql.toLowerCase
  }
}

/** One declared sink table: column name → SQL type string (schema.go:18-21). */
final case class TableSchema(name: String, columns: Map[String, String]) {
  require(Catalog.validIdentifier(name), s"invalid table identifier: $name")
  columns.keys.foreach(c =>
    require(Catalog.validIdentifier(c), s"invalid column identifier: $c"))

  /** Closed-world presence check (schema.go:200-207): reject any emitted
    * column not declared for this table; absent declared columns are fine.
    */
  def validateRecord(emitted: Iterable[String]): Either[String, Unit] = {
    emitted.find(c => !columns.contains(c)) match {
      case Some(bad) => Left(s"column $bad not defined in schema for table $name")
      case None      => Right(())
    }
  }

  /** Opt-in STRICT validation — presence (reference parity) first, then
    * declared-SQL-type vs emitted-Spark-type per column
    * ([[Catalog.typeCompatible]]). Runs at plan-build like
    * [[validateRecord]], so the stronger check costs nothing at runtime;
    * it is strictly better than the reference, which never checks types
    * (schema.go:200-207 checks key presence only).
    */
  def validateRecordTyped(emitted: Seq[StructField]): Either[String, Unit] =
    validateRecord(emitted.map(_.name)).flatMap { _ =>
      emitted.find(f => !Catalog.typeCompatible(columns(f.name), f.dataType)) match {
        case Some(bad) => Left(
          s"column ${bad.name} of table $name declared '${columns(bad.name)}' " +
            s"but emitted ${bad.dataType.simpleString}")
        case None => Right(())
      }
    }

  /** Deterministic `CREATE TABLE IF NOT EXISTS` with sorted columns
    * (schema.go:137-161; golden expectations schema_test.go:103-171).
    */
  def createTableSql: String = {
    val cols = columns.keys.toSeq.sorted
    val body = cols.zipWithIndex.map { case (c, i) =>
      s"  $c ${columns(c)}" + (if (i < cols.length - 1) "," else "")
    }.mkString("\n")
    s"CREATE TABLE IF NOT EXISTS $name (\n$body\n);"
  }

  def toStructType: StructType =
    StructType(columns.keys.toSeq.sorted.map(c =>
      StructField(c, Catalog.sqlTypeToSpark(columns(c)))))
}

/** A set of declared tables; the engine-wide catalog (schema.go:13-16). */
final case class Catalog(tables: Map[String, TableSchema]) {

  /** Union of tables; on a shared table, union of columns with this catalog's
    * (the "first" one's) type winning conflicts (schema.go:164-197).
    */
  def merge(other: Catalog): Catalog = {
    val merged = other.tables.foldLeft(tables) { case (acc, (name, theirs)) =>
      acc.get(name) match {
        case None       => acc + (name -> theirs)
        case Some(mine) =>
          acc + (name -> mine.copy(columns = theirs.columns ++ mine.columns))
      }
    }
    Catalog(merged)
  }

  /** No schema declared for a table ⇒ no validation (schema.go:38-41). */
  def validate(table: String, emitted: Iterable[String]): Either[String, Unit] =
    tables.get(table).map(_.validateRecord(emitted)).getOrElse(Right(()))

  /** Strict twin of [[validate]]: presence + type affinity against the
    * emitted StructType (see [[TableSchema.validateRecordTyped]]);
    * undeclared tables still skip validation (reference parity).
    */
  def validateTyped(table: String, emitted: StructType): Either[String, Unit] =
    tables.get(table).map(_.validateRecordTyped(emitted.fields.toSeq))
      .getOrElse(Right(()))

  /** Sorted, deterministic DDL for every table (schema.go:113-134). */
  def generateSql: String =
    tables.keys.toSeq.sorted.map(t => tables(t).createTableSql)
      .mkString("\n\n")
}

object CatalogBuilder {
  def apply(tables: TableSchema*): Catalog =
    Catalog(tables.map(t => t.name -> t).toMap)

  def fromStructType(name: String, st: StructType): TableSchema =
    TableSchema(name,
      st.fields.map(f => f.name -> Catalog.sparkTypeToSql(f.dataType)).toMap)
}
