package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Driver-side reader for TINY parquet METADATA tables (index commit
  * records, corpus constants, centroid/codebook tables, ledgers —
  * never data).
  *
  * Why it exists (r17 verdict #1): every `readTextIndex`/`readIvfIndex`
  * call paid 2–4 driver `collect()` jobs on parquet tables of a few
  * rows — at the local ~50–90 ms/job floor those collects, recurring
  * ~5× inside each lifecycle query, dominated the bench tail. A
  * scheduler round-trip to launch one task that reads one 4 KB footer
  * is pure overhead at EVERY scale: these tables are metadata (nlist
  * rows, one commit record per batch), and metadata belongs to the
  * driver exactly like a table format's manifest files. Reading them
  * in-process removes the job without touching the on-disk format —
  * the same bytes, the same visibility rules, zero Spark jobs.
  *
  * Scope guard: callers must only point this at tables that are tiny
  * BY CONSTRUCTION (bounded by nlist / m·k / batch count — never by
  * corpus size). Data tables (postings, celled, tombstone ID lists)
  * keep their distributed reads.
  *
  * Supported schema: flat rows of INT32 / INT64 / DOUBLE / FLOAT /
  * BOOLEAN / BINARY(string) plus one-level LIST of those (Spark's
  * 3-level list layout) — everything the index meta layouts use.
  * Hive-style partition directories (`k=v`) surface as LONG columns
  * when numeric, STRING otherwise, mirroring how the former
  * `spark.read.parquet(...).select(col("batch_id").cast("long"))`
  * call sites consumed them.
  */
private[graft] object TinyParquet {

  /** One decoded row: field name → Long | Int | Double | Float |
    * Boolean | String | Array[Byte] | Seq[Any] | null.
    */
  type Row = Map[String, Any]

  /** Every row of every `*.parquet` file under `dir` (recursive),
    * partition-directory columns included. Empty when the directory is
    * missing or holds no parquet files. File visit order is
    * path-sorted for determinism; callers needing a row order sort by
    * key columns (the former `.orderBy(...).collect()` contract).
    */
  def readDir(conf: Configuration, dir: String): Seq[Row] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val files = collection.mutable.ArrayBuffer.empty[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val p = it.next().getPath
      val n = p.getName
      if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        files += p
    }
    val qualifiedRoot = fs.makeQualified(root)
    files.sortBy(_.toString).iterator.flatMap { f =>
      val partCols = partitionValues(qualifiedRoot, fs.makeQualified(f))
      readFile(conf, f).map(_ ++ partCols)
    }.toSeq
  }

  /** Hive-style `k=v` path segments between `root` and `file`. */
  private def partitionValues(root: Path, file: Path): Map[String, Any] = {
    val rootStr = root.toString
    val rel = file.getParent.toString.stripPrefix(rootStr).stripPrefix("/")
    if (rel.isEmpty) Map.empty
    else rel.split('/').iterator
      .filter(_.contains('='))
      .map { seg =>
        val Array(k, v) = seg.split("=", 2)
        val value: Any =
          if (v.nonEmpty && v.matches("-?\\d+")) v.toLong else v
        k -> value
      }.toMap
  }

  private def readFile(conf: Configuration, file: Path): Seq[Row] = {
    val reader: ParquetReader[Group] = ParquetReader
      .builder(new GroupReadSupport(), file)
      .withConf(conf)
      .build()
    try {
      val rows = collection.mutable.ArrayBuffer.empty[Row]
      var g = reader.read()
      while (g != null) {
        rows += groupToRow(g)
        g = reader.read()
      }
      rows.toSeq
    } finally reader.close()
  }

  private def groupToRow(g: Group): Row = {
    val schema = g.getType
    schema.getFields.asScala.zipWithIndex.map { case (f, i) =>
      val v: Any =
        if (g.getFieldRepetitionCount(i) == 0) null
        else if (f.isPrimitive) primitive(g, i, 0, f.asPrimitiveType())
        else listValues(g.getGroup(i, 0), f.getName)
      f.getName -> v
    }.toMap
  }

  /** Spark's 3-level list: group (LIST) { repeated group list
    * { <primitive> element } }.
    */
  private def listValues(lg: Group, name: String): Seq[Any] = {
    require(lg.getType.getFieldCount == 1 &&
      !lg.getType.getType(0).isPrimitive,
      s"TinyParquet: field '$name' is not a standard LIST group")
    val n = lg.getFieldRepetitionCount(0)
    (0 until n).map { j =>
      val eg = lg.getGroup(0, j)
      require(eg.getType.getFieldCount == 1 &&
        eg.getType.getType(0).isPrimitive,
        s"TinyParquet: field '$name' has a nested non-primitive element")
      if (eg.getFieldRepetitionCount(0) == 0) null
      else primitive(eg, 0, 0, eg.getType.getType(0).asPrimitiveType())
    }
  }

  private def primitive(
      g: Group, fieldIdx: Int, repIdx: Int, t: PrimitiveType): Any =
    t.getPrimitiveTypeName match {
      case INT64 => g.getLong(fieldIdx, repIdx)
      case INT32 => g.getInteger(fieldIdx, repIdx)
      case DOUBLE => g.getDouble(fieldIdx, repIdx)
      case FLOAT => g.getFloat(fieldIdx, repIdx)
      case BOOLEAN => g.getBoolean(fieldIdx, repIdx)
      case BINARY | FIXED_LEN_BYTE_ARRAY =>
        if (t.getLogicalTypeAnnotation ==
            LogicalTypeAnnotation.stringType())
          g.getBinary(fieldIdx, repIdx).toStringUsingUTF8
        else g.getBinary(fieldIdx, repIdx).getBytes
      case other =>
        throw new IllegalArgumentException(
          s"TinyParquet: unsupported primitive type $other " +
            s"(field ${t.getName})")
    }

  // ---- typed accessors (call-site sugar; metadata never carries
  // ---- nulls in these fields, so a miss is a caller bug and throws)

  def long(r: Row, name: String): Long = r(name) match {
    case l: Long => l
    case i: Int => i.toLong
    case other => throw new IllegalArgumentException(
      s"TinyParquet: field '$name' is not integral: $other")
  }

  def int(r: Row, name: String): Int = long(r, name).toInt

  def string(r: Row, name: String): String = r(name).asInstanceOf[String]

  def doubles(r: Row, name: String): Array[Double] =
    r(name).asInstanceOf[Seq[Any]].iterator
      .map(_.asInstanceOf[Double]).toArray

  def longs(r: Row, name: String): Array[Long] =
    r(name).asInstanceOf[Seq[Any]].iterator
      .map(_.asInstanceOf[Long]).toArray
}
