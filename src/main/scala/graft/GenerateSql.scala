package graft

import graft.config.EngineConfig
import graft.operators.GenericTransform
import graft.schema.{Catalog, CatalogBuilder, TableSchema}

/** `hermod -sql` CLI parity (`/root/reference/cmd/hermod/main.go:202-237`):
  * load the TOML config, resolve each route's script to the schema it
  * declares, merge (first wins), and print the deterministic sorted DDL to
  * stdout — no broker, no database, no SparkSession.
  *
  * The reference reads the schema out of each Lua file
  * (`schema.LoadFromLuaScript`); here the Lua corpus is re-expressed as
  * registered transforms, so script names resolve against
  * [[scriptSchemas]], the catalog each re-expressed script declares.
  *
  *   sbt "runMain graft.GenerateSql path/to/config.toml"
  */
object GenerateSql {

  /** Script name → declared catalog, matching the reference examples:
    * `routing_transform.lua` declares `iot_metrics`
    * (examples/routing_transform.lua:3-12), `multi_table.lua` declares the
    * two sensor tables (examples/multi_table.lua:3-19), `transform.lua`
    * declares nothing (legacy 1→1 contract, no schema block).
    */
  val scriptSchemas: Map[String, Catalog] = Map(
    "routing_transform.lua" -> CatalogBuilder(
      TableSchema("iot_metrics", Map(
        "time" -> "timestamptz",
        "device" -> "text",
        "value" -> "double precision",
        "raw" -> "jsonb"))),
    "multi_table.lua" -> GenericTransform.multiTableCatalog,
    "transform.lua" -> Catalog(Map.empty))

  private def baseName(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  /** The merged DDL for a config, or the reference's no-schema banner
    * (main.go:228-231). Unknown scripts fail loudly, mirroring the
    * reference's load error (main.go:208-212).
    */
  def generate(cfg: EngineConfig): String = {
    val names = cfg.routes.map(_.script).filter(_.nonEmpty) ++
      Option(cfg.pipeline.luaScript).filter(_.nonEmpty).toSeq
    val schemas = names.map { n =>
      scriptSchemas.getOrElse(baseName(n),
        throw new IllegalArgumentException(
          s"failed to load schema from $n: unknown script"))
    }
    // first-wins merge, reference schema.Merge order (schema.go:164-197)
    val merged = schemas.foldLeft(Catalog(Map.empty))(_ merge _)
    val sql = merged.generateSql
    if (sql.isEmpty) "-- No schemas defined in Lua scripts" else sql
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("config.toml")
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    println(generate(EngineConfig.fromToml(text)))
  }
}
