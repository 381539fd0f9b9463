package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MqttFunctions
import graft.model.Envelope
import graft.schema.{Catalog => SchemaCatalog}

/** First-match message routing (operator A3,
  * `/root/reference/internal/router/router.go:344-363`) plus the multi-table
  * fan-out sink shape (A9, router.go:222-244), Spark-first.
  *
  * The reference dispatches each message to the FIRST route whose MQTT filter
  * matches; unmatched messages fall through to passthrough capture in
  * `iot_raw` (router.go:392-399). Route order is therefore semantic. Two
  * encodings are provided:
  *
  *   - `routeName`: a single `CASE WHEN` chain over the compiled filter
  *     regexes. CaseWhen evaluates branches in order, so first-match comes
  *     for free, in one scan, fully codegen'd — the preferred shape for
  *     analytics and for a single-pass tagged fan-out at scale (one shuffle-
  *     free pass instead of N filtered scans).
  *   - `branchPredicate(i)`: the explicit AND-NOT chain (matches fᵢ and none
  *     of f₀..fᵢ₋₁) for building independent per-route DataFrames — the
  *     shape used when each route writes to a different sink (each branch is
  *     a separate plan; the shared scan is reused via cache or the sink's
  *     own foreachBatch).
  *
  * Queue-full drop semantics (router.go:354-355) are deliberately NOT
  * reproduced — Spark back-pressures instead of dropping (SURVEY.md §4).
  */
/** A route. `emits` is the multi-RECORD fan-out contract
  * (router.go:291-341, examples/multi_table.lua:30): when non-empty, one
  * matched message emits 0..N records to DIFFERENT tables — each emit is
  * `(target table, transform)` applied to the route's branch, and the
  * per-emit transform's own predicate decides whether a given message
  * produces that record. `transform`/`table` are ignored when `emits` is
  * set (they are the 1-table special case).
  */
final case class Route(
    name: String,
    filter: String,
    table: String = Router.DefaultTable,
    transform: Option[DataFrame => DataFrame] = None,
    emits: Seq[(String, DataFrame => DataFrame)] = Nil)

final class Router(
    val routes: Seq[Route],
    catalog: SchemaCatalog = SchemaCatalog(Map.empty),
    strictTypes: Boolean = false) {
  require(routes.map(_.name).distinct.length == routes.length,
    "route names must be unique")

  private def matches(r: Route): Column =
    MqttFunctions.topicMatchesCol(r.filter, col("topic"))

  /** First-match AND-NOT predicate for route i (router.go:346-357). */
  def branchPredicate(i: Int): Column =
    routes.take(i).foldLeft(matches(routes(i)))((acc, prior) =>
      acc && !matches(prior))

  /** Name of the first matching route, else null — one ordered CASE WHEN. */
  def routeName: Column =
    routes.foldRight(lit(null).cast("string")) { (r, els) =>
      when(matches(r), lit(r.name)).otherwise(els)
    }

  /** Target table of the first matching route; unmatched → iot_raw. */
  def targetTable: Column =
    routes.foldRight(lit(Router.RawTable)) { (r, els) =>
      when(matches(r), lit(r.table)).otherwise(els)
    }

  /** Tag every message with its winning route in a single pass. */
  def tag(messages: DataFrame): DataFrame =
    messages
      .withColumn("route", routeName)
      .withColumn("target_table", targetTable)

  /** Per-route branch DataFrames (transform applied; passthrough when the
    * route declares none — router.go:205-213), plus the unmatched
    * passthrough branch keyed by route name "".
    */
  def branches(messages: DataFrame): Map[String, DataFrame] = {
    val routed = routes.zipWithIndex.flatMap { case (r, i) =>
      val branch = messages.filter(branchPredicate(i))
      if (r.emits.nonEmpty)
        // multi-record route: one branch entry per emitted table
        r.emits.map { case (tbl, fn) => s"${r.name}#$tbl" -> fn(branch) }
      else {
        val out = r.transform match {
          case Some(t) => t(branch)
          case None    => Envelope.passthrough(branch)
        }
        Seq(r.name -> out)
      }
    }.toMap
    val unmatched = messages.filter(!routes.indices
      .map(branchPredicate)
      .foldLeft(lit(false))(_ || _))
    routed + ("" -> Envelope.passthrough(unmatched))
  }

  /** Multi-table fan-out (A9): group branch outputs by sink table, union
    * compatible branches, and validate against the declared catalog
    * closed-world (A8) — at PLAN time, the Spark analog of the reference's
    * per-record check (router.go:230-237): an undeclared emitted column
    * fails the whole branch before anything runs.
    */
  def fanOut(messages: DataFrame): Map[String, DataFrame] = {
    // (table, output) contributions — a single-table route contributes
    // once; a multi-record route contributes one output per emit, so one
    // message can land records in N tables (the Lua parseRecords contract)
    val contribs = routes.zipWithIndex.flatMap { case (r, i) =>
      val branch = messages.filter(branchPredicate(i))
      if (r.emits.nonEmpty)
        r.emits.map { case (tbl, fn) => tbl -> fn(branch) }
      else
        Seq(r.table ->
          r.transform.map(_(branch)).getOrElse(Envelope.passthrough(branch)))
    }
    val byTable = contribs
      .groupBy(_._1)
      .map { case (table, dfs) =>
        table -> dfs.map(_._2).reduce(_ unionByName _)
      }
    byTable.foreach { case (table, df) =>
      // strictTypes additionally checks declared SQL type vs emitted Spark
      // type (Catalog.typeCompatible) — still a plan-build check, zero
      // runtime cost; presence-only is the reference-parity default
      val checked =
        if (strictTypes) catalog.validateTyped(table, df.schema)
        else catalog.validate(table, df.columns)
      checked match {
        case Left(err) => throw new IllegalArgumentException(
          s"schema validation failed for table $table: $err")
        case Right(()) =>
      }
    }
    val unmatched = Envelope.passthrough(messages.filter(!routes.indices
      .map(branchPredicate)
      .foldLeft(lit(false))(_ || _)))
    // a route may legitimately target iot_raw; its slice and the unmatched
    // passthrough both land there (reference: dynamic per-record INSERTs
    // into one table — allowMissingColumns mirrors the dynamic row shapes)
    byTable.get(Router.RawTable) match {
      case Some(routed) => byTable + (Router.RawTable ->
        routed.unionByName(unmatched, allowMissingColumns = true))
      case None => byTable + (Router.RawTable -> unmatched)
    }
  }
}

object Router {
  /** Defaults from router.go:111-119. */
  val DefaultTable = "iot_data"
  val RawTable = "iot_raw"

  def apply(routes: Route*): Router = new Router(routes)
}
