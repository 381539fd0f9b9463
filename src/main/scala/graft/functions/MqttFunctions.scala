package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MQTT topic-filter matching, the reference engine's sole routing predicate.
  *
  * Semantics mirror `/root/reference/internal/router/router.go:422-448`
  * (spec-by-test `router_test.go:9-36`):
  *   - `+` matches exactly one level, which may be empty;
  *   - `#` matches the remainder of the topic **including the parent level**
  *     (`a/#` matches `a`), and is a wildcard only as the final segment;
  *   - wildcards must occupy a whole segment (`a+b` is literal);
  *   - a non-final `#` segment can only match via literal string equality.
  *
  * Spark-side the filter is compiled once (driver-side, per plan) to an
  * anchored regex evaluated with `rlike` — a codegen'd Catalyst expression,
  * so routing stays inside whole-stage codegen with no UDF on the hot path.
  * The regex dialect is restricted to constructs shared by Java regex and
  * RE2 (char classes, `(…)?`, backslash escapes — no \Q\E) so the identical
  * pattern string runs in the DuckDB oracle.
  */
object MqttFunctions {

  /** Pure reference-parity matcher (router.go:422-448). */
  def topicMatches(filter: String, topic: String): Boolean = {
    if (filter == topic || filter == "#") return true
    val fs = filter.split("/", -1)
    val ts = topic.split("/", -1)
    var i = 0
    while (i < fs.length) {
      if (i >= ts.length) return fs(i) == "#" && i == fs.length - 1
      fs(i) match {
        case "#" => return i == fs.length - 1
        case "+" => // single-level wildcard: any (possibly empty) segment
        case s   => if (s != ts(i)) return false
      }
      i += 1
    }
    ts.length == fs.length
  }

  private def escapeSegment(seg: String): String =
    seg.replaceAll("""([\\.\[\]{}()*+?^$|])""", """\\$1""")

  /** Compile an MQTT filter to an anchored regex with identical semantics. */
  def filterToRegex(filter: String): String = {
    if (filter == "#") return "^.*$"
    val segs = filter.split("/", -1)
    // A '#' anywhere but the last segment never wildcard-matches; only the
    // literal-equality fast path applies (router.go:423-425).
    if (segs.dropRight(1).contains("#"))
      return "^" + escapeSegment(filter) + "$"
    val trailingHash = segs.last == "#"
    val body = (if (trailingHash) segs.dropRight(1) else segs)
      .map {
        case "+" => "[^/]*"
        case s   => escapeSegment(s)
      }
      .mkString("/")
    // Trailing '#' also matches the parent topic itself (router.go:430-432).
    "^" + body + (if (trailingHash) "(/.*)?" else "") + "$"
  }

  /** Routing predicate as a Catalyst column (codegen'd, pushdown-friendly). */
  def topicMatchesCol(filter: String, topic: Column): Column =
    topic.rlike(filterToRegex(filter))
}
