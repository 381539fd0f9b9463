package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level deduplication — the first dedup pass
  * every web-crawl corpus runs, BEFORE any content hashing: the same page
  * fetched as `HTTPS://WWW.Site.COM:443/a/?utm_source=feed#top` and
  * `https://site.com/a` must collapse to one canonical key so re-crawls and
  * tracking-parameter noise don't multiply the corpus.
  *
  * Canonical form (the CC-Net / URL-frontier convention):
  *   - scheme and host lowercased; a leading `www.` and the scheme-default
  *     port (`:443` / `:80`) stripped from the host;
  *   - trailing slashes stripped from the path (empty path → `/`);
  *   - `utm_*` tracking parameters removed, remaining query parameters
  *     SORTED (param order is not semantic) and rejoined; empty query
  *     dropped;
  *   - the fragment dropped (never sent to the server).
  *
  * Everything is pure codegen'd string expressions in the Java∩RE2 regex
  * dialect (same discipline as [[Pii]]) — one scan, zero shuffle for
  * canonicalization; the dedup adds ONE shuffle keyed on the canonical URL
  * string. Canonical-URL groups are tiny (re-crawl multiplicity), so the
  * per-key `row_number` window is skew-safe without the two-phase guard
  * [[Curation.capPerSource]] needs for domain-sized keys.
  */
object Urls {

  /** `(scheme, authority, path, query)` extractors — RFC 3986 appendix-B
    * style, anchored, no backtracking hazards. Absent parts extract as ''.
    */
  private def scheme(url: Column): Column =
    regexp_extract(url, "^([^:/?#]+)://", 1)
  private def authority(url: Column): Column =
    regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)
  private def rawPath(url: Column): Column =
    regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
  private def rawQuery(url: Column): Column =
    regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)

  /** Lowercased host with `www.` prefix and default port stripped. */
  private def canonicalHost(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(authority(url)), "^www\\.", ""),
      ":(443|80)$", "")

  /** Path with trailing slashes stripped; empty → `/`. */
  private def canonicalPath(url: Column): Column = {
    val p = regexp_replace(rawPath(url), "/+$", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /** Query with `utm_*` params dropped and the rest sorted; '' when none
    * survive. Split/filter/sort/join are all codegen'd array expressions —
    * no explode.
    */
  private def canonicalQuery(url: Column): Column =
    array_join(
      array_sort(filter(split(rawQuery(url), "&"),
        p => p =!= "" && !p.startsWith("utm_"))),
      "&")

  /** The full canonical URL: `scheme://host path [?query]`, fragment gone. */
  def canonicalize(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(
      lower(scheme(url)), lit("://"), canonicalHost(url), canonicalPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** URL-level dedup: one survivor per canonical URL — the largest document
    * (n_chars desc, doc_id tiebreak: a total order, deterministic cut),
    * carrying the canonical key and the collapse multiplicity for audit.
    *
    * 100 TB shape: canonicalization is a narrow map; the only exchange is
    * the canonical-key shuffle (string key, re-crawl-sized groups). The
    * multiplicity and the keeper come out of the SAME window pass (count
    * over the unbounded frame, row_number over the ordered one — one
    * shuffle, one sort).
    */
  /** THE keep policy, in one place: survivors of canonical-URL dedup
    * over whatever columns `docs` carries — one row per canonical key,
    * the LARGEST document kept (n_chars desc, doc_id tiebreak: a total
    * order, deterministic cut), `canonical_url` + collapse multiplicity
    * `n_dups` attached. [[urlDedup]] (the audit projection) and
    * [[Curation.buildReport]] (the full-row pipeline stage) both compose
    * this, so the survivor rule cannot drift between them.
    */
  def keepLargestPerCanonical(docs: DataFrame, url: Column): DataFrame = {
    val byUrl = Window.partitionBy(col("canonical_url"))
    docs
      .withColumn("canonical_url", canonicalize(url))
      .withColumn("n_dups", count(lit(1)).over(byUrl))
      .withColumn("_rn", row_number().over(
        byUrl.orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  def urlDedup(docs: DataFrame, url: Column): DataFrame =
    // project BEFORE the window so only (doc_id, n_chars, key) shuffle —
    // the url expression is evaluated first so it may reference any doc
    // column
    keepLargestPerCanonical(
      docs.select(col("doc_id"), col("n_chars"), url.as("_url")),
      col("_url"))
      .select(col("doc_id"), col("canonical_url"), col("n_chars"),
        col("n_dups"))
      .orderBy(col("doc_id"))
}
