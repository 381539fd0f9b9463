package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over a text column — the scrubbing pass every
  * large-scale training corpus runs before anything else touches the data
  * (emails, phone numbers, IP addresses → typed placeholder tokens).
  *
  * Scale posture: detection counts and the redacted rewrite are pure
  * regexp column expressions — one scan, zero shuffle, whole-stage
  * codegen. A 100 TB redaction pass is therefore embarrassingly parallel
  * and IO-bound, which is the only acceptable cost model for a pass that
  * must touch every byte of the corpus.
  *
  * The patterns are restricted to the regex dialect Java and RE2 share
  * (character classes, bounded repetition, non-capturing groups, \b) so
  * the DuckDB oracle applies the identical automaton. They are deliberately
  * conservative-simple; swapping in heavier industrial patterns changes no
  * plan shape, only the literal.
  */
object Pii {

  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-ish: optional +CC then 3-3-4 groups with - or space separators.
    * Both alternatives are left-anchored — `(?:\+|\b)` on the first one so
    * it cannot start mid-digit-run (e.g. inside "99945-678-9012") — and
    * `(?:\+|\b)` is in the Java∩RE2 dialect, so the oracle stays identical.
    */
  val phonePattern: String =
    "(?:\\+|\\b)[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}|\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  val ipv4Pattern: String = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def countPii(text: Column, pattern: String): Column =
    TextAnalysis.countMatches(text, pattern).cast("long")

  /** Redact in a fixed order (email → phone → ip) so the output is
    * deterministic regardless of pattern overlap.
    */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, "<EMAIL>")
    val p = regexp_replace(e, phonePattern, "<PHONE>")
    regexp_replace(p, ipv4Pattern, "<IP>")
  }

  /** Per-document PII audit: counts per category plus the redacted text.
    * `textCol` lets callers pass a derived column (the harness derives a
    * deterministic PII-bearing column from the corpus, since the synthetic
    * documents contain none — the operator is the same either way).
    */
  def audit(docs: DataFrame, textCol: Column): DataFrame =
    docs
      .withColumn("pii_text", textCol)
      .withColumn("n_emails", countPii(col("pii_text"), emailPattern))
      .withColumn("n_phones", countPii(col("pii_text"), phonePattern))
      .withColumn("n_ips", countPii(col("pii_text"), ipv4Pattern))
      .withColumn("redacted", redact(col("pii_text")))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        length(col("redacted")).cast("long").as("redacted_len"),
        md5(col("redacted")).as("redacted_md5"))

  // ------------------------------------------- payment-card detection

  /** 16 consecutive digits, word-bounded — the CANDIDATE pattern. A bare
    * digit-run regex false-positives on ids/timestamps, which is why card
    * detection must pair it with the Luhn checksum below.
    */
  val cardPattern: String = "\\b[0-9]{16}\\b"

  /** Luhn mod-10 checksum validity of a digit string, as a pure
    * higher-order-function column: reverse, double every second digit
    * (subtracting 9 on overflow), sum ≡ 0 (mod 10). No UDF — the lambda
    * forms (`transform` with index, `aggregate`) keep the expression in
    * the SQL engine, and the identical computation is expressible in
    * DuckDB (`list_transform` + `list_sum`), so validity is
    * oracle-checkable bit for bit.
    *
    * HOF lambdas are CodegenFallback; card candidates are rare after the
    * regex gate, so the interpreted path prices per-candidate, not
    * per-byte.
    */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val chars = filter(split(rev, ""), c => c =!= "")
    val contrib = transform(chars, (c, i) => {
      val d = c.cast("int")
      val dd = when(i % 2 === 1, d * 2).otherwise(d)
      when(dd > 9, dd - 9).otherwise(dd)
    })
    aggregate(contrib, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Per-candidate card audit: every 16-digit candidate in `textCol`,
    * with its position, fingerprint, and Luhn verdict. One row per
    * candidate (docs with none drop out), ordered.
    *
    * 100 TB shape: regexp extraction + explode are narrow (pipeline into
    * the scan, no shuffle); output is candidate-sized, not corpus-sized,
    * and the card NUMBER itself never leaves the row — only its md5.
    */
  /** k-anonymity / l-diversity audit of a release candidate (Sweeney
    * 2002; Machanavajjhala et al. 2007): group rows by the quasi-
    * identifier columns and, for each candidate `k`, report how many
    * QI groups (and rows) fall below k-anonymity, plus the worst group
    * size and the worst l-diversity (distinct sensitive values in a
    * group — a k-anonymous group with one sensitive value still leaks).
    * The go/no-go audit before event logs or curated corpora leave the
    * pipeline boundary.
    *
    * Output: one row per k — `(k, n_groups, groups_below_k, rows_below_k,
    * min_group_size, min_l_diversity)` (the two mins are k-independent
    * corpus facts, repeated per row for a self-contained report).
    *
    * 100 TB shape: ONE corpus scan into a QI-keyed partial aggregate
    * (count + distinct-sensitive count); everything after runs on the
    * QI-cardinality group table — the |ks| expansion is an explode over
    * THAT table, never the corpus, re-aggregated to |ks| rows in one
    * map-side-combined pass (no per-k plan branches, so nothing is
    * re-scanned). Adversarially skewed QIs cannot hurt: count-distinct
    * over the group key is the same two-level hash aggregate Spark uses
    * everywhere; no row payload survives the first aggregate.
    */
  def kAnonymityAudit(
      rows: DataFrame,
      qi: Seq[Column],
      sensitive: Column,
      ks: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    require(qi.nonEmpty && ks.nonEmpty && ks.forall(_ >= 1))
    val groups = rows
      .groupBy(qi: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("l"))
    groups
      .select(col("n"), col("l"),
        explode(array(ks.map(lit): _*)).as("k"))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < col("k"), 1L).otherwise(0L))
          .as("groups_below_k"),
        sum(when(col("n") < col("k"), col("n")).otherwise(0L))
          .as("rows_below_k"),
        min(col("n")).as("min_group_size"),
        min(col("l")).as("min_l_diversity"))
      .orderBy(col("k"))
  }

  def cardAudit(docs: DataFrame, textCol: Column): DataFrame =
    docs
      .withColumn("card_text", textCol)
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("card_text"), lit(cardPattern), lit(0)))
          .as(Seq("card_idx", "card")))
      .select(
        col("doc_id"),
        col("card_idx").cast("long").as("card_idx"),
        md5(col("card")).as("card_md5"),
        luhnValid(col("card")).as("luhn_valid"))
      .orderBy(col("doc_id"), col("card_idx"))
}
