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
