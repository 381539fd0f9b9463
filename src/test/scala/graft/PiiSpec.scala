package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("redact: exact vectors for email, phone, ip") {
    val got = Seq(
      "mail me at jane.doe+spam@sub.example.co.uk today",
      "call +1-555-0134 or 555-123-4567 now",
      "host 192.168.0.1 and 10.0.0.255",
      "no pii here at all",
      "mixed a@b.io 555-123-4567 8.8.8.8",
      "blob 99945-678-9012 is not a phone"
    ).toDF("text")
      .select(Pii.redact(col("text"))).as[String].collect().toSeq
    assert(got(0) === "mail me at <EMAIL> today")
    assert(got(1) === "call <PHONE> or <PHONE> now")
    assert(got(2) === "host <IP> and <IP>")
    assert(got(3) === "no pii here at all")
    assert(got(4) === "mixed <EMAIL> <PHONE> <IP>")
    // boundary guard: a match cannot start mid-digit-run — the 5-digit
    // prefix means no alternative may fire anywhere in this blob
    assert(got(5) === "blob 99945-678-9012 is not a phone")
  }

  test("countPii matches the number of redactions") {
    val df = Seq(
      ("a@b.co c@d.org", 2L, 0L, 0L),
      ("+1-555-0134 x 555-123-4567", 0L, 2L, 0L),
      ("1.2.3.4", 0L, 0L, 1L)
    ).toDF("text", "e", "p", "i")
    val got = df.select(
      Pii.countPii(col("text"), Pii.emailPattern),
      Pii.countPii(col("text"), Pii.phonePattern),
      Pii.countPii(col("text"), Pii.ipv4Pattern),
      col("e"), col("p"), col("i")).as[(Long, Long, Long, Long, Long, Long)]
      .collect()
    got.foreach { case (ge, gp, gi, e, p, i) =>
      assert((ge, gp, gi) === ((e, p, i)))
    }
  }

  test("audit over derived corpus column: every doc carries the injected PII") {
    val d = Tables.documents(spark, sf)
    val piiText = concat(col("text"), lit(" contact "), col("source"),
      lit("_"), col("doc_id").cast("string"),
      lit("@example.com call +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"))
    val got = Pii.audit(d, piiText)
    val rows = got.select("n_emails", "n_phones", "n_ips")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (e, p, i) => e >= 1 && p >= 1 && i >= 1 },
      "the derived column injects at least one of each PII category")
    // audit output carries no raw text — only counts, length, fingerprint
    assert(got.columns.toSet ===
      Set("doc_id", "n_emails", "n_phones", "n_ips",
        "redacted_len", "redacted_md5"))
  }

  test("luhnValid: known-valid and known-invalid card vectors") {
    // 4111111111111111 / 5500005555555559 / 4012888888881881 are the
    // classic test-card numbers (valid); flipping a digit breaks them
    val got = Seq(
      "4111111111111111" -> true,
      "5500005555555559" -> true,
      "4012888888881881" -> true,
      "4111111111111112" -> false,
      "4012888888881882" -> false,
      "1234567890123456" -> false
    ).toDF("card", "expected")
      .select(Pii.luhnValid(col("card")), col("expected"))
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (v, e) => assert(v === e) }
  }

  test("cardAudit: candidates gated by word boundary, verdict per card") {
    val df = Seq(
      (1L, "pay 4111111111111111 or 4111111111111112 ok"),
      (2L, "id 94111111111111111 is 17 digits, no candidate"),
      (3L, "nothing here")
    ).toDF("doc_id", "text")
    val out = Pii.cardAudit(df, col("text"))
      .select("doc_id", "card_idx", "luhn_valid")
      .as[(Long, Long, Boolean)].collect().toList
    assert(out === List((1L, 0L, true), (1L, 1L, false)),
      "two candidates in doc 1 (one valid), none elsewhere")
  }

  test("kAnonymityAudit: group sizes, below-k tallies, l-diversity floor") {
    // QI = (region, age_band); sensitive = user
    // groups: (a,1) → 3 rows {u1,u1,u2} (l=2); (a,2) → 1 row {u3} (l=1);
    //         (b,1) → 2 rows {u4,u4} (l=1)
    val df = Seq(
      ("a", 1L, 1L), ("a", 1L, 1L), ("a", 1L, 2L),
      ("a", 2L, 3L),
      ("b", 1L, 4L), ("b", 1L, 4L)
    ).toDF("region", "age_band", "user")
    val r = Pii.kAnonymityAudit(df,
      Seq(col("region"), col("age_band")), col("user"), Seq(2, 3))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5))).toSeq
    assert(r === Seq(
      // k=2: group (a,2) of size 1 is below ⇒ 1 group, 1 row
      (2, 3L, 1L, 1L, 1L, 1L),
      // k=3: (a,2) size 1 and (b,1) size 2 below ⇒ 2 groups, 3 rows
      (3, 3L, 2L, 3L, 1L, 1L)))
  }
}
