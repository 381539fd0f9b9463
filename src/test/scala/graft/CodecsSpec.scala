package graft

import org.apache.spark.sql.functions._

import graft.functions.Codecs

/** Exact vectors from the reference Lua engine tests (lua_test.go:323-401). */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  test("rot13 vector: Hello, World! -> Uryyb, Jbeyq! (lua_test.go:344-356)") {
    assert(eval1(Codecs.rot13(lit("Hello, World!"))) === "Uryyb, Jbeyq!")
    // involution + non-letters untouched
    assert(eval1(Codecs.rot13(Codecs.rot13(lit("a1!Z")))) === "a1!Z")
  }

  test("base64 vector (lua_test.go:392)") {
    assert(eval1(Codecs.base64Encode(lit("Hello, World!"))) === "SGVsbG8sIFdvcmxkIQ==")
    assert(eval1(Codecs.base64Decode(lit("SGVsbG8sIFdvcmxkIQ=="))) === "Hello, World!")
  }

  test("base64Decode yields null on malformed input instead of throwing (ANSI)") {
    assert(eval1(Codecs.base64Decode(lit("not-base64!"))) === null)
    assert(eval1(Codecs.base64Decode(lit("abc"))) === null) // bad length
    assert(eval1(Codecs.base64Decode(lit("SGVsbG8="))) === "Hello")
  }

  test("hex round-trip, lowercase like Go hex.EncodeToString") {
    assert(eval1(Codecs.hexEncode(lit("az"))) === "617a")
    assert(eval1(Codecs.hexDecode(lit("617a"))) === "az")
  }

  test("decode-with-error: exactly one of (value, err) set (lua.go (decoded, err))") {
    val rows = Seq("SGVsbG8=", "not!!base64", "617a", "xyz")
      .toDF("s")
      .select(
        Codecs.base64DecodeWithError(col("s")).as("b64"),
        Codecs.hexDecodeWithError(col("s")).as("hx"))
      .select("b64.value", "b64.err", "hx.value", "hx.err")
      .as[(Option[String], Option[String], Option[String], Option[String])]
      .collect()
    assert(rows(0)._1 === Some("Hello")) // valid base64
    assert(rows(0)._2 === None)
    assert(rows(1)._1 === None) // malformed: err populated, value null
    assert(rows(1)._2.exists(_.contains("not!!base64")))
    assert(rows(2)._3 === Some("az")) // valid hex
    assert(rows(2)._4 === None)
    assert(rows(3)._3 === None)
    assert(rows(3)._4.exists(_.contains("xyz")))
    rows.foreach { r =>
      assert(r._1.isDefined !== r._2.isDefined) // exactly one side set
      assert(r._3.isDefined !== r._4.isDefined)
    }
  }

  test("hmac_sha256 lowercase hex (RFC 4231 test case 2)") {
    // Known vector: HMAC-SHA256("Jefe", "what do ya want for nothing?")
    assert(eval1(Codecs.hmacSha256(lit("Jefe"), lit("what do ya want for nothing?")))
      === "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  test("C→F conversion vector: 0 -> 32 (lua_test.go:128)") {
    val f = Seq(0.0, 100.0).toDF("c")
      .select((col("c") * 9 / 5 + 32).as("f")).as[Double].collect()
    assert(f.toSeq === Seq(32.0, 212.0))
  }
}
