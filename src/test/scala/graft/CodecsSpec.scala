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

  test("hmac oracle midstate: RFC 2104 decomposition replays javax.crypto") {
    // Guards the constants embedded in SparkEntry.hmacOracleSql: replay the
    // decomposition in Scala — midstate-after-opad-block + one compression
    // over (inner digest || padding) — and compare to javax.crypto HMAC.
    val K = Array(
      0x428a2f98L, 0x71374491L, 0xb5c0fbcfL, 0xe9b5dba5L, 0x3956c25bL,
      0x59f111f1L, 0x923f82a4L, 0xab1c5ed5L, 0xd807aa98L, 0x12835b01L,
      0x243185beL, 0x550c7dc3L, 0x72be5d74L, 0x80deb1feL, 0x9bdc06a7L,
      0xc19bf174L, 0xe49b69c1L, 0xefbe4786L, 0x0fc19dc6L, 0x240ca1ccL,
      0x2de92c6fL, 0x4a7484aaL, 0x5cb0a9dcL, 0x76f988daL, 0x983e5152L,
      0xa831c66dL, 0xb00327c8L, 0xbf597fc7L, 0xc6e00bf3L, 0xd5a79147L,
      0x06ca6351L, 0x14292967L, 0x27b70a85L, 0x2e1b2138L, 0x4d2c6dfcL,
      0x53380d13L, 0x650a7354L, 0x766a0abbL, 0x81c2c92eL, 0x92722c85L,
      0xa2bfe8a1L, 0xa81a664bL, 0xc24b8b70L, 0xc76c51a3L, 0xd192e819L,
      0xd6990624L, 0xf40e3585L, 0x106aa070L, 0x19a4c116L, 0x1e376c08L,
      0x2748774cL, 0x34b0bcb5L, 0x391c0cb3L, 0x4ed8aa4aL, 0x5b9cca4fL,
      0x682e6ff3L, 0x748f82eeL, 0x78a5636fL, 0x84c87814L, 0x8cc70208L,
      0x90befffaL, 0xa4506cebL, 0xbef9a3f7L, 0xc67178f2L)
    val mid = Array(779409365L, 3327313458L, 2516504936L, 2853558226L,
      679719076L, 3166517011L, 632591039L, 4059150801L)
    val m = 0xFFFFFFFFL
    def ror(x: Long, n: Int) = ((x >> n) | (x << (32 - n))) & m
    def compress(state: Array[Long], block: Array[Long]): Array[Long] = {
      val w = Array.ofDim[Long](64)
      Array.copy(block, 0, w, 0, 16)
      for (t <- 16 until 64)
        w(t) = (w(t - 16) +
          (ror(w(t - 15), 7) ^ ror(w(t - 15), 18) ^ (w(t - 15) >> 3)) +
          w(t - 7) +
          (ror(w(t - 2), 17) ^ ror(w(t - 2), 19) ^ (w(t - 2) >> 10))) & m
      var Array(a, b, c, d, e, f, g, h) = state
      for (t <- 0 until 64) {
        val t1 = (h + (ror(e, 6) ^ ror(e, 11) ^ ror(e, 25)) +
          ((e & f) ^ (~e & g) & m) + K(t) + w(t)) & m
        val t2 = ((ror(a, 2) ^ ror(a, 13) ^ ror(a, 22)) +
          ((a & b) ^ (a & c) ^ (b & c))) & m
        h = g; g = f; f = e; e = (d + t1) & m
        d = c; c = b; b = a; a = (t1 + t2) & m
      }
      state.zip(Array(a, b, c, d, e, f, g, h)).map { case (s, v) => (s + v) & m }
    }
    // midstate constant really is SHA-256(IV, opad block of "graft-key")
    val iv = Array(0x6a09e667L, 0xbb67ae85L, 0x3c6ef372L, 0xa54ff53aL,
      0x510e527fL, 0x9b05688cL, 0x1f83d9abL, 0x5be0cd19L)
    val keyBlock = ("graft-key".getBytes("UTF-8") ++ Array.fill[Byte](55)(0))
    val opad = keyBlock.map(x => (x ^ 0x5c).toByte)
    def toWords(bytes: Array[Byte]): Array[Long] =
      bytes.grouped(4).map(_.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL))).toArray
    assert(compress(iv, toWords(opad)).toSeq === mid.toSeq)
    // full decomposition vs javax.crypto on a multi-byte-safe sample set
    val ipadAscii = "QDWPB\u001b]SO" + "6" * 55
    for (msg <- Seq("", "a", "The quick brown fox", "tëst ünïcode × µ")) {
      val inner = java.security.MessageDigest.getInstance("SHA-256")
        .digest((ipadAscii + msg).getBytes("UTF-8"))
      val block2 = toWords(inner ++ Array[Byte](0x80.toByte) ++
        Array.fill[Byte](27)(0) ++ Array[Byte](0, 0, 3, 0))
      val got = compress(mid, block2).map(w => f"$w%08x").mkString
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(
        "graft-key".getBytes("UTF-8"), "HmacSHA256"))
      val exp = mac.doFinal(msg.getBytes("UTF-8")).map(x => f"$x%02x").mkString
      assert(got === exp, s"msg=$msg")
    }
  }

  test("C→F conversion vector: 0 -> 32 (lua_test.go:128)") {
    val f = Seq(0.0, 100.0).toDF("c")
      .select((col("c") * 9 / 5 + 32).as("f")).as[Double].collect()
    assert(f.toSeq === Seq(32.0, 212.0))
  }
}
