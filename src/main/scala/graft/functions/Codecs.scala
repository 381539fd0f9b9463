package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's Lua-registered scalar function surface
  * (`/root/reference/internal/lua/lua.go:86-176`), re-expressed as Catalyst
  * column expressions. Everything except HMAC is a built-in (codegen'd);
  * `rot13` composes `translate`, so none of the hot-path codecs require a UDF.
  */
object Codecs {

  private val Upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private def rot(a: String) = a.substring(13) + a.substring(0, 13)

  /** ROT13 on ASCII letters only (lua.go:242-252; vector lua_test.go:344-356:
    * "Hello, World!" → "Uryyb, Jbeyq!"). Pure `translate` — codegen'd.
    */
  def rot13(c: Column): Column =
    translate(c, Upper + Lower, rot(Upper) + rot(Lower))

  /** Std base64 (lua.go:95-100; vector "Hello, World!"→"SGVsbG8sIFdvcmxkIQ=="). */
  def base64Encode(c: Column): Column = base64(c.cast("binary"))

  /** Decode; malformed input → null (the reference returns (nil, err) —
    * lua.go:103-114; null is the columnar analog of the error value).
    * Spark 4's default ANSI mode makes bare `unbase64` THROW on malformed
    * input, so validity is checked first; `when` evaluates lazily, keeping
    * invalid rows away from the decoder.
    */
  def base64Decode(c: Column): Column =
    when(c.rlike("^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"),
      unbase64(c).cast("string"))

  private val Base64Re =
    "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"

  /** Error-as-second-return parity (lua.go:102-114 returns
    * `(decoded, err)`): a struct where, for NON-NULL input, exactly one
    * of (value, err) is non-null, so pipelines can route failures
    * instead of just losing them to null. A NULL input yields
    * (null, null) — standard SQL null propagation, NOT a decode failure;
    * routing logic must treat `value IS NULL AND err IS NULL` as
    * "no input", not success. The err text describes the failure; it is
    * not byte-for-byte Go's error string (which encodes the offending
    * byte offset).
    */
  def base64DecodeWithError(c: Column): Column = {
    val valid = c.rlike(Base64Re)
    struct(
      when(valid, unbase64(c).cast("string")).as("value"),
      when(c.isNotNull && !valid,
        concat(lit("illegal base64 data in input: "), c)).as("err"))
  }

  /** Lowercase hex of UTF-8 bytes (lua.go:117-122; Go hex.EncodeToString is
    * lowercase; Spark's `hex` is uppercase, hence the `lower`). */
  def hexEncode(c: Column): Column = lower(hex(c))

  def hexDecode(c: Column): Column = unhex(c).cast("string")

  /** (decoded, err) parity for hex — see [[base64DecodeWithError]],
    * including the NULL-input → (null, null) contract (lua.go:124-135). */
  def hexDecodeWithError(c: Column): Column = {
    val valid = c.rlike("^(?:[0-9A-Fa-f]{2})*$")
    struct(
      when(valid, unhex(c).cast("string")).as("value"),
      when(c.isNotNull && !valid,
        concat(lit("invalid hex input: "), c)).as("err"))
  }

  /** HMAC-SHA256, lowercase hex (lua.go:139-147). No Spark built-in; a Scala
    * UDF over javax.crypto.Mac. Off the analytical hot path (the reference
    * exposes it for payload signing), so UDF cost is acceptable; a native
    * Expression with doGenCode is the upgrade path if it ever matters.
    */
  val hmacSha256: (Column, Column) => Column = {
    val f = udf { (key: String, msg: String) =>
      if (key == null || msg == null) null
      else {
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          key.getBytes("UTF-8"), "HmacSHA256"))
        mac.doFinal(msg.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
      }
    }
    (key, msg) => f(key, msg)
  }

  /** JSON encode/decode (lua.go:150-175) — direct built-ins. */
  def jsonEncode(c: Column): Column = to_json(c)
  def jsonDecode(c: Column, schemaDdl: String): Column =
    from_json(c, org.apache.spark.sql.types.DataType.fromDDL(schemaDdl))
}
