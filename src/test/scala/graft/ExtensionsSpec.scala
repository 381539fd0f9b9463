package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions exposed through spark.sql via
  * SparkSessionExtensions.
  */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate() reuses the shared test session (extensions are build-time
  // only), so install through the live-session path, which uses the exact
  // same builder list as the extension class.
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("SQL surface: rolling_hash, ngram_hashes, jaccard_sorted, vec ops, topic_matches") {
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT rolling_hash('abc xyz') AS rh,
        |       size(ngram_hashes('abcd', 3)) AS ng,
        |       jaccard_sorted(ngram_hashes('abcd', 3), ngram_hashes('abce', 3)) AS j,
        |       jaccard_sorted_ge(ngram_hashes('abcd', 3), ngram_hashes('abce', 3), 0.3d) AS jge,
        |       jaccard_sorted_ge(ngram_hashes('abcd', 3), ngram_hashes('abce', 3), 0.5d) AS jlt,
        |       vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       vec_unit(array(3.0d, 4.0d))[0] AS u0,
        |       vec_l2sq_long(array(1L, 5L), array(4L, 1L)) AS l2,
        |       vec_dot_long(array(1L, 5L), array(4L, 1L)) AS dl,
        |       topic_matches('sensors/+', 'sensors/t1') AS tm,
        |       topic_matches('sensors/+', 'other/t1') AS tm2
        |""".stripMargin).collect()(0)
    assert(row.getLong(0) === 591029166L)
    assert(row.getInt(1) === 2)
    assert(math.abs(row.getDouble(2) - 1.0 / 3.0) < 1e-12)
    assert(row.getBoolean(3) === true)  // 1/3 >= 0.3
    assert(row.getBoolean(4) === false) // 1/3 <  0.5
    assert(row.getDouble(5) === 11.0)
    assert(math.abs(row.getDouble(6) - 0.6) < 1e-12)
    assert(row.getLong(7) === 25L) // 3² + 4²
    assert(row.getLong(8) === 9L) // 1·4 + 5·1
    assert(row.getBoolean(9) === true)
    assert(row.getBoolean(10) === false)
  }

  test("vec_unit throws loudly on a zero vector (no silent NaN poisoning)") {
    val ex = intercept[Exception] {
      spark.sql("SELECT vec_unit(array(0.0d, 0.0d))").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("zero vector")))
  }

  test("non-literal filter in topic_matches is rejected at plan time") {
    intercept[Exception] {
      spark.sql("SELECT topic_matches(c, c) FROM (SELECT 'a' AS c)").collect()
    }
  }

  test("word_gram_hashes via SQL: multiset in order, short/empty -> empty") {
    val rows = spark.sql(
      """SELECT size(word_gram_hashes('a b a b', 2)) AS n,
        |       word_gram_hashes('a b a b', 2)[0] = word_gram_hashes('a b a b', 2)[2] AS rep,
        |       size(word_gram_hashes('a', 2)) AS short_n,
        |       size(word_gram_hashes('', 2)) AS empty_n""".stripMargin)
      .collect()(0)
    assert(rows.getInt(0) === 3)      // (a b)(b a)(a b)
    assert(rows.getBoolean(1))        // duplicate gram, duplicate hash
    assert(rows.getInt(2) === 0 && rows.getInt(3) === 0)
  }
}
