package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces exactly the plain join's rows") {
    val big = (1L to 1000L).map(i => (i, if (i % 10 == 0) "hot" else s"k$i"))
      .toDF("id", "key")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"))
      .toDF("key", "v")
    val plain = big.join(small, "key").select("id", "v")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "key", "id", factor = 8)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.count(_._2 == "H") === 100)
  }

  test("salt splits a hot key across the factor range deterministically") {
    val df = (1L to 500L).toDF("id")
    val salts = df.select(Skew.salt(col("id"), 8).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(salts.keySet.subsetOf((0 until 8).toSet))
    assert(salts.size === 8) // all buckets used
    val again = df.select(Skew.salt(col("id"), 8).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(salts === again)
  }

  test("approx_count_distinct within 5% of exact on the events corpus") {
    // the registered query reduces this bound to a boolean the oracle
    // pins TRUE; here the raw values are checked at the tighter 1·rsd
    val rows = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select("approx_users", "exact_users").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx=$approx exact=$exact")
    }
    val claims = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .select("approx_within_3rsd").as[Boolean].collect()
    assert(claims.nonEmpty && claims.forall(identity))
  }
}
