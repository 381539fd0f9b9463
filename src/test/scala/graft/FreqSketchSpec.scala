package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqSketch
import graft.operators.TextAnalysis

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact when the vocabulary fits the capacity (err = 0)") {
    val items = Seq("a", "a", "a", "b", "b", "c").toDF("item")
    val got = items
      .agg(FreqSketch.freq_sketch(col("item"), capacity = 8).as("s"))
      .select(explode(col("s")).as("e"))
      .select($"e.item", $"e.est", $"e.err")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }

  test("MG guarantees hold against exact counts on the corpus") {
    val capacity = 32
    val toks = TextAnalysis.tokens(Tables.documents(spark, sf))
    val exact = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val sketch = TextAnalysis.heavyHitters(
      Tables.documents(spark, sf), capacity)
      .select("token", "est_count", "max_underestimate")
      .as[(String, Long, Long)].collect()
    assert(sketch.nonEmpty && sketch.length <= capacity)
    val errs = sketch.map(_._3).distinct
    assert(errs.length === 1, "err is a summary-wide bound")
    val d = errs.head
    assert(d <= n / (capacity + 1), s"decrement bound: $d vs n=$n")
    // one-sided error: est <= true <= est + d for every reported item
    sketch.foreach { case (tok, est, _) =>
      val truth = exact(tok)
      assert(est <= truth && truth <= est + d, s"$tok: est=$est true=$truth d=$d")
    }
    // completeness: every item with true freq > n/(capacity+1) is reported
    val threshold = n / (capacity + 1)
    val reported = sketch.map(_._1).toSet
    exact.filter(_._2 > threshold).keys.foreach { tok =>
      assert(reported.contains(tok), s"heavy item $tok missing from sketch")
    }
  }

  test("heavyHittersAudit: claim booleans all hold; required set matches exact counts") {
    val capacity = 32
    val audit = TextAnalysis.heavyHittersAudit(
      Tables.documents(spark, sf), capacity)
      .as[(String, Long, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(audit.nonEmpty)
    audit.foreach { case (tok, _, reported, boundOk, cap, allOk) =>
      assert(reported && boundOk && cap && allOk, s"claim failed for $tok")
    }
    // the emitted row set is exactly the exact-count survival set
    val exact = TextAnalysis.tokens(Tables.documents(spark, sf))
      .groupBy("token").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val expected = exact.filter { case (_, c) => c * (capacity + 1) > n }
    assert(audit.map(a => a._1 -> a._2).toMap === expected)
  }

  test("heavyHittersAudit on an adversarial corpus (decrements occur): claims still hold") {
    // 4 heavy items + a long tail of singletons around capacity 4: MG
    // must decrement, est < true, and the audit booleans must survive it
    val words = (Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma") ++ Seq.fill(150)("delta") ++
      (1 to 120).map(i => s"tail$i")).mkString(" ")
    val docs = Seq((1L, words, "en", "adv", words.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val audit = TextAnalysis.heavyHittersAudit(docs, capacity = 4)
      .as[(String, Long, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(audit.nonEmpty)
    audit.foreach { case (tok, _, reported, boundOk, cap, allOk) =>
      assert(reported && boundOk && cap && allOk,
        s"adversarial claim failed for $tok")
    }
    // n = 1170, threshold n/5 = 234 → alpha and beta are guaranteed rows
    assert(audit.map(_._1).toSet === Set("alpha", "beta"))
  }

  test("guarantees are partitioning-invariant (merge tree shape)") {
    val capacity = 16
    val base = TextAnalysis.tokens(Tables.documents(spark, sf))
    val exact = base.groupBy("token").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    Seq(1, 7, 32).foreach { parts =>
      val got = base.repartition(parts)
        .agg(FreqSketch.freq_sketch(col("token"), capacity).as("s"))
        .select(explode(col("s")).as("e"))
        .select($"e.item", $"e.est", $"e.err")
        .as[(String, Long, Long)].collect()
      val d = got.head._3
      assert(d <= n / (capacity + 1))
      got.foreach { case (tok, est, _) =>
        val truth = exact(tok)
        assert(est <= truth && truth <= est + d,
          s"parts=$parts $tok: est=$est true=$truth d=$d")
      }
      val reported = got.map(_._1).toSet
      exact.filter(_._2 > n / (capacity + 1)).keys.foreach { tok =>
        assert(reported.contains(tok), s"parts=$parts: heavy $tok missing")
      }
    }
  }
}
