package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MqttFunctions._

/** Ports the reference truth table (router_test.go:9-36) and adds an
  * exhaustive check that the compiled regex is semantically identical to the
  * pure matcher (the regex is what runs in the engine and in the oracle).
  */
class MqttFunctionsSpec extends AnyFunSuite {

  val truthTable: Seq[(String, String, Boolean)] = Seq(
    ("ruuvi/sensor1", "ruuvi/sensor1", true),           // exact match
    ("#", "any/topic/here", true),                      // wildcard #
    ("ruuvi/+", "ruuvi/sensor1", true),                 // single level +
    ("ruuvi/+", "ruuvi/sensor1/data", false),           // + no match
    ("ruuvi/#", "ruuvi/sensor1/data", true),            // multi level #
    ("ruuvi/+/#", "ruuvi/sensor1/data/temp", true),     // # at end
    ("ruuvi/+", "p1ib/sensor1", false),                 // different prefix
    ("ruuvi/+/data", "ruuvi//data", true),              // + matches empty
    ("devices/+/telemetry", "devices/sensor123/telemetry", true),
    ("devices/+/telemetry", "devices/sensor123/status", false))

  test("topicMatches reference truth table (router_test.go:9-36)") {
    truthTable.foreach { case (f, t, want) =>
      assert(topicMatches(f, t) === want, s"topicMatches($f, $t)")
    }
  }

  test("trailing # matches the parent level (router.go:430-432)") {
    assert(topicMatches("a/#", "a"))
    assert(topicMatches("a/+/#", "a/b"))
    assert(!topicMatches("a/#", "ab"))
  }

  test("non-final # only matches literally (router.go:423,434-436)") {
    assert(topicMatches("a/#/b", "a/#/b"))
    assert(!topicMatches("a/#/b", "a/x/b"))
  }

  test("wildcards must occupy a whole segment") {
    assert(!topicMatches("a+b", "aXb"))
    assert(topicMatches("a+b", "a+b"))
  }

  test("filterToRegex agrees with topicMatches on the truth table") {
    truthTable.foreach { case (f, t, want) =>
      assert(t.matches(filterToRegex(f)) === want, s"regex($f) vs $t")
    }
  }

  test("exhaustive: regex compilation ≡ pure matcher over a 3-level universe") {
    val segs = Seq("a", "b", "ab", "", "+", "#", "a.c")
    val paths: Seq[String] = (1 to 3).flatMap { n =>
      (1 to n).foldLeft(Seq(Seq.empty[String])) { (acc, _) =>
        for (p <- acc; s <- segs) yield p :+ s
      }.map(_.mkString("/"))
    }.distinct
    for (filter <- paths; topic <- paths) {
      assert(topicMatches(filter, topic) === topic.matches(filterToRegex(filter)),
        s"filter=$filter topic=$topic")
    }
  }
}
