package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamHeavyHitters

/** Windowed streaming Misra-Gries: the sketch state must accumulate
  * ACROSS micro-batches within a window, keep windows separate, and keep
  * the MG one-sided error bound against exact counts computed over the
  * full fed stream.
  */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  final case class Tok(ts: Timestamp, token: String)

  private val h0 = 1700000000000L // window A
  private val h1 = h0 + 3600000L  // window B (next hour)

  private def at(base: Long, i: Int) = new Timestamp(base + i * 1000L)

  test("accumulates across micro-batches, separates windows, keeps MG bounds") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Tok]
    val out = StreamHeavyHitters
      .windowedHeavyHitters(in.toDF(), capacity = 3, bucket = "1 hour")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream").start()

    // window A, batch 1: a×4, b×2, c×1
    in.addData((Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .zipWithIndex.map { case (t, i) => Tok(at(h0, i), t) }: _*)
    q.processAllAvailable()
    // window A, batch 2: a×3, d×2 — a's count must COMBINE to 7;
    // window B: x×5
    in.addData((Seq.fill(3)("a") ++ Seq.fill(2)("d"))
      .zipWithIndex.map { case (t, i) => Tok(at(h0, 100 + i), t) }: _*)
    in.addData(Seq.fill(5)("x")
      .zipWithIndex.map { case (t, i) => Tok(at(h1, i), t) }: _*)
    q.processAllAvailable()

    val rows = spark.table("hh_stream")
      .select("window_start", "token", "est_count", "max_underestimate")
      .as[(Timestamp, String, Long, Long)].collect()
    q.stop()

    // window.start is the HOUR-TRUNCATED boundary, not the first event ts
    val starts = rows.map(_._1.getTime).distinct.sorted
    assert(starts.size == 2, s"expected two windows, got $starts")
    val winA = rows.filter(_._1.getTime == starts(0))
    val winB = rows.filter(_._1.getTime == starts(1))
    assert(winA.nonEmpty && winB.nonEmpty, "both windows must report")
    assert(winA.size <= 3 && winB.size <= 3, "capacity bounds the summary")

    // exact counts for window A across BOTH batches: a=7, b=2, c=1, d=2
    val exactA = Map("a" -> 7L, "b" -> 2L, "c" -> 1L, "d" -> 2L)
    // survival bound: true*(cap+1) > n ⇒ reported. n=12, cap=3 ⇒
    // threshold 3: only 'a' (7*4=28 > 12) is guaranteed, and its
    // cross-batch total must satisfy the one-sided error bound
    val a = winA.find(_._2 == "a")
    assert(a.isDefined, "a floods window A and must be reported")
    assert(a.get._3 <= 7L && 7L <= a.get._3 + a.get._4,
      s"MG bound violated: est=${a.get._3} err=${a.get._4} true=7")
    // every reported token obeys est <= true <= est + err
    assert(winA.forall { case (_, t, est, err) =>
      val tru = exactA.getOrElse(t, 0L); est <= tru && tru <= est + err
    })
    // window B is pure: x=5 exact
    val x = winB.find(_._2 == "x")
    assert(x.isDefined && x.get._3 <= 5L && 5L <= x.get._3 + x.get._4)
    assert(winB.forall(_._2 == "x"), "window B saw only x")
  }
}
