package graft

import scala.collection.concurrent.TrieMap

import graft.model.Envelope
import graft.operators.{Route, Router}
import graft.streaming.StreamRoutes

/** A1 against a genuinely UNBOUNDED non-file source: the rate-micro-batch
  * generator adapted to the envelope, routed through the same Router as
  * batch, fanned out per table — proving the envelope + routing pipeline is
  * source-agnostic (a broker connector swaps only the readStream format).
  */
class StreamRateSourceSpec extends SparkSpec {

  test("rate-source stream routes deterministically through the fan-out") {
    val rowsPerBatch = 90 // divisible by 3: route proportions exact per batch
    val messages = Envelope.messagesFromRate(spark, rowsPerBatch)
    val router = new Router(Seq(
      Route("purchases", "events/purchase/#", table = "purchase_raw"),
      Route("clicks", "events/click/#", table = "click_raw")))
    val counts = TrieMap.empty[String, Long]
    val writer = StreamRoutes.routedWriter(messages, router) { (table, df) =>
      counts.updateWith(table)(c => Some(c.getOrElse(0L) + df.count()))
    }
    val q = writer.start()
    try {
      // unbounded source: wait for at least two micro-batches, then stop
      val deadline = System.currentTimeMillis() + 60000
      while (counts.values.sum < 2L * rowsPerBatch &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
      }
    } finally q.stop()

    val total = counts.values.sum
    assert(total >= 2L * rowsPerBatch, s"only $total rows arrived")
    // value % 3 == 0 -> purchase, 1 -> click, 2 -> view (unmatched -> raw);
    // sequence numbers are contiguous from 0, so every complete batch
    // contributes exactly a third to each route
    assert(counts.keySet === Set("purchase_raw", "click_raw", Router.RawTable))
    assert(total % rowsPerBatch === 0L,
      "foreachBatch must see whole micro-batches")
    assert(counts("purchase_raw") === total / 3)
    assert(counts("click_raw") === total / 3)
    assert(counts(Router.RawTable) === total / 3)
  }
}
