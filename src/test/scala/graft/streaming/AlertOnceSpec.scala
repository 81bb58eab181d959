package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Alert-once semantics across micro-batches: first sighting emits,
  * repeats are suppressed — including repeats in LATER batches, which is
  * the cross-run state the reference lacks.
  */
class AlertOnceSpec extends SparkSpec {

  import AlertOnce._
  import spark.implicits._

  test("first sighting alerts; same-batch and cross-batch repeats are suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Candidate]
    val out = AlertOnce(in.toDS())

    val q = out.writeStream
      .format("memory").queryName("alerts_once")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 0: acme twice in one batch, borg once
      in.addData(
        Candidate("acme|A", "A", "first"),
        Candidate("acme|A", "A", "dup-in-batch"),
        Candidate("borg|B", "B", "first"))
      q.processAllAvailable()
      val b0 = spark.table("alerts_once").as[FirstAlert].collect()
      assert(b0.map(_.key).sorted.toSeq == Seq("acme|A", "borg|B"))
      assert(b0.find(_.key == "acme|A").get.detail == "dup-in-batch",
        "the emitted row is the deterministic MIN by (tier, detail), " +
          "not shuffle-order-first")

      // batch 1: acme again (re-crawl) + a new company
      in.addData(
        Candidate("acme|A", "A", "re-crawl"),
        Candidate("chi|A", "A", "first"))
      q.processAllAvailable()
      val all = spark.table("alerts_once").as[FirstAlert].collect()
      assert(all.length == 3, "re-crawled key must NOT re-alert")
      assert(all.map(_.key).sorted.toSeq == Seq("acme|A", "borg|B", "chi|A"))
    } finally q.stop()
  }
}
