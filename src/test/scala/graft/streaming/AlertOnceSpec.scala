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

  test("TTL variant keeps state BOUNDED under an unbounded key stream") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[TimedCandidate]
    // 10 min out-of-orderness bound, 1 h suppression horizon
    val out = AlertOnce.withTtl(in.toDS(), "10 minutes", ttlMs = 3600000L)
    val q = out.writeStream
      .format("memory").queryName("alerts_ttl")
      .outputMode("append")
      .start()
    try {
      // wave 1: 50 distinct keys at 10:00 → 50 alerts, 50 state rows
      in.addData((1 to 50).map(i =>
        TimedCandidate(s"k$i", "A", "d", ts("2026-08-12 10:00:00"))): _*)
      q.processAllAvailable()

      // wave 2: 50 NEW keys 12 h later → the watermark jumps to 21:50,
      // far past wave 1's leases (11:00)
      in.addData((51 to 100).map(i =>
        TimedCandidate(s"k$i", "A", "d", ts("2026-08-12 22:00:00"))): _*)
      q.processAllAvailable()

      // one more batch so the advanced watermark processes the timeouts
      in.addData(TimedCandidate("k101", "A", "d", ts("2026-08-12 22:30:00")))
      q.processAllAvailable()

      assert(spark.table("alerts_ttl").count() == 101) // every key alerted once
      val stateRows = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators(0).numRowsTotal
      // wave 1's 50 keys were EVICTED: state is bounded by the TTL
      // horizon (51 live keys), not by the 101 keys ever seen
      assert(stateRows <= 51, s"state not bounded: $stateRows rows")

      // the bounded-state contract's flip side: an evicted key that
      // reappears re-alerts (same as dropDuplicatesWithinWatermark)
      in.addData(TimedCandidate("k1", "A", "d", ts("2026-08-12 22:40:00")))
      q.processAllAvailable()
      assert(spark.table("alerts_ttl").count() == 102)
    } finally q.stop()
  }
}
