package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class ViewEv(user_id: Long, ts: Timestamp)
case class BuyEv(user_id: Long, ts: Timestamp, amount: Double)

/** Stream-stream interval joins ([[StreamingJoins.intervalJoin]]):
  * watermark-bounded conversion attribution. Pins the two semantics
  * that matter at scale — the horizon actually cuts (no unbounded
  * buffering), and left-outer null-extension waits for the watermark
  * proof instead of emitting eagerly.
  */
class StreamingJoinsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner interval join: purchases attribute only within the horizon, matches emit eagerly") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[ViewEv]
    val buys = MemoryStream[BuyEv]
    val joined = StreamingJoins.intervalJoin(
        views.toDF(), buys.toDF(), "user_id", "10 minutes", "30 minutes")
      .select(col("l.user_id").as("uid"), col("l.ts").as("view_ts"),
        col("r.ts").as("buy_ts"), col("amount"))

    val q = joined.writeStream
      .format("memory").queryName("attr_inner")
      .outputMode(OutputMode.Append())
      .start()

    views.addData(
      ViewEv(1, ts("2026-08-12 10:00:00")),
      ViewEv(2, ts("2026-08-12 10:05:00")))
    buys.addData(
      BuyEv(1, ts("2026-08-12 10:20:00"), 5.0), // 20 min after view → match
      BuyEv(2, ts("2026-08-12 10:50:00"), 7.0), // 45 min after view → outside horizon
      BuyEv(3, ts("2026-08-12 10:10:00"), 9.0)) // no view at all
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attr_inner").collect()
      .map(r => (r.getAs[Long]("uid"), r.getAs[Timestamp]("buy_ts").toString,
        r.getAs[Double]("amount")))
    assert(out.toSeq == Seq((1L, "2026-08-12 10:20:00.0", 5.0)))
  }

  test("left-outer interval join: unmatched views null-extend only after the watermark proof") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[ViewEv]
    val buys = MemoryStream[BuyEv]
    val joined = StreamingJoins.intervalJoin(
        views.toDF(), buys.toDF(), "user_id", "10 minutes", "30 minutes",
        joinType = "left_outer")
      .select(col("l.user_id").as("uid"), col("amount"))

    val q = joined.writeStream
      .format("memory").queryName("attr_outer")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: u1 converts, u2 does not
    views.addData(
      ViewEv(1, ts("2026-08-12 10:00:00")),
      ViewEv(2, ts("2026-08-12 10:05:00")))
    buys.addData(BuyEv(1, ts("2026-08-12 10:20:00"), 5.0))
    q.processAllAvailable()

    // u2's null row must NOT have emitted yet: the watermark cannot yet
    // prove no purchase will arrive inside [10:05, 10:35]
    val early = spark.table("attr_outer").collect().map(_.getAs[Long]("uid"))
    assert(early.toSeq == Seq(1L),
      s"outer row emitted before the watermark proof: ${early.toSeq}")

    // batch 2 advances both watermarks past 10:35 + delay; batch 3 lets
    // the eviction-time emission surface (outer rows emit on the batch
    // AFTER the watermark advances)
    views.addData(ViewEv(9, ts("2026-08-12 12:00:00")))
    buys.addData(BuyEv(8, ts("2026-08-12 12:00:00"), 1.0))
    q.processAllAvailable()
    views.addData(ViewEv(10, ts("2026-08-12 12:30:00")))
    buys.addData(BuyEv(7, ts("2026-08-12 12:30:00"), 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attr_outer").collect()
      .map(r => (r.getAs[Long]("uid"),
        if (r.isNullAt(1)) null else r.getAs[Double]("amount")))
      .toSet
    assert(out.contains((1L, 5.0)), s"matched row missing: $out")
    assert(out.contains((2L, null)),
      s"unmatched view must null-extend after the watermark passes: $out")
  }
}
