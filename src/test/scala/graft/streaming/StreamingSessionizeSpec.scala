package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class SessEv(ts: Timestamp, user_id: Long)

/** [[StreamingSessionize]]: the streamed closed sessions must equal the
  * batch [[graft.operators.Sessionize]] sessions over the concatenated
  * stream — the StreamingTransitions-style batch-parity pin, across
  * multiple micro-batches and an OUT-OF-ORDER (within-watermark)
  * straggler that must MERGE two provisional sessions into one, not
  * split or drop.
  */
class StreamingSessionizeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("closed sessions equal the batch sessionization of the " +
    "concatenated stream; a within-watermark straggler merges sessions") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SessEv]
    val q = StreamingSessionize
      .sessions(stream.toDF(), "user_id", "ts",
        gap = "30 minutes", watermarkDelay = "45 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append())
      .start()

    val events = Seq(
      // user 1, session A: 09:00, 09:20 (straggler), 09:40 — gaps of
      // 20 min chain the three into ONE session; without the straggler
      // the 40-min 09:00→09:40 gap would read as TWO sessions
      SessEv(ts("2026-08-12 09:00:00"), 1L),
      SessEv(ts("2026-08-12 09:20:00"), 1L),
      SessEv(ts("2026-08-12 09:40:00"), 1L),
      // user 1, session B: 50 min after session A's last event
      SessEv(ts("2026-08-12 10:30:00"), 1L),
      // user 2: a single-event session
      SessEv(ts("2026-08-12 09:05:00"), 2L))
    // batch 1: 09:00 and 09:40 land as two provisional sessions
    stream.addData(events(0), events(2), events(4))
    q.processAllAvailable()
    // batch 2: the 09:20 straggler (earlier than the 09:40 already
    // seen; the watermark is 09:40−45min = 08:55, so it is admitted)
    // must MERGE the two provisional sessions; 10:30 opens session B
    stream.addData(events(1), events(3))
    q.processAllAvailable()
    // flush: a sentinel far in the future advances the watermark past
    // every real session's end; one more batch lets them emit
    stream.addData(SessEv(ts("2026-08-12 23:00:00"), 99L))
    q.processAllAvailable()
    stream.addData(SessEv(ts("2026-08-12 23:00:01"), 99L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_out")
      .filter($"user_id" =!= 99L)
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString,
        r.getAs[Timestamp]("session_end").toString,
        r.getAs[Long]("n_events")))
      .toSet

    // batch truth: Sessionize.assign over the concatenated events, each
    // session ending gap after its last event (the session_window
    // convention)
    val batchSessions = graft.operators.Sessionize
      .assign(events.toDF(), $"user_id", $"ts", $"ts", gapSeconds = 1800)
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"),
        (max($"ts") + expr("INTERVAL 30 MINUTES")).as("session_end"),
        count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString,
        r.getAs[Timestamp]("session_end").toString,
        r.getAs[Long]("n_events")))
      .toSet

    assert(streamed == batchSessions,
      s"streamed $streamed != batch $batchSessions")
    // the straggler merged: user 1's first session spans 09:00-10:10
    // (end = 09:40 + gap) with 3 events, not two split fragments
    assert(streamed.contains(
      (1L, "2026-08-12 09:00:00.0", "2026-08-12 10:10:00.0", 3L)))
  }
}
