package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured Streaming stateful aggregations (SURVEY §2.10): watermarked
  * tumbling windows (late rows beyond the watermark dropped) and
  * session_window gap sessions — the streaming twins of q16/q18.
  */
class StreamingWindowSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling window: in-order and late-but-allowed rows counted, too-late dropped") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("win"), $"event_type", $"n")

    val q = agg.writeStream
      .format("memory").queryName("tumble_out")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: two events in hour 10, one in hour 11
    stream.addData(
      Ev(ts("2026-08-12 10:05:00"), 1, "click", 1.0),
      Ev(ts("2026-08-12 10:45:00"), 2, "click", 1.0),
      Ev(ts("2026-08-12 11:10:00"), 1, "view", 1.0))
    q.processAllAvailable()

    // batch 2: advance the watermark far past hour 10, plus one too-late row
    stream.addData(
      Ev(ts("2026-08-12 14:00:00"), 3, "click", 1.0),
      Ev(ts("2026-08-12 10:50:00"), 4, "click", 1.0)) // beyond watermark later
    q.processAllAvailable()
    // batch 3: watermark is now 13:00 (14:00 - 1h) → hour-10/11 windows final
    stream.addData(Ev(ts("2026-08-12 15:30:00"), 5, "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("tumble_out")
      .collect().map(r => (r.getAs[Timestamp]("win").toString, r.getAs[String]("event_type")) -> r.getAs[Long]("n"))
      .toMap
    // hour-10 click window emitted once the watermark passed; the
    // 10:50 row of batch 2 arrived before the watermark advanced past
    // it (watermark updates AFTER a batch), so it still counted.
    assert(out(("2026-08-12 10:00:00.0", "click")) == 3)
    assert(out(("2026-08-12 11:00:00.0", "view")) == 1)
  }

  test("session_window: 30-minute gap sessions close after the watermark passes") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("s"), $"session_window.end".as("e"),
        $"user_id", $"n")

    val q = agg.writeStream
      .format("memory").queryName("session_out")
      .outputMode(OutputMode.Append())
      .start()

    // user 1: two events 10 min apart (one session), then a 40-min gap
    stream.addData(
      Ev(ts("2026-08-12 09:00:00"), 1, "click", 1.0),
      Ev(ts("2026-08-12 09:10:00"), 1, "click", 1.0),
      Ev(ts("2026-08-12 09:50:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // push the watermark far ahead so all sessions emit
    stream.addData(Ev(ts("2026-08-12 12:00:00"), 9, "view", 1.0))
    q.processAllAvailable()
    stream.addData(Ev(ts("2026-08-12 13:00:00"), 9, "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("session_out")
      .filter($"user_id" === 1)
      .orderBy($"s")
      .collect()
    assert(rows.length == 2) // the 40-min gap split the sessions
    assert(rows(0).getAs[Long]("n") == 2)
    assert(rows(0).getAs[Timestamp]("e").toString == "2026-08-12 09:40:00.0") // last event + gap
    assert(rows(1).getAs[Long]("n") == 1)
  }
}
