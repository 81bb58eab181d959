package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Seen(url: String, ts: Timestamp)

/** Bounded-state streaming dedup: `dropDuplicatesWithinWatermark` keeps
  * per-key state only until the watermark passes it — the scale-native
  * alternative to the pipeline's reference-faithful unbounded anti-join
  * (whose seen-set grows forever). The contract pinned here: duplicates
  * inside the watermark window are suppressed; once the watermark
  * expires a key's state, the same key is emitted again.
  */
class StreamingDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicates within the watermark suppressed; state expires after it") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Seen]
    val out = in.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("url")

    val q = out.writeStream
      .format("memory").queryName("dedup_wm")
      .outputMode("append")
      .start()
    try {
      // batch 1: a url twice within the hour → one survivor
      in.addData(
        Seen("https://a/x", ts("2026-08-12 10:00:00")),
        Seen("https://a/x", ts("2026-08-12 10:20:00")),
        Seen("https://a/y", ts("2026-08-12 10:30:00")))
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() == 2)

      // batch 2: same url, still within watermark reach → suppressed
      in.addData(Seen("https://a/x", ts("2026-08-12 10:40:00")))
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() == 2)

      // batch 3: push the watermark far past the old state, then re-send
      in.addData(Seen("https://a/z", ts("2026-08-12 20:00:00")))
      q.processAllAvailable()
      in.addData(Seen("https://a/x", ts("2026-08-12 19:30:00")))
      q.processAllAvailable()
      // x's state (expiry 11:00) died when the watermark hit 19:00 —
      // the re-crawl of x is a NEW emission under bounded state
      assert(spark.table("dedup_wm").count() == 4)
    } finally q.stop()
  }
}
