package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.pipeline.DemoFixtures
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class FeedEntry(feed_url: String, ord: Int, title: String, link: String,
    published_at: Option[Timestamp])

/** Three simulated cron runs through the streaming pipeline:
  * run 1 ingests, run 2 exercises cross-run dedup (same URL re-polled),
  * run 3 merges an update under the same natural key. SURVEY §5.2 item 5.
  */
class StreamingPipelineSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("3-run incremental pipeline: dedup across runs, merge update, alerts per batch") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val fx = DemoFixtures(spark)
    val sp = new StreamingPipeline(spark, fx,
      storeDir = s"$tmp/store", alertsDir = s"$tmp/alerts",
      asOf = DemoFixtures.AsOf)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[FeedEntry]
    val q = sp.start(stream.toDF(), s"$tmp/checkpoint")

    // ---- run 1: Acme (tier A) + Hotel (tier C)
    stream.addData(
      FeedEntry("https://feeds.example.com/alpha", 0,
        "Acme Labs raises $12M Series A", DemoFixtures.urlAcme, Some(ts("2026-08-10 08:00:00"))),
      FeedEntry("https://feeds.example.com/beta", 0,
        "Hotel Analytics nabs angel investment of $2 million", DemoFixtures.urlHotel,
        Some(ts("2026-08-12 06:00:00"))))
    q.processAllAvailable()

    val store1 = sp.loadStore()
    assert(store1.count() == 2)
    // tier partitioning prunes tier-filtered reads (idx_hiring_tier analogue)
    val pruned = store1.filter(col("hiring_tier") === "A")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(hiring_tier"), "expected partition pruning")
    assert(pruned.count() == 1)
    val alerts1 = spark.read.parquet(s"$tmp/alerts")
    assert(alerts1.count() == 1) // only Acme is tier A/B
    assert(alerts1.select("company_name").collect().head.getString(0) == "Acme Labs")

    // ---- run 2: Acme URL re-polled (must dedup), nothing else
    stream.addData(
      FeedEntry("https://feeds.example.com/alpha", 0,
        "Acme Labs raises $12M Series A", DemoFixtures.urlAcme, Some(ts("2026-08-10 08:00:00"))))
    q.processAllAvailable()

    val store2 = sp.loadStore()
    assert(store2.count() == 2) // unchanged
    assert(spark.read.parquet(s"$tmp/alerts").count() == 1) // no duplicate alert
    val acme2 = store2.filter(col("company_name") === "Acme Labs").collect().head
    assert(acme2.getAs[Seq[String]]("investors").toList == List("Alpha Cap", "Beta Fund"))

    // ---- run 3: new URL, same natural key, updated investors → merge
    val fx2 = DemoFixtures.secondRun(spark)
    val sp3 = new StreamingPipeline(spark, fx2,
      storeDir = s"$tmp/store", alertsDir = s"$tmp/alerts",
      asOf = DemoFixtures.AsOf2)
    val stream3 = MemoryStream[FeedEntry]
    val q3 = sp3.start(stream3.toDF(), s"$tmp/checkpoint3")
    stream3.addData(
      FeedEntry("https://feeds.example.com/alpha", 0,
        "Acme Labs raises $12M Series A - expanded coverage", DemoFixtures.urlAcme2,
        Some(ts("2026-08-10 09:30:00"))))
    q3.processAllAvailable()
    q3.stop()
    q.stop()

    val store3 = sp3.loadStore()
    assert(store3.count() == 2) // merged in place, no new row
    val acme3 = store3.filter(col("company_name") === "Acme Labs").collect().head
    assert(acme3.getAs[Seq[String]]("investors").toList == List("New Fund")) // overwrite
    assert(acme3.getAs[Long]("amount_raised_usd") == 12000000L) // coalesce kept
    assert(spark.read.parquet(s"$tmp/alerts").count() == 2) // new article → new alert
  }

  test("Trigger.AvailableNow: drains queued input, runs the batch, then stops itself") {
    val tmp = Files.createTempDirectory("graft-stream-an").toString
    val fx = DemoFixtures(spark)
    val sp = new StreamingPipeline(spark, fx,
      storeDir = s"$tmp/store", alertsDir = s"$tmp/alerts",
      asOf = DemoFixtures.AsOf)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[FeedEntry]
    // data queued BEFORE the query starts — the scheduled-cron-run shape:
    // each invocation drains what accumulated and terminates
    stream.addData(
      FeedEntry("https://feeds.example.com/alpha", 0,
        "Acme Labs raises $12M Series A", DemoFixtures.urlAcme, Some(ts("2026-08-10 08:00:00"))))
    val q = sp.start(stream.toDF(), s"$tmp/checkpoint", availableNow = true)
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(sp.loadStore().count() == 1)
    assert(spark.read.parquet(s"$tmp/alerts").count() == 1)
  }

  test("alert push sink delivers at least once across a failed batch (W3 live half)") {
    import graft.sources.{PushSinksSpec => _, RecordingPoster}
    val tmp = Files.createTempDirectory("graft-stream-push").toString
    val fx = DemoFixtures(spark)
    RecordingPoster.reset()
    // the POST attempt in batch 0 dies on the wire → the batch fails
    // AFTER the durable alert append → the restarted query replays the
    // batch and re-delivers: at-least-once outward, never lost
    RecordingPoster.failuresToInject.set(1)
    def pipeline() = new StreamingPipeline(spark, fx,
      storeDir = s"$tmp/store", alertsDir = s"$tmp/alerts",
      asOf = DemoFixtures.AsOf,
      alertPush = Some((new RecordingPoster, "https://api.test/bot/sendMessage", "chat42")))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[FeedEntry]
    stream.addData(
      FeedEntry("https://feeds.example.com/alpha", 0,
        "Acme Labs raises $12M Series A", DemoFixtures.urlAcme, Some(ts("2026-08-10 08:00:00"))))
    val q1 = pipeline().start(stream.toDF(), s"$tmp/checkpoint")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(!q1.isActive)

    val q2 = pipeline().start(stream.toDF(), s"$tmp/checkpoint") // the retry
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val bodies = RecordingPoster.sent.asScala.map(_._2).toSeq
    assert(bodies.nonEmpty && bodies.forall(_.contains("Acme Labs")), bodies)
    assert(bodies.head.contains("\"parse_mode\":\"HTML\""), bodies.head)
    // the replayed batch OVERWRITES its own (query, batch) alert
    // partition rather than appending a duplicate: outward delivery is
    // at-least-once, but alertsDir itself stays effectively-once
    assert(spark.read.parquet(s"$tmp/alerts").count() == 1)
    assert(sp_storeCount(s"$tmp/store") == 1)
  }

  private def sp_storeCount(dir: String): Long =
    spark.read.parquet(dir).count()
}
