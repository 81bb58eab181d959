package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import graft.sources.PushSinks._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Fixture poster with JVM-static state (local-mode tasks share the
  * JVM, so executor-side posts are observable from the test): records
  * every delivered body and can inject N transport failures to
  * simulate a flaky API — the at-least-once retry path.
  */
object RecordingPoster {
  val sent = new ConcurrentLinkedQueue[(String, String)]()
  val failuresToInject = new AtomicInteger(0)
  def reset(): Unit = { sent.clear(); failuresToInject.set(0) }
}
class RecordingPoster extends HttpPoster {
  override def post(url: String, jsonBody: String): Int = {
    if (RecordingPoster.failuresToInject.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new java.io.IOException("simulated transport failure")
    RecordingPoster.sent.add((url, jsonBody))
    200
  }
}

case class AlertRow(company_name: String, hiring_tier: String, message: String)

/** Outbound POST sinks: at-least-once alert delivery across a simulated
  * retry, chunked report append payloads, and the live poster against a
  * local JDK HttpServer (rate-limited, no egress).
  */
class PushSinksSpec extends SparkSpec {

  test("alert writer delivers every alert at least once across a simulated retry") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    RecordingPoster.reset()
    // first POST attempt dies on the wire → the foreach task throws →
    // the batch is NOT committed to the checkpoint → the restarted
    // query replays the whole epoch → both alerts still arrive
    // (possibly duplicated: at-least-once, never lost — the reference
    // would have dropped the alert on the floor here)
    RecordingPoster.failuresToInject.set(1)

    val in = MemoryStream[AlertRow]
    val tmp = java.nio.file.Files.createTempDirectory("graft-push").toString
    def startQuery() = in.toDF().writeStream
      .foreach(new AlertPostWriter(new RecordingPoster, "https://api.test/send", "chat42"))
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()

    val q1 = startQuery()
    in.addData(
      AlertRow("Acme Labs", "A", "<b>🔥 New Tier A Lead: Acme Labs</b>"),
      AlertRow("Nova.ai", "B", "<b>🔥 New Tier A Lead: Nova.ai</b>"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(!q1.isActive) // the injected failure killed the first attempt

    val q2 = startQuery() // restart = the retry; epoch replays from ckpt
    q2.processAllAvailable()
    q2.stop()

    val bodies = RecordingPoster.sent.asScala.map(_._2).toSeq
    // at-least-once: no alert lost; duplicates from the retried task OK
    assert(bodies.exists(_.contains("Acme Labs")), bodies)
    assert(bodies.exists(_.contains("Nova.ai")), bodies)
    // payload is the reference's sendMessage shape
    assert(bodies.head.contains("\"chat_id\":\"chat42\"") &&
      bodies.head.contains("\"parse_mode\":\"HTML\"") &&
      bodies.head.contains("\"disable_web_page_preview\":true"), bodies.head)
  }

  test("report push posts chunked append_rows payloads from the executors") {
    import spark.implicits._
    RecordingPoster.reset()
    val report = Seq(
      ("Acme Labs", 12000000L, "Series A"),
      ("Nova.ai", 4000000L, "Seed"),
      ("Kilo", 8040000L, "Series B"))
      .toDF("company", "amount_usd", "round")
      .withColumn("linkedin", lit(null).cast("string"))
      .coalesce(1)
    pushReport(report, new RecordingPoster, "https://sheets.test/append", chunk = 2)

    val bodies = RecordingPoster.sent.asScala.map(_._2).toSeq
    assert(bodies.size == 2, bodies) // 3 rows, chunk=2 → 2 posts
    val all = bodies.mkString
    assert(all.contains("\"Acme Labs\",12000000,\"Series A\",\"\""), all)
    assert(all.contains("\"Nova.ai\",4000000,\"Seed\""), all)
    assert(bodies.forall(_.startsWith("""{"values":[[""")), bodies)
  }

  test("live poster POSTs JSON to a real endpoint through the rate limiter") {
    val got = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/bot/sendMessage", (x: HttpExchange) => {
      got.add(new String(x.getRequestBody.readAllBytes(), "UTF-8"))
      x.sendResponseHeaders(200, 2)
      x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/bot/sendMessage"
      val poster = new LivePoster("testAlert", perSecond = 50.0)
      val status = poster.post(url,
        telegramPayload("chat42", "<b>Line1</b>\n\"quoted\""))
      assert(status == 200)
      val body = got.asScala.head
      assert(body.contains("\\n") && body.contains("\\\"quoted\\\""), body)
      // non-2xx propagates as a status for the writer to escalate on
      server.createContext("/gone", (x: HttpExchange) => {
        x.sendResponseHeaders(410, -1); x.close()
      })
      val s2 = poster.post(
        s"http://127.0.0.1:${server.getAddress.getPort}/gone", "{}")
      assert(s2 == 410)
    } finally server.stop(0)
  }
}
