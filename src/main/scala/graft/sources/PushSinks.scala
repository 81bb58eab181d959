package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}

/** Outbound POST sinks — the side-effecting twins of the fixture-backed
  * alert/report appends in [[graft.pipeline.Stages]] (W2/W3; reference
  * `app/publish/telegram_alerts.py:10-55` and
  * `app/publish/to_gsheet.py:71-118`).
  *
  * Same cluster rules as the GET adapters in [[HttpAdapters]]:
  * politeness is a per-executor-JVM token bucket resolved through the
  * static [[HttpAdapters.limiterFor]] registry (never captured in a
  * closure), and the poster is an interface so tests and offline builds
  * plug a fixture in where production plugs the live transport.
  *
  * DELIVERY SEMANTICS — a deliberate upgrade over the reference: the
  * reference fire-and-forgets (a failed `requests.post` prints a
  * warning and the alert is lost, telegram_alerts.py:49-55). Here a
  * non-2xx/transport failure THROWS, which fails the task, which makes
  * Spark retry it — so every alert/report row is delivered AT LEAST
  * once (duplicates possible on retry, loss not). Consumers that need
  * exactly-once must dedup downstream on a natural key, e.g. the
  * telegram message text, exactly as [[graft.streaming.AlertOnce]]
  * already dedups alert candidates upstream.
  */
object PushSinks {

  /** Transport interface: POST `jsonBody` to `url`, return the HTTP
    * status; throw on transport errors. Serializable so writers can
    * carry it to executors.
    */
  trait HttpPoster extends Serializable {
    def post(url: String, jsonBody: String): Int
  }

  /** Live JSON POST over java.net.http, rate-limited via the shared
    * per-JVM bucket `name` (same registry as the GET adapters, so an
    * alert POST and a HEAD probe against the same API can even share a
    * bucket by using the same name).
    */
  class LivePoster(name: String, perSecond: Double, timeoutSec: Int = 5)
      extends HttpPoster {
    @transient private lazy val client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSec)).build()
    override def post(url: String, jsonBody: String): Int = {
      HttpAdapters.limiterFor(name, perSecond).acquire()
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(timeoutSec))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(jsonBody))
        .build()
      client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode()
    }
  }

  /** Minimal JSON string escape (quote, backslash, control chars). */
  def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case '\n'           => "\\n"
      case '\r'           => "\\r"
      case '\t'           => "\\t"
      case c if c < ' '   => f"\\u${c.toInt}%04x"
      case c              => c.toString
    } + "\""

  /** Telegram sendMessage payload for one alert row — field-for-field
    * the reference's (telegram_alerts.py:41-46). The `message` column
    * comes pre-formatted from [[graft.pipeline.Stages.alertRows]].
    */
  def telegramPayload(chatId: String, message: String): String =
    s"""{"chat_id":${jsonStr(chatId)},"text":${jsonStr(message)},""" +
      s""""parse_mode":"HTML","disable_web_page_preview":true}"""

  /** Streaming alert sink: one POST per alert row (the reference also
    * posts row-at-a-time). Wire it as `writeStream.foreach(...)` after
    * [[graft.streaming.AlertOnce]] — dedup first, then deliver.
    * Non-2xx fails the task → Spark retries → at-least-once.
    */
  class AlertPostWriter(poster: HttpPoster, apiUrl: String, chatId: String)
      extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(row: Row): Unit = {
      val status =
        poster.post(apiUrl, telegramPayload(chatId, row.getAs[String]("message")))
      if (status < 200 || status >= 300)
        throw new IllegalStateException(
          s"alert POST failed with HTTP $status (will retry for at-least-once)")
    }
    override def close(errorOrNull: Throwable): Unit = ()
  }

  /** Report append push: POSTs the 15-column sheet rows (the
    * [[graft.pipeline.Stages.sheetRows]] projection) as
    * `{"values": [[...], ...]}` chunks — the append_rows shape
    * (to_gsheet.py:115). Runs on the EXECUTORS via foreachPartition:
    * each partition posts its rows in `chunk`-sized batches through the
    * shared rate limiter, so the driver never collects the report and
    * the aggregate rate is bounded per JVM. Use from `foreachBatch` for
    * streaming, or directly on a batch report.
    *
    * Values serialize as JSON strings/numbers by runtime type, null →
    * "" (the sheet shows a blank cell, like the reference's
    * USER_ENTERED append of None).
    */
  def pushReport(report: DataFrame, poster: HttpPoster, url: String,
                 chunk: Int = 100): Unit = {
    require(chunk > 0, "chunk must be positive")
    report.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(chunk).foreach { grp =>
        val values = grp.map { r =>
          (0 until r.length).map { i =>
            r.get(i) match {
              case null                => "\"\""
              // NaN/Infinity are not JSON tokens; a blank cell (like a
              // null) beats a permanently-4xx-ing payload on every retry
              case d: java.lang.Double if d.isNaN || d.isInfinite => "\"\""
              case f: java.lang.Float if f.isNaN || f.isInfinite  => "\"\""
              case n: java.lang.Number => n.toString
              case b: java.lang.Boolean => b.toString
              case other               => jsonStr(other.toString)
            }
          }.mkString("[", ",", "]")
        }.mkString("[", ",", "]")
        val status = poster.post(url, s"""{"values":$values}""")
        if (status < 200 || status >= 300)
          throw new IllegalStateException(
            s"report POST failed with HTTP $status (will retry for at-least-once)")
      }
    }
  }
}
