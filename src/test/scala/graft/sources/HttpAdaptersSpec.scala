package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drives the live HTTP adapters against a local JDK HttpServer —
  * hermetic, zero egress.
  */
class HttpAdaptersSpec extends SparkSpec {

  private def withServer(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/article", (x: HttpExchange) => {
      val body =
        """<html><head><title>t</title></head><body>
          |<div>nav junk</div>
          |<p>Acme Labs raised <b>$12M</b>.</p>
          |<p>The round was led by Alpha Cap.</p>
          |</body></html>""".stripMargin
      val bytes = body.getBytes("UTF-8")
      x.sendResponseHeaders(200, bytes.length)
      x.getResponseBody.write(bytes); x.close()
    })
    server.createContext("/missing", (x: HttpExchange) => {
      x.sendResponseHeaders(404, -1); x.close()
    })
    server.createContext("/ok", (x: HttpExchange) => {
      x.sendResponseHeaders(200, -1); x.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("fetchArticleText extracts paragraph text; 404 and bad URLs yield null") {
    withServer { base =>
      val limiter = new HttpAdapters.RateLimiter(100.0)
      val text = HttpAdapters.fetchArticleText(s"$base/article", 5, 1800, limiter)
      assert(text == "Acme Labs raised $12M. The round was led by Alpha Cap.")
      assert(HttpAdapters.fetchArticleText(s"$base/missing", 5, 1800, limiter) == null)
      assert(HttpAdapters.fetchArticleText("http://127.0.0.1:1/nope", 1, 1800, limiter) == null)
      // truncation honors the reference's 1800-char bound
      val short = HttpAdapters.fetchArticleText(s"$base/article", 5, 10, limiter)
      assert(short == "Acme Labs ")
    }
  }

  test("headOk distinguishes reachable from missing") {
    withServer { base =>
      val limiter = new HttpAdapters.RateLimiter(100.0)
      assert(HttpAdapters.headOk(s"$base/ok", 5, limiter))
      assert(!HttpAdapters.headOk(s"$base/missing", 5, limiter))
      assert(!HttpAdapters.headOk("http://127.0.0.1:1/nope", 1, limiter))
    }
  }

  test("the UDF adapter runs distributed and is marked nondeterministic") {
    withServer { base =>
      import spark.implicits._
      val fetch = HttpAdapters.fetchArticleUdf(perSecond = 50.0)
      val df = Seq(s"$base/article", s"$base/missing")
        .toDF("url").repartition(2)
        .withColumn("body", fetch(col("url")))
      val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(rows(s"$base/article").startsWith("Acme Labs raised"))
      assert(rows(s"$base/missing") == null)
      // nondeterministic: Catalyst must not reorder it below filters
      val analyzed = df.queryExecution.analyzed.toString
      assert(analyzed.contains("UDF"))
    }
  }

  test("rate limiter paces calls") {
    val limiter = new HttpAdapters.RateLimiter(perSecond = 20.0) // 50 ms apart
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => limiter.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 190, s"5 acquires at 20/s must take ≥200ms, took $elapsedMs")
  }
}
