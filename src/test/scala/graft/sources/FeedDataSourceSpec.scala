package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.Stages
import org.apache.spark.sql.functions._

class FeedDataSourceSpec extends SparkSpec {

  private def writeFixtures(dir: java.nio.file.Path): Unit = {
    Files.writeString(dir.resolve("alpha.xml"),
      """<?xml version="1.0"?>
        |<rss version="2.0"><channel>
        |  <title>Alpha Funding News</title>
        |  <link>https://feeds.example.com/alpha</link>
        |  <item><title>Acme Labs raises $12M Series A</title>
        |    <link>https://news.example.com/acme-raises</link>
        |    <pubDate>Mon, 10 Aug 2026 08:00:00 GMT</pubDate></item>
        |  <item><title>Cobalt Q3 earnings beat expectations</title>
        |    <link>https://news.example.com/cobalt</link>
        |    <pubDate>not a real date</pubDate></item>
        |</channel></rss>""".stripMargin)
    Files.writeString(dir.resolve("beta.xml"),
      """<?xml version="1.0"?>
        |<feed xmlns="http://www.w3.org/2005/Atom">
        |  <title>Beta VC Feed</title>
        |  <link href="https://feeds.example.com/beta"/>
        |  <entry><title>Foxtrot bags seed money</title>
        |    <link href="https://news.example.com/foxtrot-bags"/>
        |    <updated>2026-08-09T00:00:00Z</updated></entry>
        |</feed>""".stripMargin)
  }

  test("reads RSS 2.0 and Atom files with document order and date fallbacks") {
    val dir = Files.createTempDirectory("graft-feeds")
    writeFixtures(dir)

    val df = spark.read.format("feed").load(dir.toString)
    assert(df.schema == FeedDataSource.Schema)
    val rows = df.orderBy("feed_url", "ord").collect()
    assert(rows.length == 3)

    val acme = rows(0)
    assert(acme.getAs[String]("feed_url") == "https://feeds.example.com/alpha")
    assert(acme.getAs[Int]("ord") == 0)
    assert(acme.getAs[String]("title") == "Acme Labs raises $12M Series A")
    assert(acme.getAs[java.sql.Timestamp]("published_at").toString
      .startsWith("2026-08-10 08:00:00"))
    // unparseable pubDate → null timestamp (kept downstream at conf 0.5)
    assert(rows(1).isNullAt(rows(1).fieldIndex("published_at")))
    // Atom entry
    assert(rows(2).getAs[String]("feed_url") == "https://feeds.example.com/beta")
    assert(rows(2).getAs[String]("link") == "https://news.example.com/foxtrot-bags")
  }

  test("one input partition per feed file") {
    val dir = Files.createTempDirectory("graft-feeds2")
    writeFixtures(dir)
    val df = spark.read.format("feed").load(dir.toString)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("feeds flow straight into the ingest filter") {
    val dir = Files.createTempDirectory("graft-feeds3")
    writeFixtures(dir)
    val feed = spark.read.format("feed").load(dir.toString)
    val got = Stages.ingestFilter(feed,
      to_timestamp(lit("2026-08-12 12:00:00")), daysBack = 7)
    val titles = got.select("title").collect().map(_.getString(0)).toSet
    // Cobalt fails the keyword gate; Acme + Foxtrot pass
    assert(titles == Set("Acme Labs raises $12M Series A", "Foxtrot bags seed money"))
    // null-date row came through the RSS parse, not the fixtures
    assert(got.filter(col("date_confidence") === 0.5).count() == 0)
  }
}
