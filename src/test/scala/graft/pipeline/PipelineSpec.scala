package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hermetic end-to-end pipeline test over DemoFixtures — the SURVEY §7.1
  * minimum slice, exercising F1/F2, J1, T1, F5, K3 (all 5 levels), K2,
  * the hiring tiers, J5 merge rules, P3 report and F10 alerts.
  */
class PipelineSpec extends SparkSpec {

  private lazy val fx = DemoFixtures(spark)
  private lazy val store0 = DemoFixtures.initialStore(spark)
  private lazy val asOf = to_timestamp(lit(DemoFixtures.AsOf))
  private lazy val run1 = Pipeline.run(fx, store0, asOf)
  private lazy val batch1 = run1.batch.collect().map(r =>
    r.getAs[String]("company_name") -> r).toMap

  test("F1/F2 ingest filter: keywords, dash-normalization, recency, null dates") {
    val got = Stages.ingestFilter(fx.feedEntries, asOf, 7)
    val titles = got.select("title").collect().map(_.getString(0)).toSet
    // Cobalt: no keywords; Delta: stale (published 11 days before asOf)
    assert(!titles.exists(_.contains("Cobalt")))
    assert(!titles.exists(_.contains("Delta")))
    // Borg: en-dash title, context(seed)+money($/million), null date kept
    val borg = got.filter(col("url") === DemoFixtures.urlBorg).collect()
    assert(borg.length == 1)
    assert(borg.head.getAs[Double]("date_confidence") == 0.5)
    assert(got.count() == 10) // 12 entries - Cobalt - Delta
  }

  test("J1 dedup drops the already-stored Echo URL") {
    val ingested = Stages.ingestFilter(fx.feedEntries, asOf, 7)
    val fresh = Stages.dedupAgainstStore(ingested, store0)
    assert(ingested.count() == 10)
    assert(fresh.count() == 9)
    assert(fresh.filter(col("url") === DemoFixtures.urlEcho).count() == 0)
  }

  test("T1 safety limit takes the first N in (feed, ord) order") {
    val ingested = Stages.ingestFilter(fx.feedEntries, asOf, 7)
    val top3 = Stages.safetyLimit(ingested, 3).collect()
    assert(top3.length == 3)
    assert(top3.forall(_.getAs[String]("feed_source").endsWith("alpha")))
    assert(top3.map(_.getAs[Int]("ord")).toSeq == Seq(0, 1, 4))
  }

  test("F5 enrichment validity: empty body, missing body, null company dropped") {
    val names = run1.batch.select("company_name").collect().map(_.getString(0)).toSet
    // Foxtrot: empty body; Mike: no body row; Golf: null company
    assert(names == Set("Acme Labs", "Borg Systems Inc.", "Hotel Analytics",
      "Kilo", "Lima Corp", "Nova.ai"))
  }

  test("K3 resolution: one company per fallback level") {
    def res(c: String) = (
      batch1(c).getAs[String]("domain"),
      batch1(c).getAs[Double]("confidence"),
      batch1(c).getAs[String]("resolution_source"))
    // llm_explicit keeps the RAW url (main.py:82-84 — no normalization)
    assert(res("Acme Labs") == ("https://acme-labs.com", 0.98, "llm_explicit"))
    // press_release: first F8-surviving anchor (after relative/social/blocklist)
    assert(res("Borg Systems Inc.") == ("https://borgsystems.com", 0.92, "press_release"))
    // search: uddg unwrap + normalize
    assert(res("Hotel Analytics") == ("https://hotelanalytics.io", 0.85, "search"))
    // guess: .com 404/absent → .io reachable
    assert(res("Kilo") == ("https://kilo.io", 0.60, "guess"))
    // failed
    assert(res("Lima Corp") == (null, 0.0, "failed"))
    // guess with embedded TLD in the company name (Nova.ai → https://nova.ai)
    assert(res("Nova.ai") == ("https://nova.ai", 0.60, "guess"))
  }

  test("engine-side money normalization (parse_money in the enrich stage)") {
    assert(batch1("Acme Labs").getAs[Long]("amount_raised_usd") == 12000000L) // "$12M"
    assert(batch1("Hotel Analytics").getAs[Long]("amount_raised_usd") == 2000000L) // "$2,000,000"
    assert(batch1("Kilo").getAs[Long]("amount_raised_usd") == 8040000L) // "₹67 Cr" × 0.012
    assert(batch1("Lima Corp").isNullAt(
      batch1("Lima Corp").fieldIndex("amount_raised_usd"))) // "Undisclosed"
  }

  test("K2 LinkedIn fallback: company-page candidate wins, /in/ filtered") {
    assert(batch1("Borg Systems Inc.").getAs[String]("linkedin_url") ==
      "https://www.linkedin.com/company/borg-systems")
    // extractor-provided linkedin is kept (coalesce, not overwrite)
    assert(batch1("Acme Labs").getAs[String]("linkedin_url") ==
      "https://linkedin.com/company/acme-labs")
    assert(batch1("Hotel Analytics").getAs[String]("linkedin_url") == null)
  }

  test("hiring signal: careers priorities, providers, tiers A/B/C") {
    def h(c: String) = (
      batch1(c).getAs[String]("hiring_tier"),
      batch1(c).getAs[String]("ats_provider"),
      batch1(c).getAs[Int]("tech_roles"),
      batch1(c).getAs[String]("details"))
    // priority-1 ATS anchor → Greenhouse; 2 tech roles, 1 recent → A
    assert(h("Acme Labs") == ("A", "Greenhouse", 2, "recent_tech_roles=1 (≤14d)"))
    assert(batch1("Acme Labs").getAs[String]("careers_url") ==
      "https://boards.greenhouse.io/acmelabs")
    assert(batch1("Acme Labs").getAs[Int]("latest_posted_days") == 7)
    // priority-2 href hint → Internal; tech role with no dates → B
    assert(h("Borg Systems Inc.") == ("B", "Internal", 1, "tech_roles_present_but_not_recent"))
    assert(batch1("Borg Systems Inc.").getAs[String]("careers_url") ==
      "https://borgsystems.com/careers")
    // priority-3 text anchor → Internal; no jobs → C
    assert(h("Hotel Analytics") == ("C", "Internal", 0, "no_tech_roles_found"))
    // no anchors on homepage → no careers link
    assert(h("Kilo") == ("C", null, 0, "no_careers_link_found"))
    // unresolved domain
    assert(h("Lima Corp") == ("C", null, 0, "no_domain"))
    // Lever via priority-1; recent iOS job → A
    assert(h("Nova.ai") == ("A", "Lever", 1, "recent_tech_roles=1 (≤14d)"))
  }

  test("P5 console projection formats the reference's progress line") {
    val lines = Stages.consoleLines(run1.batch).collect().map(_.getString(0))
    val acme = lines.find(_.startsWith("Acme Labs")).get
    assert(acme == "Acme Labs                    | $12000000 | Series A | https://acme-labs.com  (conf=0.98, src=llm_explicit)")
  }

  test("rejected rows surface as a side output with reasons") {
    val rejects = run1.rejects.collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("reason")).toMap
    assert(rejects == Map(
      DemoFixtures.urlFox -> "empty_body",   // body ""
      DemoFixtures.urlMike -> "empty_body",  // no body row
      DemoFixtures.urlGolf -> "no_company")) // extractor found none
  }

  test("A7 stage counts come for free via observe metrics") {
    run1.batch.count() // any action over the batch fires the metrics
    assert(run1.observations("ingested").get("rows") == 10L)
    assert(run1.observations("fresh").get("rows") == 9L) // Echo deduped
  }

  test("J5 merge run 1: batch inserted, Echo untouched") {
    val store1 = run1.newStore
    assert(store1.count() == 7) // 6 new + Echo
    val echo = store1.filter(col("company_name") === "Echo Robotics").collect().head
    assert(echo.getAs[Long]("amount_raised_usd") == 5000000L)
    assert(echo.getAs[String]("hiring_tier") == "B")
  }

  test("P3 report: 15 columns, investors joined, defaults applied") {
    val rep = run1.report.collect().map(r => r.getAs[String]("company") -> r).toMap
    assert(run1.report.columns.length == 15)
    assert(rep("Acme Labs").getAs[String]("investors") == "Alpha Cap, Beta Fund")
    assert(rep("Lima Corp").getAs[Int]("tech_roles") == 0)
    assert(rep("Lima Corp").getAs[String]("domain") == null) // no domain, no website
    assert(rep("Acme Labs").getAs[String]("date_announced") == "2026-08-10")
    assert(rep("Acme Labs").getAs[String]("last_updated") == DemoFixtures.AsOf)
  }

  test("F10 alerts: tiers A/B only, Telegram message format") {
    val alerts = run1.alerts.collect().map(r => r.getAs[String]("company_name") -> r).toMap
    assert(alerts.keySet == Set("Acme Labs", "Borg Systems Inc.", "Nova.ai"))
    val msg = alerts("Acme Labs").getAs[String]("message")
    assert(msg.contains("<b>🔥 New Tier A Lead: Acme Labs</b>"))
    assert(msg.contains("<b>Amount:</b> $12,000,000"))
    assert(msg.contains("<b>Round:</b> Series A"))
    assert(msg.contains("<b>Signal:</b> recent_tech_roles=1"))
    assert(msg.contains("<a href='https://acme-labs.com'>Visit Website</a>"))
  }

  test("J5 merge run 2: COALESCE vs overwrite vs store-wins, null-key insert") {
    val fx2 = DemoFixtures.secondRun(spark)
    val asOf2 = to_timestamp(lit(DemoFixtures.AsOf2))
    val run2 = Pipeline.run(fx2, run1.newStore, asOf2)
    val store2 = run2.newStore

    val acme = store2.filter(col("company_name") === "Acme Labs").collect()
    assert(acme.length == 1) // same natural key → matched, not re-inserted
    val a = acme.head
    // COALESCE: batch amount NULL → keep 12M; linkedin NULL → keep run-1 value
    assert(a.getAs[Long]("amount_raised_usd") == 12000000L)
    assert(a.getAs[String]("linkedin_url") == "https://linkedin.com/company/acme-labs")
    // overwrite: investors replaced wholesale; last_seen advanced
    assert(a.getAs[Seq[String]]("investors").toList == List("New Fund"))
    assert(a.getAs[java.sql.Timestamp]("last_seen").toString.startsWith("2026-08-13"))
    // store-wins: country update ignored on conflict (absent from DO UPDATE)
    assert(a.getAs[String]("headquarter_country") == "USA")
    // source_url also store-wins
    assert(a.getAs[String]("source_url") == DemoFixtures.urlAcme)

    // Lima: funding_round NULL in the natural key → second row inserted
    assert(store2.filter(col("company_name") === "Lima Corp").count() == 2)
    assert(store2.count() == 8) // 7 + new Lima row; Acme matched in place
  }

  test("merge is idempotent on an unchanged re-run (except last_seen)") {
    val proj = Stages.storeProjection(run1.batch, asOf)
    val once = Stages.mergeIntoStore(store0, proj)
    val twice = Stages.mergeIntoStore(once, proj)
    // null-key rows (Lima) re-insert by design; all keyed rows must not
    val keyed = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("funding_round").isNotNull && col("announcement_date").isNotNull)
    assert(keyed(once).count() == keyed(twice).count())
    val a = keyed(once).orderBy("company_name", "source_url").collect().toSeq
    val b = keyed(twice).orderBy("company_name", "source_url").collect().toSeq
    assert(a == b)
  }
}
