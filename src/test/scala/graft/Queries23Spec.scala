package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Structural oracles for the round-16 co-location measurement and the
  * line-curation queries (DuckDB parity runs separately via Verify).
  */
class Queries23Spec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-q23s").toString
    val docs = (0 until 80).map { i =>
      val own = (0 until 14).map(w => s"w${i}x$w").mkString(" ")
      (i.toLong, own, "en", "s1")
    }
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val embs = (0 until 80).map { i =>
      val v = Array.tabulate(64) { k =>
        (math.sin(i * 64 + k + 1) * 0.3).toFloat
      }
      (i.toLong, v, i % 3)
    }
    embs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("q169: OR-composed tables dominate one table; every mode is " +
    "bounded by possible") {
    val m = SparkEntry.queries("q169_shard_colocation")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(m.keySet == Set("c_planes2_t1", "c_planes2_t2", "id_shards4"),
      m.keySet)
    m.foreach { case (mode, (co, possible)) =>
      assert(co >= 0L && co <= possible, s"$mode: $co / $possible")
      assert(possible == 64L, s"$mode: possible $possible")
    }
    // a pair co-located by table 0 stays co-located when table 1 is
    // OR-ed in — t2 can never lose a pair t1 had
    assert(m("c_planes2_t2")._1 >= m("c_planes2_t1")._1,
      s"OR-composition lost pairs: $m")
  }

  test("q170: every doc removes AT LEAST its planted copies " +
    "(1 + doc_id mod 3) and the cleaned text is stable") {
    val out = SparkEntry.queries("q170_line_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.length == 80)
    out.foreach { case (id, nLines, nRemoved, md5) =>
      val planted = 1 + id % 3
      assert(nRemoved >= planted,
        s"doc $id: removed $nRemoved < planted $planted")
      assert(nRemoved < nLines, s"doc $id: at least one line survives")
      assert(md5.length == 32, s"doc $id: md5 '$md5'")
    }
  }

  test("q171: every even doc scrubs at least the banner; odd docs " +
    "with no organic boilerplate scrub nothing") {
    val out = SparkEntry.queries("q171_boilerplate_scrub")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 80)
    out.foreach { case (id, n) =>
      if (id % 2 == 0) assert(n >= 1L, s"even doc $id must scrub the banner")
      // this fixture's docs share no organic 6-token lines (distinct
      // vocab per doc), so odd docs are exactly untouched
      else assert(n == 0L, s"odd doc $id scrubbed $n lines")
    }
  }

  test("q172: per-table co-location decays with planes; the tables " +
    "dial is monotone; p2_t1 equals q169's c_planes2_t1 row") {
    val dial = SparkEntry.queries("q172_shard_depth_dial")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dial.keySet == Set("p2_t1", "p4_t1", "p6_t1", "p6_t2",
      "p6_t4"), dial.keySet)
    // deeper single-table codes can only lose pairs (a p-plane
    // agreement is a PREFIX condition of the (p+2)-plane agreement on
    // the same family slice only for table 0 — the general monotone
    // claim is statistical, but the tables dial at fixed planes is
    // monotone by construction)
    assert(dial("p6_t1") <= dial("p6_t2") && dial("p6_t2") <= dial("p6_t4"),
      s"tables dial must be monotone at fixed depth: $dial")
    val q169row = SparkEntry.queries("q169_shard_colocation")(spark, dir)
      .filter($"mode" === "c_planes2_t1")
      .collect()(0).getLong(1)
    assert(dial("p2_t1") == q169row,
      s"q172 p2_t1 ${dial("p2_t1")} != q169 c_planes2_t1 $q169row")
  }

  test("q173: the savings ledger balances — lines_after = before - " +
    "boilerplate - dups, chars only shrink, and the banner count " +
    "matches the even-doc plant") {
    val r = SparkEntry.queries("q173_curation_savings")(spark, dir)
      .collect()
    assert(r.length == 1, "the spec fixture has one source")
    val row = r(0)
    val (docs, lb, cb, boiler, dups, la, ca) = (row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6), row.getLong(7))
    assert(docs == 80L)
    assert(la == lb - boiler - dups, s"ledger must balance: $row")
    assert(ca <= cb, s"curation can only shrink: $row")
    // the fixture plants the banner on the 40 even doc_ids, and its
    // distinct-vocab docs have no organic boilerplate or dups
    assert(boiler == 40L, s"banner count: $row")
    assert(dups == 0L, s"no dups in the distinct-vocab fixture: $row")
  }

  test("q173 linesAfter: a doc scrubbed to EMPTY counts 0 lines, not " +
    "split(\"\")'s phantom 1 — the oracle-divergence edge the fixture " +
    "never exercises") {
    val out = Seq("", "a\nb\na", "solo")
      .toDF("text")
      .select(Queries23.linesAfter($"text").as("la"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 2L, 1L),
      s"empty → 0 (DuckDB len([]) parity), dup collapses, solo is 1: $out")
  }
}
