package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Hand-computed oracles for the round-11 part-5 queries (the DuckDB
  * parity gate runs separately via Verify): Zipf OLS on a constructed
  * perfect power law, ingest novelty on a copied source, MinHash
  * calibration on an exact duplicate pair, and the MMR greedy on a
  * pool where diversity and relevance disagree.
  */
class Queries11Spec extends SparkSpec {

  /** Write a synthetic documents table and return its dir. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q11s").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q116: perfect 12/rank power law fits slope -1, vocab counted") {
    // freqs 12, 6, 4, 3 = 12/rank: ln freq = ln 12 - 1 * ln rank exactly
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val dir = docsDir(Seq((1L, text, "en", "s1")))
    val out = SparkEntry.queries("q116_zipf_fit")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 4L, "vocab")
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-5, s"slope ${r.getDouble(2)}")
  }

  test("q117: re-serving scores zero; within-source repeats don't deflate") {
    val t1 = "alpha beta gamma delta epsilon"
    val t2 = "zeta eta theta iota kappa"
    val dir = docsDir(Seq(
      (1L, t1, "en", "s1"), (2L, t2, "en", "s1"),
      (3L, t1, "en", "s2"), // exact re-serve, ingested later
      (4L, t1, "en", "s1"))) // s1's own internal repeat
    val out = SparkEntry.queries("q117_ingest_novelty")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // counts are DISTINCT-gram level: s1's repeat of its own content
    // leaves novelty at 1.0 (the metric judges content, not volume)
    assert(out("s1") == ((3L, 6L, 6L, 1.0)))
    assert(out("s2") == ((1L, 3L, 0L, 0.0)))
  }

  test("q118: an exact duplicate pair calibrates to est=exact=1, err=0") {
    val t1 = "alpha beta gamma delta epsilon zeta"
    val dir = docsDir(Seq(
      (1L, t1, "en", "s1"), (2L, t1, "en", "s1"),
      (3L, "one two three four five six", "en", "s1")))
    val out = SparkEntry.queries("q118_minhash_calibration")(spark, dir)
      .collect()
    val dup = out.filter(_.getLong(0) == 8L)
    assert(dup.length == 1, out.mkString("; "))
    val r = dup.head
    assert(r.getLong(1) >= 1L, "at least the identical pair")
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 &&
      r.getDouble(4) == 0.0, r.toString)
  }

  test("MMR demotes a near-duplicate of an already-picked item") {
    import spark.implicits._
    val pool = Seq(
      (1L, Seq(1f, 0f), 0.9),  // most relevant
      (2L, Seq(1f, 0f), 0.89), // duplicate direction of 1
      (3L, Seq(0f, 1f), 0.5))  // orthogonal, less relevant
      .toDF("vec_id", "embedding", "rel")
    val out = Retrieval.mmrRerank(pool, "vec_id", "embedding", "rel",
      k = 3, lambda = 0.7).orderBy($"pick_rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L),
      out.mkString("; "))
    // hand-checked scores: pick1 = .7*.9; pick2 = .7*.5 - .3*0 (orthogonal
    // beats the duplicate's .7*.89 - .3*1); pick3 = the demoted duplicate
    assert(out(0).getDouble(4) == 0.63)
    assert(out(1).getDouble(4) == 0.35)
    assert(out(2).getDouble(4) == 0.323)
    assert(out(2).getDouble(3) == 1.0, "duplicate's max_sim to picked set")
  }

  test("MMR with lambda=1 is pure relevance order") {
    import spark.implicits._
    val pool = Seq(
      (1L, Seq(1f, 0f), 0.9), (2L, Seq(1f, 0f), 0.89),
      (3L, Seq(0f, 1f), 0.5)).toDF("vec_id", "embedding", "rel")
    val out = Retrieval.mmrRerank(pool, "vec_id", "embedding", "rel",
      k = 3, lambda = 1.0).orderBy($"pick_rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }
}
