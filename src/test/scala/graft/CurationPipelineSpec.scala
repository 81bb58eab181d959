package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** End-to-end curation chain over real testdata: the operators that are
  * each oracle-verified in isolation (q52–q70) must also COMPOSE — span
  * cut → decontaminate → redact → quality score → mixture rebalance →
  * token budget → sequence pack — with the funnel invariants holding at
  * every stage. This is the "a user can run the whole pipeline" check;
  * per-stage value correctness is the CORRECTNESS gate's job.
  */
class CurationPipelineSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("the curation chain composes and every funnel invariant holds") {
    val n0 = docs.count()

    // 1. substring-level dedup: cut repeated spans, keep the text column name
    val cut = Dedup.cutRepeatedSpans(docs, "doc_id", "text", n = 10)
      .join(docs.select($"doc_id", $"lang", $"source"), Seq("doc_id"))
      .select($"doc_id", $"text_clean".as("text"), $"lang", $"source",
        $"n_tokens_before", $"n_tokens_after")
    assert(cut.count() == n0, "span cut rewrites, never drops documents")
    assert(cut.filter($"n_tokens_after" > $"n_tokens_before").count() == 0)

    // 2. decontaminate against the held-out slice
    val test = docs.filter($"doc_id" % 97 === 0)
    val train = cut.filter($"doc_id" % 97 =!= 0)
    val clean = Contamination.cut(train, test, "doc_id", "text", 0.04)
    val nClean = clean.count()
    assert(nClean <= train.count(), "the cut can only remove")
    assert(nClean > 0, "the cut must not empty the corpus")

    // 3. redact PII (idempotent on this corpus after the span cut: counts 0)
    val red = clean.withColumn("text", Redaction.redact($"text"))
    assert(red.filter(Redaction.emailCount($"text") > 0).count() == 0,
      "no email survives redaction")

    // 4. quality score + gate
    val scored = red.withColumn("n_tok", TextAnalysis.tokenCount($"text").cast("long"))
      .filter($"n_tok" > 0)

    // 5. rebalance to an even source mixture over the 3 largest sources
    val top3 = scored.groupBy($"source").count()
      .orderBy($"count".desc, $"source").limit(3)
      .collect().map(_.getString(0)).toSeq
    val mixed = Sampling.rebalanceToMix(scored,
      key = $"doc_id".cast("string"), stratum = $"source",
      targets = top3.map(_ -> (1, 3)).toMap, seed = 11)
    val shares = mixed.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shares.keySet == top3.toSet, "mixture is a closed set")
    // even thirds: max-min spread bounded by rounding
    assert(shares.values.max - shares.values.min <= 2, shares)

    // 6. budget, then 7. pack what the budget kept
    val budgeted = TokenBudget.take(mixed, "doc_id", "n_tok", budget = 2000L)
    val packed = Packing.sequencePack(budgeted, "doc_id", "n_tok", packSize = 512L)
    val rows = packed.select($"n_tok", $"cum_tokens", $"pack_id").collect()
    assert(rows.nonEmpty, "the budget must admit documents")
    assert(rows.forall(_.getLong(1) <= 2000L), "budget respected")
    rows.foreach { r =>
      val (tok, cum, pack) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pack == (cum - tok) / 512L, s"pack of first token: $r")
    }
  }
}
