package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Retrieval

// reuses DocIn(doc_id, text) from StreamingContentDedupSpec

/** [[StreamingPostingsIndex]]: streamed segments equal the one-shot
  * tokenize, new docs answer probes immediately under frozen stats,
  * replay is idempotent, the pre-commit read is the empty segment, and
  * the rebuild is bit-identical to indexing the concatenated corpus.
  */
class StreamingPostingsIndexSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def base = Seq(
    (1L, "rare common alpha beta"),
    (2L, "alpha common alpha gamma"),
    (3L, "beta gamma common delta")
  ).toDF("doc_id", "text")

  private val b1 = Seq(DocIn(10L, "rare rare common"))
  private val b2 = Seq(DocIn(11L, "delta common pad"), DocIn(12L, "alpha pad"))

  private def q(terms: (Int, String)*) = terms.toDF("query_id", "term")
    .select($"query_id".cast("long").as("query_id"), $"term")

  private def postingRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"len", $"term", $"tf")
      .collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getString(2), r.getDouble(3))).toSet

  test("streamed segments == one-shot tokenize; frozen-stats probe sees " +
    "new docs immediately; pre-commit read is empty") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("spi").toString
    Retrieval.writeBm25Index(base, "doc_id", "text",
      "graft_spec_spi", buckets = 2)

    assert(StreamingPostingsIndex.postings(spark, s"$dir/seg",
      base, "doc_id", "text").isEmpty, "pre-commit segment must be empty")

    val in = MemoryStream[DocIn]
    val sq = StreamingPostingsIndex.run(in.toDF(), "doc_id", "text",
      path = s"$dir/seg", checkpoint = s"$dir/ckpt")
    try {
      in.addData(b1); sq.processAllAvailable()
      in.addData(b2); sq.processAllAvailable()
    } finally sq.stop()

    val streamed = StreamingPostingsIndex.postings(spark, s"$dir/seg",
      base, "doc_id", "text")
    val oneShot = Retrieval.tfPostings((b1 ++ b2).toDF(), "doc_id", "text")
    assert(postingRows(streamed) == postingRows(oneShot),
      "streamed postings must equal the one-shot tokenize")

    // doc 10 holds 'rare' twice: under FROZEN idf it must now outrank
    // doc 1 (tf 2 vs 1) without any base-index rewrite
    val live = StreamingPostingsIndex.probeLive(spark, "graft_spec_spi",
      s"$dir/seg", base, "doc_id", "text", q(1 -> "rare"), k = 4)
      .collect().map(_.getLong(2)).toSeq
    assert(live == Seq(10L, 1L),
      s"streamed doc must rank under frozen stats: $live")

    // 'pad' was unseen at build time → no idf row → contributes
    // nothing until the rebuild (the documented staleness contract)
    val pad = StreamingPostingsIndex.probeLive(spark, "graft_spec_spi",
      s"$dir/seg", base, "doc_id", "text", q(1 -> "pad"), k = 4)
    assert(pad.isEmpty, "unseen-at-build terms must not score pre-rebuild")
  }

  test("replay is idempotent; rebuild is bit-identical to indexing the " +
    "concatenated corpus and revives unseen terms") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("spir").toString
    Retrieval.writeBm25Index(base, "doc_id", "text",
      "graft_spec_spir", buckets = 2)

    StreamingPostingsIndex.writeBatch(b1.toDF(), "doc_id", "text",
      s"$dir/seg", batchId = 0)
    StreamingPostingsIndex.writeBatch(b1.toDF(), "doc_id", "text",
      s"$dir/seg", batchId = 0) // at-least-once replay of the same batch
    StreamingPostingsIndex.writeBatch(b2.toDF(), "doc_id", "text",
      s"$dir/seg", batchId = 1)
    val streamed = StreamingPostingsIndex.postings(spark, s"$dir/seg",
      base, "doc_id", "text")
    assert(postingRows(streamed) ==
      postingRows(Retrieval.tfPostings((b1 ++ b2).toDF(), "doc_id", "text")),
      "a replayed batch must overwrite, not append")

    StreamingPostingsIndex.rebuildIndex(spark, "graft_spec_spir",
      s"$dir/seg", base, "doc_id", "text", "graft_spec_spir_v2", buckets = 2)
    val allDocs = base.unionByName((b1 ++ b2).toDF())
    Retrieval.writeBm25Index(allDocs, "doc_id", "text",
      "graft_spec_spir_ref", buckets = 2)
    val rebuilt = spark.table("graft_spec_spir_v2_terms")
      .collect().map(_.toSeq).toSet
    val ref = spark.table("graft_spec_spir_ref_terms")
      .collect().map(_.toSeq).toSet
    assert(rebuilt == ref,
      s"rebuilt terms must equal the from-text build:\n$rebuilt\nvs $ref")

    val qs = q(1 -> "pad", 2 -> "rare")
    val viaRebuilt = Retrieval.probeBm25Index(spark, "graft_spec_spir_v2",
      "doc_id", qs, k = 4).collect().map(_.toSeq).toSeq
    val direct = Retrieval.bm25TopK(allDocs, "doc_id", "text", qs, k = 4)
      .collect().map(_.toSeq).toSeq
    assert(viaRebuilt == direct,
      s"rebuilt probe must equal the direct ranking: $viaRebuilt vs $direct")
  }

  test("tombstones cover the live view: base AND streamed docs stop " +
    "matching probeLive; the rebuild drops them physically") {
    import graft.operators.Tombstones
    val dir = java.nio.file.Files.createTempDirectory("spid").toString
    val prefix = "graft_spec_spi_del"
    Retrieval.writeBm25Index(base, "doc_id", "text", prefix, buckets = 2)
    StreamingPostingsIndex.writeBatch(b1.toDF(), "doc_id", "text",
      s"$dir/seg", batchId = 0)
    def live(term: String): Seq[Long] =
      StreamingPostingsIndex.probeLive(spark, prefix, s"$dir/seg",
        base, "doc_id", "text", q(1 -> term), k = 4)
        .collect().map(_.getLong(2)).toSeq
    assert(live("rare") == Seq(10L, 1L), "pre-delete: both corpora match")

    // delete one BASE doc (1) and one STREAMED doc (10) via the one store
    Tombstones.write(spark, prefix, Seq(1L, 10L).toDF("doc_id"), "doc_id")
    assert(live("rare") == Seq.empty,
      "post-delete: neither the base row nor the streamed segment may match")
    assert(live("common").nonEmpty, "other docs keep matching")

    // the retrain-time rebuild removes them physically — equal to a
    // fresh build over the surviving concatenated corpus
    StreamingPostingsIndex.rebuildIndex(spark, prefix, s"$dir/seg",
      base, "doc_id", "text", s"${prefix}_v2", buckets = 2)
    val survivors = base.unionByName(b1.toDF())
      .filter(!$"doc_id".isin(1L, 10L))
    Retrieval.writeBm25Index(survivors, "doc_id", "text",
      s"${prefix}_ref", buckets = 2)
    assert(spark.table(s"${prefix}_v2_terms").collect().map(_.toSeq).toSet ==
      spark.table(s"${prefix}_ref_terms").collect().map(_.toSeq).toSet,
      "rebuilt stats must equal the fresh build over the survivors")
    assert(!spark.table(s"${prefix}_v2_postings")
      .select("doc_id").as[Long].collect().exists(Set(1L, 10L)),
      "tombstoned docs must be physically absent from the rebuilt postings")
  }
}
