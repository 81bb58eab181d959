package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class ChainDoc(doc_id: Long, text: String, lang: String, source: String)

/** [[StreamingCurationChain]]: the dedup gate, the card partials, the
  * vector index, and the postings index driven as ONE foreachBatch
  * chain over ≥3 batches, with a mid-chain crash (after the vector
  * index append, before the postings append) replayed from the
  * checkpoint — all four artifacts must describe exactly the admitted
  * documents, once each.
  */
class StreamingCurationChainSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def centroids = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
    (1L, Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
  ).toDF("centroid_id", "centroid_vec")

  test("3 batches with a killed batch replayed: kept, card, index, postings stay consistent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("chain").toString
    val prefix = "graft_spec_chain"
    val crashArmed = new AtomicBoolean(true)
    def chain(onStage: (Long, Int) => Unit) = StreamingCurationChain.start(
      in.toDF(), prefix, keptDir = s"$dir/kept", cardDir = s"$dir/card",
      indexDir = s"$dir/ivf", postingsDir = s"$dir/post",
      centroids = centroids,
      checkpoint = s"$dir/ckpt", onStage = onStage)
    lazy val in = MemoryStream[ChainDoc]

    // batch 0: 1≡2 (intra-batch dup -> keep 1), 3 novel
    in.addData(
      ChainDoc(1L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      ChainDoc(2L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      ChainDoc(3L, "the quick brown fox jumps over lazy dogs", "en", "books"))
    val q1 = chain((id, stage) =>
      if (id == 1L && stage == 3 && crashArmed.getAndSet(false))
        throw new RuntimeException(
          "injected crash: index appended, postings not"))
    q1.processAllAvailable()

    // batch 1: 4 duplicates batch-0's doc 1 (cross-batch -> blocked),
    // 5 novel — and the chain DIES between stage 3 and stage 4
    in.addData(
      ChainDoc(4L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      ChainDoc(5L, "entirely new content appears in this batch", "de", "web"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(!q1.isActive)
    // the torn state the crash left behind: batch 1's index partition
    // exists, its postings partition does not
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/ivf/batch=1")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/post/batch=1")))

    // restart from the same checkpoint: batch 1 replays whole, then
    // batch 2 (6 novel, 7 duplicates 5 intra-batch) flows through
    val q2 = chain((_, _) => ())
    q2.processAllAvailable()
    in.addData(
      ChainDoc(6L, "sixth document with its own fresh words", "fr", "web"),
      ChainDoc(7L, "entirely new content appears in this batch", "de", "web"))
    q2.processAllAvailable()
    q2.stop()

    // ---- the three artifacts agree on the admitted set, once each ----
    val kept = spark.read.parquet(s"$dir/kept")
    val keptIds = kept.select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds == Seq(1L, 3L, 5L, 6L), s"kept = $keptIds")

    // card: the replayed batch overwrote its own partial — every
    // admitted doc counted exactly once, with its batch's source/lang
    val card = spark.read.parquet(s"$dir/card")
      .groupBy($"source", $"lang").agg(sum($"n_docs").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(card == Map(("web", "en") -> 1L, ("books", "en") -> 1L,
      ("web", "de") -> 1L, ("web", "fr") -> 1L), s"card = $card")
    assert(card.values.sum == keptIds.size.toLong)

    // index: exactly the admitted docs, with the lists equal to the
    // one-shot assignment of the kept store's embeddings
    val lists = StreamingVectorIndex.lists(spark, s"$dir/ivf")
    val listed = lists.select("cand_id").as[Long].collect().sorted.toSeq
    assert(listed == keptIds, s"indexed = $listed")
    val oneShot = graft.operators.Similarity.ivfAssign(
      kept.select($"doc_id".as("cand_id"),
        StreamingCurationChain.textEmbedding($"text").as("cv")),
      "cv", "cand_id", centroids)
    val cells = lists.select("cand_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShotCells = oneShot.select("cand_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells == oneShotCells,
      s"streamed cells $cells != one-shot $oneShotCells")

    // postings: exactly the admitted docs, equal to the one-shot
    // tokenize of the kept store (the replayed batch overwrote its own
    // segment — no doubled tf from the crash)
    val post = StreamingPostingsIndex.postings(spark, s"$dir/post",
      kept.select($"doc_id", $"text"), "doc_id", "text")
    val postedIds = post.select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq
    assert(postedIds == keptIds, s"posted = $postedIds")
    val postRows = post.collect().map(_.toSeq).toSet
    val oneShotPost = graft.operators.Retrieval
      .tfPostings(kept.select($"doc_id", $"text"), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(postRows == oneShotPost,
      "streamed postings must equal the one-shot tokenize of the kept store")
  }

  test("takedown: deleteDocs purges every artifact, is idempotent, and " +
    "unblocks a future equivalent document") {
    val dir = java.nio.file.Files.createTempDirectory("chaindel").toString
    val prefix = "graft_spec_chain_del"
    def runBatch(id: Long, docs: ChainDoc*): Unit =
      StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, id)
    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
    runBatch(0L,
      ChainDoc(1L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      ChainDoc(3L, "the quick brown fox jumps over lazy dogs", "en", "books"))
    runBatch(1L,
      ChainDoc(5L, "entirely new content appears in this batch", "de", "web"))

    def state(): (Seq[Long], Map[(String, String), Long], Seq[Long], Seq[Long]) = {
      val kept = spark.read.parquet(s"$dir/kept")
      val card = spark.read.parquet(s"$dir/card")
        .groupBy($"source", $"lang").agg(sum($"n_docs").as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      (kept.select("doc_id").as[Long].collect().sorted.toSeq, card,
        StreamingVectorIndex.lists(spark, s"$dir/ivf")
          .select("cand_id").as[Long].collect().sorted.toSeq,
        StreamingPostingsIndex.postings(spark, s"$dir/post",
            kept.select($"doc_id", $"text"), "doc_id", "text")
          .select("doc_id").distinct().as[Long].collect().sorted.toSeq)
    }
    assert(state()._1 == Seq(1L, 3L, 5L))

    StreamingCurationChain.deleteDocs(spark, Seq(1L).toDF("doc_id"),
      prefix, s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post")
    val after = state()
    assert(after._1 == Seq(3L, 5L), s"kept = ${after._1}")
    assert(after._2 == Map(("books", "en") -> 1L, ("web", "de") -> 1L),
      s"card = ${after._2}")
    assert(after._3 == Seq(3L, 5L), s"lists = ${after._3}")
    assert(after._4 == Seq(3L, 5L), s"postings = ${after._4}")

    // idempotent: a crashed/repeated delete re-runs to the same state
    StreamingCurationChain.deleteDocs(spark, Seq(1L).toDF("doc_id"),
      prefix, s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post")
    assert(state() == after, "repeated delete must be a no-op")

    // takedown semantics: an EQUIVALENT new document is new content now
    // — the gate admits it (the tombstone filters the band probe)
    runBatch(2L,
      ChainDoc(11L, "alpha beta gamma delta epsilon zeta", "en", "web"))
    val readmitted = state()
    assert(readmitted._1 == Seq(3L, 5L, 11L), s"kept = ${readmitted._1}")
    assert(readmitted._2(("web", "en")) == 1L)
    assert(readmitted._3 == Seq(3L, 5L, 11L) &&
      readmitted._4 == Seq(3L, 5L, 11L))
  }

  test("takedown recovery: a TORN earlier delete (kept purged, card " +
    "stale) heals on re-run, and a FOLDED card tree reconciles") {
    import org.apache.spark.sql.{functions => F}
    val dir = java.nio.file.Files.createTempDirectory("chainrec").toString
    val prefix = "graft_spec_chain_rec"
    def runBatch(id: Long, docs: ChainDoc*): Unit =
      StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, id)
    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
    runBatch(0L,
      ChainDoc(1L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      ChainDoc(3L, "the quick brown fox jumps over lazy dogs", "en", "books"))
    runBatch(1L,
      ChainDoc(5L, "entirely new content appears in this batch", "de", "web"))
    runBatch(2L,
      ChainDoc(6L, "sixth document with its own fresh words", "fr", "web"))

    // simulate the torn state a crash mid-delete leaves: doc 1 purged
    // from the kept partition, card/lists/postings NOT corrected
    val keptP = s"$dir/kept/batch=0"
    val purged = graft.operators.Checkpoints.pin(
      spark.read.parquet(keptP).filter($"doc_id" =!= 1L))
    purged.write.mode("overwrite").parquet(keptP)
    // and fold the card tree (independent maintenance): batches {0,1}
    // merge under batch=1, so card ids {1,2} no longer mirror kept
    // ids {0,1,2}
    graft.operators.Compaction.compactBatchTree(spark, s"$dir/card")
    val staleCard = spark.read.parquet(s"$dir/card")
      .agg(F.sum($"n_docs")).head().getLong(0)
    assert(staleCard == 4L, "torn state: card still counts the purged doc")

    // the documented recovery: re-run the delete with the same ids
    StreamingCurationChain.deleteDocs(spark, Seq(1L).toDF("doc_id"),
      prefix, s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post")

    val card = spark.read.parquet(s"$dir/card")
      .groupBy($"source", $"lang").agg(F.sum($"n_docs").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(card == Map(("books", "en") -> 1L, ("web", "de") -> 1L,
      ("web", "fr") -> 1L), s"healed card = $card")
    // card partitions mirror the kept tree again (stale fold ids gone)
    assert(StreamingBatchDirs.list(spark, s"$dir/card") ==
      StreamingBatchDirs.list(spark, s"$dir/kept"))
    // the row-level artifacts are purged too
    assert(!StreamingVectorIndex.lists(spark, s"$dir/ivf")
      .select("cand_id").as[Long].collect().contains(1L))
    val kept = spark.read.parquet(s"$dir/kept")
    assert(!StreamingPostingsIndex.postings(spark, s"$dir/post",
        kept.select($"doc_id", $"text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().contains(1L))
  }
}
