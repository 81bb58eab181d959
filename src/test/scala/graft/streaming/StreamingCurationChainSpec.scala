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

  test("takedown at scale: one discovery join per tree — exactly the " +
    "affected partitions rewrite, the rest are untouched bytes") {
    val dir = java.nio.file.Files.createTempDirectory("chainscale").toString
    val prefix = "graft_spec_chain_scale"
    val nB = 50
    // build the three row-level trees directly (the purge contract is
    // over the batch-tree layout, not over how the stream produced it)
    // AND a mirroring card tree — one partial per batch, so the
    // O(affected) card refresh (not the full rebuild) is what runs
    for (b <- 0 until nB) {
      val docs = Seq(
        (b * 10L, s"alpha$b one two", "en", "web"),
        (b * 10L + 1, s"beta$b three four", "en", "books"))
        .toDF("doc_id", "text", "lang", "source")
      docs.write.parquet(s"$dir/kept/batch=$b")
      docs.select($"doc_id".as("cand_id"), lit(0L).as("cell"))
        .write.parquet(s"$dir/ivf/batch=$b")
      docs.select($"doc_id", lit("t").as("term"), lit(1L).as("tf"))
        .write.parquet(s"$dir/post/batch=$b")
      StreamingCardStats.writeBatch(docs, s"$dir/card", b.toLong)
    }

    def listing(tree: String): Map[Long, Set[(String, Long)]] =
      (0 until nB).map { b =>
        val p = java.nio.file.Paths.get(s"$dir/$tree/batch=$b")
        import scala.jdk.CollectionConverters._
        b.toLong -> java.nio.file.Files.list(p).iterator().asScala
          .map(f => f.getFileName.toString -> java.nio.file.Files.size(f))
          .toSet
      }.toMap
    val before = Seq("kept", "ivf", "post", "card").map(t => t -> listing(t)).toMap

    // deletes touch batches 5, 17, 40 — and empty batch 45 entirely
    val delIds = Seq(50L, 171L, 400L, 450L, 451L)
    val hit = Set(5L, 17L, 40L, 45L)
    spark.sparkContext.setJobGroup("takedown", "takedown", false)
    val affected = try StreamingCurationChain.deleteDocs(spark,
      delIds.toDF("doc_id"), prefix,
      s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post")
    finally spark.sparkContext.clearJobGroup()

    // the returned rewrite set is exactly the affected partitions
    assert(affected(s"$dir/kept") == hit.toSeq.sorted, s"kept: $affected")
    assert(affected(s"$dir/ivf") == hit.toSeq.sorted)
    assert(affected(s"$dir/post") == hit.toSeq.sorted)
    // physically: unaffected partitions are byte-for-byte untouched —
    // INCLUDING the card partials (the O(affected) card refresh rewrote
    // only the hit batches' partials, never the whole card tree)
    val after = Seq("kept", "ivf", "post", "card").map(t => t -> listing(t)).toMap
    for (t <- Seq("kept", "ivf", "post", "card"); b <- 0L until nB.toLong
         if !hit(b))
      assert(after(t)(b) == before(t)(b),
        s"$t batch=$b must not be rewritten by an unrelated takedown")
    for (t <- Seq("kept", "ivf", "post", "card"); b <- hit)
      assert(after(t)(b) != before(t)(b), s"$t batch=$b must rewrite")
    // semantics: rows gone, everything else intact, card mirrors kept
    val keptIds = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == (0 until nB).flatMap(b =>
      Seq(b * 10L, b * 10L + 1)).toSet -- delIds)
    assert(StreamingBatchDirs.list(spark, s"$dir/card") ==
      StreamingBatchDirs.list(spark, s"$dir/kept"),
      "card partitions mirror kept (including the emptied batch 45)")
    val cardN = spark.read.parquet(s"$dir/card")
      .agg(sum($"n_docs")).head().getLong(0)
    assert(cardN == keptIds.size.toLong, s"card counts $cardN")

    // driver job count is O(affected)+O(1), not O(batches): the old
    // per-partition probe design spent >= 3*50 jobs on discovery alone
    val jobs = {
      // the status store is fed asynchronously; wait for it to settle
      var n = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val m = spark.sparkContext.statusTracker
          .getJobIdsForGroup("takedown").length
        if (m == n) stable += 1 else { n = m; stable = 0 }
      }
      n
    }
    // The bound derives from the FIXTURE, not an AQE job-multiplier
    // constant: the old per-partition probe design's FLOOR was
    // 3 trees x nB = 150 discovery jobs BEFORE any rewrite, while the
    // O(affected) design spends jobs ∝ affected partitions (measured
    // ~60-90 here: a few AQE stage-jobs per rewrite x 16 affected
    // partials + 3 discovery joins + the small-set size probes). A
    // Spark/AQE version bump can shift the per-rewrite multiplier but
    // not the complexity class, which is what `< 3 * nB` pins.
    assert(jobs > 0 && jobs < 3 * nB,
      s"takedown must be O(affected) driver jobs, measured $jobs")
  }

  test("a delete during a running stream: the NEXT batch's artifacts " +
    "exclude the id with no second deleteDocs call") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("chaininfl").toString
    val prefix = "graft_spec_chain_inflight"
    val in = MemoryStream[ChainDoc]
    val q = StreamingCurationChain.start(
      in.toDF(), prefix, keptDir = s"$dir/kept", cardDir = s"$dir/card",
      indexDir = s"$dir/ivf", postingsDir = s"$dir/post",
      centroids = centroids, checkpoint = s"$dir/ckpt")
    in.addData(
      ChainDoc(1L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      ChainDoc(3L, "the quick brown fox jumps over lazy dogs", "en", "books"))
    q.processAllAvailable()

    // takedown lands while the stream is live (between micro-batches)
    StreamingCurationChain.deleteDocs(spark, Seq(1L).toDF("doc_id"),
      prefix, s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post")

    // the next batch REDELIVERS the deleted doc (at-least-once source)
    // alongside a novel one — the batch-entry tombstone filter must
    // keep it out of all four artifacts without a second deleteDocs
    in.addData(
      ChainDoc(1L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      ChainDoc(5L, "entirely new content appears in this batch", "de", "web"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.read.parquet(s"$dir/kept")
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 5L), "redelivered deleted doc must stay out of kept")
    assert(spark.read.parquet(s"$dir/kept/batch=1")
      .select("doc_id").as[Long].collect().toSeq == Seq(5L))
    assert(StreamingVectorIndex.lists(spark, s"$dir/ivf")
      .select("cand_id").as[Long].collect().sorted.toSeq == Seq(3L, 5L))
    assert(StreamingPostingsIndex.postings(spark, s"$dir/post",
        kept.select($"doc_id", $"text"), "doc_id", "text")
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq ==
      Seq(3L, 5L))
    val card = spark.read.parquet(s"$dir/card")
      .groupBy($"source", $"lang").agg(sum($"n_docs").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(card == Map(("books", "en") -> 1L, ("web", "de") -> 1L),
      s"card = $card")
  }

  test("maintenance policy: a long stream stays bounded per tree and " +
    "a delete wave settles (tombstones retired) within one batch") {
    val dir = java.nio.file.Files.createTempDirectory("chainmaint").toString
    val prefix = "graft_spec_chain_maint"
    val maxSeg = 4
    val sentences = Vector(
      "crimson harbor lantern drifts across silent water",
      "mountain echo carries winter songs beyond valleys",
      "glass towers reflect amber sunsets every evening",
      "quiet libraries hold forgotten maps of empires",
      "robots assemble intricate clockwork under neon light",
      "gardens bloom with saffron petals after rainfall",
      "sailors chart unknown reefs beneath polar stars",
      "violins tune their strings before the overture",
      "bakers fold chestnut flour into morning loaves",
      "comets scatter silver dust along the horizon")
    def runBatch(b: Long): Unit =
      StreamingCurationChain.processBatch(spark,
        Seq(ChainDoc(b, sentences(b.toInt), "en", "web")).toDF(), prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, b, maxSegments = maxSeg)
    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
    for (b <- 0L to 4L) runBatch(b)

    // delete doc 2 mid-stream; the next batch's stage-5 maintenance
    // must physically purge the band index and STAGE the marker — the
    // retire itself is deferred to the batch after (replay safety: a
    // crash replaying batch 5 must still see the marker at its entry
    // gate, or a redelivered doc 2 would re-enter every artifact)
    StreamingCurationChain.deleteDocs(spark, Seq(2L).toDF("doc_id"),
      prefix, s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post")
    assert(graft.operators.Tombstones.read(spark, prefix).isDefined)
    runBatch(5L)
    assert(!spark.table(s"${prefix}_bands")
      .select("doc_id").as[Long].collect().contains(2L),
      "the band rows must be physically gone after batch 5's stage 5")
    assert(graft.operators.Tombstones.read(spark, prefix).isDefined,
      "the marker must OUTLIVE the batch that applied it (deferred retire)")
    assert(graft.operators.Tombstones.hasPending(spark, prefix, 6L),
      "the applied snapshot must be staged for the next batch")
    runBatch(6L)
    assert(graft.operators.Tombstones.read(spark, prefix).isEmpty,
      "the NEXT batch's entry retires the staged tombstones")
    assert(!graft.operators.Tombstones.hasPending(spark, prefix, Long.MaxValue))

    for (b <- 7L to 9L) runBatch(b)
    // every tree bounded by the policy
    for (t <- Seq("kept", "card", "ivf", "post")) {
      val n = StreamingBatchDirs.list(spark, s"$dir/$t").length
      assert(n <= maxSeg, s"$t holds $n segments after 10 batches")
    }
    // and the artifacts still describe exactly the admitted-minus-
    // deleted set, once each
    val keptIds = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds == (0L to 9L).filterNot(_ == 2L),
      s"kept after folds = $keptIds")
    assert(StreamingVectorIndex.lists(spark, s"$dir/ivf")
      .select("cand_id").as[Long].collect().sorted.toSeq == keptIds)
    val cardN = spark.read.parquet(s"$dir/card")
      .agg(sum($"n_docs")).head().getLong(0)
    assert(cardN == keptIds.length.toLong)
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

  test("line curation in-chain: boilerplate scrubs against the frozen " +
    "pool, within-doc repeats collapse, and dedup sees the CLEANED " +
    "text (scrub-then-dedup ordering)") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("chainlc").toString
    val prefix = "graft_spec_chain_lc"
    // frozen pool from a REFERENCE corpus where the nav banner appears
    // in 4 docs (df 4 > maxDf 2); the content lines stay df 1
    val ref = (0 until 4).map(i =>
      (i.toLong, s"NAV HOME ABOUT\ncontent body $i")).toDF("doc_id", "text")
    val pool = TextAnalysis.boilerplateLinePool(ref, "text", maxDf = 2L)
      .localCheckpoint(true)
    val lc = StreamingCurationChain.LineCuration(pool)
    def runBatch(id: Long, docs: ChainDoc*): Unit =
      StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, id, lineCuration = Some(lc))
    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
    // doc 10 carries the banner AND a repeated line; doc 11 is ALREADY
    // the cleaned form of doc 10 — identical after curation, so the
    // dedup stage must block it (proof the band index fingerprints the
    // cleaned text, not the raw batch)
    runBatch(0L,
      ChainDoc(10L, "NAV HOME ABOUT\nalpha beta gamma\nalpha beta gamma\ndelta zeta", "en", "web"),
      ChainDoc(11L, "alpha beta gamma\ndelta zeta", "en", "web"),
      ChainDoc(12L, "totally different content here", "en", "books"))
    val kept = spark.read.parquet(s"$dir/kept")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(kept.keySet == Set(10L, 12L),
      s"doc 11 must dedup against CLEANED doc 10: ${kept.keySet}")
    assert(kept(10L) == "alpha beta gamma\ndelta zeta",
      s"banner scrubbed + repeat collapsed: '${kept(10L)}'")
    assert(kept(12L) == "totally different content here",
      s"untouched doc passes byte-identical: '${kept(12L)}'")
    // replay determinism: re-running the batch against the same frozen
    // pool admits the identical set (per-batch idempotent overwrite)
    runBatch(0L,
      ChainDoc(10L, "NAV HOME ABOUT\nalpha beta gamma\nalpha beta gamma\ndelta zeta", "en", "web"),
      ChainDoc(11L, "alpha beta gamma\ndelta zeta", "en", "web"),
      ChainDoc(12L, "totally different content here", "en", "books"))
    val kept2 = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 == Seq(10L, 12L), s"replay must be deterministic: $kept2")
  }

  test("retrainLinePool: rebuilt == fresh derivation over the kept " +
    "store; the swapped pool scrubs the DRIFTED banner the frozen " +
    "pool never learned") {
    import graft.operators.{Checkpoints, TextAnalysis}
    val dir = java.nio.file.Files.createTempDirectory("chainrt").toString
    val prefix = "graft_spec_chain_rt"
    // empty-store contract first: no batch committed -> empty pool
    val empty = StreamingCurationChain.retrainLinePool(spark,
      s"$dir/kept", maxDf = 1L)
    assert(empty.count() == 0L, "pre-commit retrain must be empty")
    Checkpoints.release(empty)
    // frozen pool knows the OLD banner only
    val ref = (0 until 3).map(i =>
      (i.toLong, s"OLD BANNER\nbody $i")).toDF("doc_id", "text")
    val poolV1 = TextAnalysis.boilerplateLinePool(ref, "text", maxDf = 1L)
      .localCheckpoint(true)
    def runBatch(id: Long, lc: StreamingCurationChain.LineCuration,
                 docs: ChainDoc*): Unit =
      StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, id, lineCuration = Some(lc))
    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
    // the drift: a NEW site template arrives on every admitted doc —
    // invisible to poolV1, so it lands in the kept store verbatim
    val lcV1 = StreamingCurationChain.LineCuration(poolV1)
    runBatch(0L, lcV1,
      ChainDoc(20L, "NEW TEMPLATE FOOTER\nalpha content", "en", "web"),
      ChainDoc(21L, "NEW TEMPLATE FOOTER\nbeta content", "en", "web"))
    runBatch(1L, lcV1,
      ChainDoc(22L, "NEW TEMPLATE FOOTER\ngamma content", "en", "web"))
    // retrain from the chain's own curated store
    val poolV2 = StreamingCurationChain.retrainLinePool(spark,
      s"$dir/kept", maxDf = 2L)
    // bit-identical to the definitional fresh derivation
    val fresh = TextAnalysis.boilerplateLinePool(
      spark.read.parquet(s"$dir/kept"), "text", maxDf = 2L)
    assert(col1[Long](poolV2).sorted == col1[Long](fresh).sorted,
      "rebuilt pool must equal a fresh derivation over the kept store")
    assert(poolV2.count() == 1L,
      "exactly the drifted footer (df 3 > 2) crosses the cap")
    // the batch-boundary swap: the next batch scrubs the drifted
    // banner; docs admitted under poolV1 stay as admitted (store
    // untouched for batches 0-1)
    runBatch(2L, lcV1.copy(pool = poolV2),
      ChainDoc(23L, "NEW TEMPLATE FOOTER\ndelta epsilon content words here",
        "en", "web"))
    val kept = spark.read.parquet(s"$dir/kept")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(kept.contains(23L),
      s"the post-swap doc must be admitted: ${kept.keySet}")
    assert(kept(23L) == "delta epsilon content words here",
      s"post-swap batch must scrub the drifted footer: '${kept(23L)}'")
    assert(kept(20L) == "NEW TEMPLATE FOOTER\nalpha content",
      "old admissions are a record — never retroactively re-scrubbed")
    Checkpoints.release(poolV2)
  }

  test("semantic dedup in-chain: a lexically-DISTINCT document whose " +
    "embedding matches an admitted one is refused; the index and gate " +
    "share the embed function") {
    val dir = java.nio.file.Files.createTempDirectory("chainsd").toString
    val prefix = "graft_spec_chain_sd"
    // designed embed: first letter decides the vector, so lexical and
    // semantic identity decouple — 'a...' docs all map to e0, others e1
    val embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => transform(sequence(lit(0), lit(7)), d =>
        when(d === 0 && substring(t, 1, 1) === "a", 1.0)
          .when(d === 1 && substring(t, 1, 1) =!= "a", 1.0)
          .otherwise(0.0))
    val sd = StreamingCurationChain.SemanticDedup(tau = 0.99,
      embed = Some(embed))
    def runBatch(id: Long, docs: ChainDoc*): Unit =
      StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, id, semanticDedup = Some(sd))
    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
    runBatch(0L,
      ChainDoc(1L, "alpha content in the first batch", "en", "web"))
    // batch 1: doc 2 shares NO shingles with doc 1 (lexical gate
    // passes) but embeds to the same vector -> semantically refused;
    // doc 3 embeds orthogonally -> admitted
    runBatch(1L,
      ChainDoc(2L, "also wildly different words entirely", "en", "web"),
      ChainDoc(3L, "bravo text goes through untouched", "en", "web"))
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L),
      s"doc 2 must be refused semantically, not lexically: $kept")
    // the index describes exactly the admitted docs, under the SAME
    // embed the gate probes with
    val idx = StreamingVectorIndex.lists(spark, s"$dir/ivf")
      .select("cand_id").as[Long].collect().sorted.toSeq
    assert(idx == Seq(1L, 3L), s"index must hold admitted docs only: $idx")
  }

  test("semantic FAMILIES in-chain: a cell-straddling near-dup the " +
    "single quantizer misses is refused under an extra rotated family; " +
    "every family tree describes the admitted set and takedowns purge " +
    "them all") {
    // embeds decouple lexical and semantic identity: 'a…' docs sit one
    // side of the axis-aligned 45° boundary, 'b…' docs the other —
    // family 0 (e0/e1 centroids) splits the pair at nprobe = 1, the
    // rotated family co-cells it
    val embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => transform(sequence(lit(0), lit(7)), d =>
        when(substring(t, 1, 1) === "a",
          when(d === 0, 1.0).when(d === 1, 0.999).otherwise(0.0))
        .when(substring(t, 1, 1) === "b",
          when(d === 0, 0.999).when(d === 1, 1.0).otherwise(0.0))
        .otherwise(when(d === 2, 1.0).otherwise(0.0)))
    val cents2 = Seq(
      (0L, Seq(1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(-1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    ).toDF("centroid_id", "centroid_vec")
    def run(dir: String, prefix: String,
            extra: Seq[(org.apache.spark.sql.DataFrame, String)]): Seq[Long] = {
      val sd = StreamingCurationChain.SemanticDedup(tau = 0.99,
        embed = Some(embed), extraFamilies = extra)
      def runBatch(id: Long, docs: ChainDoc*): Unit =
        StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
          s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
          centroids, id, semanticDedup = Some(sd))
      StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
      runBatch(0L,
        ChainDoc(1L, "alpha content in the first batch", "en", "web"))
      runBatch(1L,
        ChainDoc(2L, "bravo straddles the quantizer boundary", "en", "web"),
        ChainDoc(3L, "celery is orthogonal to both of those", "en", "web"))
      spark.read.parquet(s"$dir/kept")
        .select("doc_id").as[Long].collect().sorted.toSeq
    }
    val d1 = java.nio.file.Files.createTempDirectory("chainfam1").toString
    assert(run(d1, "graft_spec_chain_fam1", Nil) == Seq(1L, 2L, 3L),
      "premise: the single family misses the straddler at nprobe = 1")
    val d2 = java.nio.file.Files.createTempDirectory("chainfam2").toString
    val extra = Seq((cents2, s"$d2/ivf_f1"))
    assert(run(d2, "graft_spec_chain_fam2", extra) == Seq(1L, 3L),
      "the rotated family must refuse the straddler")
    // both trees describe exactly the admitted docs (stage 3 appends
    // each batch to every family's tree)
    val main = StreamingVectorIndex.lists(spark, s"$d2/ivf")
      .select("cand_id").as[Long].collect().sorted.toSeq
    val fam1 = StreamingVectorIndex.lists(spark, s"$d2/ivf_f1")
      .select("cand_id").as[Long].collect().sorted.toSeq
    assert(main == Seq(1L, 3L) && fam1 == Seq(1L, 3L),
      s"family trees must mirror the admitted set: $main / $fam1")
    // takedown reaches the extra tree too
    StreamingCurationChain.deleteDocs(spark, Seq(1L).toDF("doc_id"),
      "graft_spec_chain_fam2", s"$d2/kept", s"$d2/card", s"$d2/ivf",
      s"$d2/post", extraIndexDirs = Seq(s"$d2/ivf_f1"))
    assert(StreamingVectorIndex.lists(spark, s"$d2/ivf_f1")
      .select("cand_id").as[Long].collect().toSeq == Seq(3L),
      "deleteDocs must purge every family's tree")
  }

  test("retroactiveScrub: admitted-under-old-pool docs are cleaned in " +
    "place, all five artifacts re-derive from the scrubbed store, and " +
    "a crash mid-composition heals by re-running") {
    import graft.operators.{Checkpoints, TextAnalysis}
    val dir = java.nio.file.Files.createTempDirectory("chainrs").toString
    val prefix = "graft_spec_chain_rs"
    // poolV1 knows nothing; the drifted footer rides into the store
    val poolV1 = TextAnalysis.boilerplateLinePool(
      Seq((0L, "unrelated reference text")).toDF("doc_id", "text"),
      "text", maxDf = 1L).localCheckpoint(true)
    val lcV1 = StreamingCurationChain.LineCuration(poolV1)
    def runBatch(id: Long, docs: ChainDoc*): Unit =
      StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, id, lineCuration = Some(lcV1))
    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
    runBatch(0L,
      ChainDoc(20L, "NEW TEMPLATE FOOTER\nalpha content words here four five", "en", "web"),
      ChainDoc(21L, "NEW TEMPLATE FOOTER\nbeta sentences carry other words", "en", "web"))
    runBatch(1L,
      ChainDoc(22L, "NEW TEMPLATE FOOTER\ngamma body travels its own path", "de", "web"))
    // retrain: the footer (df 3 > 2) crosses the cap
    val poolV2 = StreamingCurationChain.retrainLinePool(spark,
      s"$dir/kept", maxDf = 2L)
    def scrub(onStep: Int => Unit = _ => ()): Unit =
      StreamingCurationChain.retroactiveScrub(spark, poolV2, prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, buckets = 8, onStep = onStep)
    // CRASH between the kept rewrite and the artifact re-derivation —
    // the kept store is scrubbed, cards/index/postings still describe
    // the old text
    intercept[RuntimeException] {
      scrub(k => if (k == 1) throw new RuntimeException("injected"))
    }
    val tornTokens = spark.read.parquet(s"$dir/card")
      .agg(sum($"n_tokens_ws")).head().getLong(0)
    // …then the documented recovery: re-run the same call to completion
    scrub()
    // 1. kept text cleaned in place, ids untouched
    val kept = spark.read.parquet(s"$dir/kept")
    val keptRows = kept.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(keptRows.keySet == Set(20L, 21L, 22L), s"${keptRows.keySet}")
    assert(keptRows.values.forall(!_.contains("NEW TEMPLATE FOOTER")),
      s"old admissions must be cleaned: $keptRows")
    assert(keptRows(20L) == "alpha content words here four five")
    // 2. cards re-derived from the NEW text (token sums shrank)
    val cardTokens = spark.read.parquet(s"$dir/card")
      .agg(sum($"n_tokens_ws")).head().getLong(0)
    val freshTokens = StreamingCardStats.partials(kept)
      .agg(sum($"n_tokens_ws")).head().getLong(0)
    assert(cardTokens == freshTokens && cardTokens < tornTokens,
      s"cards must describe the scrubbed text: $cardTokens vs " +
        s"fresh $freshTokens, torn $tornTokens")
    // 3. vector lists equal the one-shot assignment of the new text
    val lists = StreamingVectorIndex.lists(spark, s"$dir/ivf")
      .select("cand_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = graft.operators.Similarity.ivfAssign(
        kept.select($"doc_id".as("cand_id"),
          StreamingCurationChain.textEmbedding($"text").as("cv")),
        "cv", "cand_id", centroids)
      .select("cand_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lists == oneShot, s"lists must re-derive: $lists vs $oneShot")
    // 4. postings equal the one-shot tokenize of the new text
    val post = StreamingPostingsIndex.postings(spark, s"$dir/post",
        kept.select($"doc_id", $"text"), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val freshPost = graft.operators.Retrieval
      .tfPostings(kept.select($"doc_id", $"text"), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(post == freshPost, "postings must re-derive from the new text")
    // 5. the band index fingerprints the SCRUBBED text: a new doc that
    // equals cleaned doc 20 byte-for-byte is refused by the rebuilt
    // index (the stale pre-scrub fingerprints are gone)
    runBatch(2L,
      ChainDoc(30L, "alpha content words here four five", "en", "web"))
    assert(!spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().contains(30L),
      "the cleaned form must dedup against the re-fingerprinted index")
    // idempotent: re-running the completed scrub changes nothing
    val snapshot = spark.read.parquet(s"$dir/kept").collect()
      .map(_.toSeq).toSet
    scrub()
    assert(spark.read.parquet(s"$dir/kept").collect()
      .map(_.toSeq).toSet == snapshot,
      "a repeated scrub must be a fixed point")
    Checkpoints.release(poolV2)
  }

  test("retroactiveScrub × FAMILIES: a crash between family-tree " +
    "rebuilds, re-run, then a gated batch — admissions match the " +
    "never-crashed universe") {
    import graft.operators.TextAnalysis
    // embeds keyed on content words (not the footer): 'alpha' and
    // 'bravo' docs straddle the main quantizer's 45° boundary; the
    // rotated extra family co-cells them (the in-chain FAMILIES test's
    // geometry, here composed with the scrub)
    val embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => transform(sequence(lit(0), lit(7)), d =>
        when(t.contains("alpha"),
          when(d === 0, 1.0).when(d === 1, 0.999).otherwise(0.0))
        .when(t.contains("bravo"),
          when(d === 0, 0.999).when(d === 1, 1.0).otherwise(0.0))
        .when(t.contains("delta"),
          when(d === 3, 1.0).otherwise(0.0))
        .otherwise(when(d === 2, 1.0).otherwise(0.0)))
    val cents2 = Seq(
      (0L, Seq(1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(-1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    ).toDF("centroid_id", "centroid_vec")
    val poolV1 = TextAnalysis.boilerplateLinePool(
      Seq((0L, "unrelated reference text")).toDF("doc_id", "text"),
      "text", maxDf = 1L).localCheckpoint(true)
    // one universe = (dir, prefix); crashAt injects the family-rebuild
    // crash into the FIRST scrub attempt, which then re-runs
    def universe(tag: String, crash: Boolean): (String, Seq[Long], Seq[Long]) = {
      val d = java.nio.file.Files.createTempDirectory(s"chainfrs-$tag")
        .toString
      val prefix = s"graft_spec_chain_frs_$tag"
      val extra = Seq((cents2, s"$d/ivf_f1"))
      val sd = StreamingCurationChain.SemanticDedup(tau = 0.99,
        embed = Some(embed), extraFamilies = extra)
      def runBatch(id: Long, docs: ChainDoc*): Unit =
        StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
          s"$d/kept", s"$d/card", s"$d/ivf", s"$d/post", centroids, id,
          lineCuration = Some(StreamingCurationChain.LineCuration(poolV1)),
          semanticDedup = Some(sd))
      StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
      runBatch(0L, ChainDoc(20L,
        "NEW TEMPLATE FOOTER\nalpha content travels here", "en", "web"))
      runBatch(1L, ChainDoc(21L,
        "NEW TEMPLATE FOOTER\ngamma body goes its own way", "de", "web"))
      val poolV2 = StreamingCurationChain.retrainLinePool(spark,
        s"$d/kept", maxDf = 1L)
      def scrub(onFam: (Long, Int) => Unit): Unit =
        StreamingCurationChain.retroactiveScrub(spark, poolV2, prefix,
          s"$d/kept", s"$d/card", s"$d/ivf", s"$d/post", centroids,
          buckets = 8, embed = Some(embed), extraFamilies = extra,
          onFamilyTree = onFam)
      if (crash) {
        // die after batch 1's MAIN tree rebuilt, before its extra
        // family's — exactly "between family-tree rebuilds"
        intercept[RuntimeException] {
          scrub((b, f) => if (b == 1L && f == 0)
            throw new RuntimeException("injected between families"))
        }
        scrub((_, _) => ())
      } else scrub((_, _) => ())
      // the post-scrub gate: 30 straddles the main quantizer's cells
      // against admitted doc 20 — only the (rebuilt) extra family can
      // refuse it; 31 is orthogonal and must pass
      runBatch(2L,
        ChainDoc(30L, "bravo straddles the quantizer boundary", "en", "web"),
        ChainDoc(31L, "delta is fresh and unrelated content", "en", "web"))
      val kept = spark.read.parquet(s"$d/kept")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val famTree = StreamingVectorIndex.lists(spark, s"$d/ivf_f1")
        .select("cand_id").as[Long].collect().sorted.toSeq
      (d, kept, famTree)
    }
    val (_, keptA, famA) = universe("clean", crash = false)
    val (_, keptB, famB) = universe("crash", crash = true)
    assert(keptA == keptB,
      s"crashed-and-rerun universe must admit identically: $keptB vs $keptA")
    assert(famA == famB,
      s"extra family trees must converge: $famB vs $famA")
    // the composition is live, not vacuous: the straddler was refused
    // THROUGH the re-derived extra family, the fresh doc admitted
    assert(!keptA.contains(30L) && keptA.contains(31L),
      s"fixture must exercise the extra family post-scrub: $keptA")
  }

  test("retroactiveScrub prunes derived-tree partitions whose kept " +
    "batch no longer exists (stale pre-scrub artifacts cannot survive)") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("chainprune").toString
    val prefix = "graft_spec_chain_prune"
    def runBatch(id: Long, docs: ChainDoc*): Unit =
      StreamingCurationChain.processBatch(spark, docs.toDF(), prefix,
        s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
        centroids, id)
    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 8)
    runBatch(0L, ChainDoc(40L, "alpha words live in batch zero", "en", "web"))
    runBatch(1L, ChainDoc(41L, "beta words live in batch one", "en", "web"))
    // a stranded derived partition: batch 99 exists in the vector and
    // postings trees but NOT under kept — the torn state a crash
    // during a per-dir compaction fold leaves behind
    StreamingVectorIndex.writeBatch(
      Seq((99L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
        .toDF("cand_id", "cv"), centroids, s"$dir/ivf", 99L)
    StreamingPostingsIndex.writeBatch(
      Seq((99L, "stale stranded text")).toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/post", 99L)
    val pool = StreamingCurationChain.retrainLinePool(spark,
      s"$dir/kept", maxDf = 1L)
    StreamingCurationChain.retroactiveScrub(spark, pool, prefix,
      s"$dir/kept", s"$dir/card", s"$dir/ivf", s"$dir/post",
      centroids, buckets = 8)
    val keptB = StreamingBatchDirs.list(spark, s"$dir/kept")
    assert(StreamingBatchDirs.list(spark, s"$dir/ivf") == keptB,
      "stranded vector partitions must be pruned")
    assert(StreamingBatchDirs.list(spark, s"$dir/post") == keptB,
      "stranded postings partitions must be pruned")
    assert(StreamingVectorIndex.lists(spark, s"$dir/ivf")
        .filter($"cand_id" === 99L).isEmpty,
      "the stale vectors must be gone from the live view")
  }
}
