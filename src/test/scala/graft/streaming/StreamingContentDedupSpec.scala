package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class DocIn(doc_id: Long, text: String)

/** [[StreamingContentDedup]]: the continuous incremental-dedup gate —
  * intra-batch near-dups collapse to the smallest id, cross-BATCH
  * near-dups are caught via the on-disk band index that each batch
  * extends, and novel documents pass.
  */
class StreamingContentDedupSpec extends SparkSpec {

  test("intra-batch dups collapse; cross-batch dups blocked by the growing index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd").toString
    val in = MemoryStream[DocIn]
    val q = StreamingContentDedup.start(
      in.toDF(), prefix = "graft_spec_streamdedup",
      keptDir = s"$dir/kept", checkpoint = s"$dir/ckpt")
    try {
      // batch 1: 1 and 2 are identical (intra-batch pair -> keep 1);
      // 3 is novel
      in.addData(
        DocIn(1L, "alpha beta gamma delta epsilon zeta"),
        DocIn(2L, "alpha beta gamma delta epsilon zeta"),
        DocIn(3L, "the quick brown fox jumps over lazy dogs"))
      q.processAllAvailable()

      // batch 2: 4 duplicates batch-1's doc 1 (cross-batch -> blocked
      // by the index); 5 is novel
      in.addData(
        DocIn(4L, "alpha beta gamma delta epsilon zeta"),
        DocIn(5L, "entirely new content appears in this batch"))
      q.processAllAvailable()

      val kept = spark.read.parquet(s"$dir/kept")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 5L), s"kept = $kept")

      // the index holds exactly the admitted docs
      val indexed = spark.table("graft_spec_streamdedup_shingles")
        .select("doc_id").as[Long].collect().toSet
      assert(indexed == Set(1L, 3L, 5L), s"indexed = $indexed")
    } finally q.stop()
  }

  test("a tombstoned document stops gating new arrivals — including " +
    "across an at-least-once batch replay") {
    import graft.operators.{Dedup, Tombstones}
    import spark.implicits._
    val prefix = "graft_spec_streamdedup_del"
    val dir = java.nio.file.Files.createTempDirectory("scdd").toString
    def batch(id: Long): org.apache.spark.sql.DataFrame =
      Seq((id, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    def kept(path: String): Set[Long] =
      spark.read.parquet(path).select("doc_id").as[Long].collect().toSet

    StreamingContentDedup.bootstrapIndex(spark, prefix, buckets = 4)
    // batch 1 admits doc 1; batch 2's near-dup doc 10 is gated by it
    StreamingContentDedup.processBatch(spark, batch(1L), prefix,
      s"$dir/b1", jaccardMin = 0.5, buckets = 4)
    StreamingContentDedup.processBatch(spark, batch(10L), prefix,
      s"$dir/b2", jaccardMin = 0.5, buckets = 4)
    assert(kept(s"$dir/b1") == Set(1L) && kept(s"$dir/b2") == Set.empty,
      "pre-delete: doc 1 admitted, its near-dup gated")

    // takedown of doc 1: the index entry must stop suppressing — a
    // re-ingested equivalent document is NEW content now
    Tombstones.write(spark, prefix, Seq(1L).toDF("doc_id"), "doc_id")
    StreamingContentDedup.processBatch(spark, batch(11L), prefix,
      s"$dir/b3", jaccardMin = 0.5, buckets = 4)
    assert(kept(s"$dir/b3") == Set(11L),
      "post-delete: the equivalent document must be admitted")

    // at-least-once replay of the SAME batch: doc 11's own earlier
    // append is same-id-excluded, doc 1 stays tombstoned — the replay
    // admits it again and overwrites its per-batch path idempotently
    StreamingContentDedup.processBatch(spark, batch(11L), prefix,
      s"$dir/b3", jaccardMin = 0.5, buckets = 4)
    assert(kept(s"$dir/b3") == Set(11L),
      "replay must re-admit and stay idempotent")

    // compaction folds the delete in physically; the gate still admits
    // a later equivalent... no — doc 11 is IN the index now, so doc 12
    // is gated by 11, not by the deleted 1 (the index serves the live
    // corpus, not ghosts)
    Dedup.compactBandIndex(spark, prefix, buckets = 4)
    StreamingContentDedup.processBatch(spark, batch(12L), prefix,
      s"$dir/b4", jaccardMin = 0.5, buckets = 4)
    assert(kept(s"$dir/b4") == Set.empty,
      "post-compaction: the live near-dup (doc 11) still gates")
    val ids = spark.table(s"${prefix}_shingles")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(11L), s"compacted index = $ids (doc 1 purged)")
  }
}
