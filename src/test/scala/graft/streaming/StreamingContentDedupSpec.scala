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
}
