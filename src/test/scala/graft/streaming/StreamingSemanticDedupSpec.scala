package graft.streaming

import graft.SparkSpec

/** [[StreamingSemanticDedup]]: cross-corpus refusal against the
  * streaming vector index, intra-batch keep-smallest through the same
  * probe geometry, replay consistency against the crashed attempt's
  * own partition, the nprobe dial, and tombstone unblocking.
  */
class StreamingSemanticDedupSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def cents = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))
  ).toDF("centroid_id", "centroid_vec")

  private def batchDf(rows: (Long, Seq[Double])*) =
    rows.toDF("doc_id", "cv")

  private def gate(batch: org.apache.spark.sql.DataFrame, path: String,
                   tau: Double = 0.99, nprobe: Int = 1,
                   tomb: Option[org.apache.spark.sql.DataFrame] = None) =
    StreamingSemanticDedup.gateBatch(spark, batch, "doc_id", "cv",
        cents, path, tau, nprobe, tomb)
      .select("doc_id").as[Long].collect().sorted.toSeq

  test("cross-corpus match drops; orthogonal admits; intra-batch pair " +
    "keeps the smaller id") {
    val dir = java.nio.file.Files.createTempDirectory("ssd1").toString
    StreamingVectorIndex.writeBatch(
      batchDf((1L, Seq(1.0, 0.01)))
        .select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 0L)
    val admitted = gate(batchDf(
      (5L, Seq(0.99, 0.0)),   // ~doc 1 in the index -> refused
      (6L, Seq(0.0, 1.0)),    // orthogonal -> admitted
      (7L, Seq(0.2, 1.0)),    // intra pair with 8 (cos ~1) -> kept (smaller)
      (8L, Seq(0.2, 0.999))), s"$dir/ivf")
    assert(admitted == Seq(6L, 7L),
      s"expected 5 refused vs index, 8 refused vs 7: $admitted")
  }

  test("empty index (before any batch commits): only intra-batch " +
    "verdicts fire") {
    val dir = java.nio.file.Files.createTempDirectory("ssd2").toString
    val admitted = gate(batchDf(
      (5L, Seq(0.99, 0.0)),
      (6L, Seq(1.0, 0.01))), s"$dir/ivf")
    assert(admitted == Seq(5L), s"smaller id survives an empty index: $admitted")
  }

  test("replay consistency: re-gating the same batch AFTER its kept " +
    "docs were appended (the crash-after-stage-3 state) admits the " +
    "identical set") {
    val dir = java.nio.file.Files.createTempDirectory("ssd3").toString
    StreamingVectorIndex.writeBatch(
      batchDf((1L, Seq(1.0, 0.0))).select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 0L)
    // a batch with an intra pair (10 < 11) and a novel doc straddling
    // nothing; nprobe = 2 so the probe geometry is the wide one
    val b = batchDf(
      (10L, Seq(0.3, 1.0)),
      (11L, Seq(0.3, 0.999)),
      (12L, Seq(0.7, 0.7)))
    val first = gate(b, s"$dir/ivf", nprobe = 2)
    // simulate stage 3 of the crashed attempt: the ADMITTED docs'
    // vectors land under this batch's partition
    StreamingVectorIndex.writeBatch(
      b.join(first.toDF("doc_id"), Seq("doc_id"))
        .select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 1L)
    val replay = gate(b, s"$dir/ivf", nprobe = 2)
    assert(replay == first,
      s"replay must admit the same set: first=$first replay=$replay")
  }

  test("nprobe dial: a boundary-straddling near-dup is missed at " +
    "nprobe = 1, caught at nprobe = 2") {
    val dir = java.nio.file.Files.createTempDirectory("ssd4").toString
    StreamingVectorIndex.writeBatch(
      batchDf((1L, Seq(1.0, 0.999))).select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 0L)
    val probe = batchDf((9L, Seq(0.999, 1.0)))   // other side of 45 deg
    assert(gate(probe, s"$dir/ivf", tau = 0.99, nprobe = 1) == Seq(9L),
      "cell-local probe cannot see across the boundary")
    assert(gate(probe, s"$dir/ivf", tau = 0.99, nprobe = 2) == Seq(),
      "the second-nearest cell recovers the match")
  }

  test("a tombstoned index entry is invisible: the takedown un-blocks " +
    "future equivalents immediately") {
    val dir = java.nio.file.Files.createTempDirectory("ssd5").toString
    StreamingVectorIndex.writeBatch(
      batchDf((1L, Seq(1.0, 0.01))).select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 0L)
    val probe = batchDf((5L, Seq(0.99, 0.0)))
    assert(gate(probe, s"$dir/ivf") == Seq(),
      "premise: the live entry blocks")
    val snap = Seq(1L).toDF("id")
    assert(gate(probe, s"$dir/ivf", tomb = Some(snap)) == Seq(5L),
      "under the marker the same probe admits")
  }
}
