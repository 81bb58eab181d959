package graft.operators

import graft.SparkSpec

/** [[Similarity.kmeans]]: on direction-separated blobs the trained
  * codebook must put each blob in its own cell, be deterministic across
  * runs, and keep empty cells alive with their previous centroid.
  */
class KMeansSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  // three blobs pointing along orthogonal axes (cosine-separated), with
  // deterministic jitter small enough to never cross an axis boundary
  private def blobs = (0 until 90).map { i =>
    val axis = i % 3
    val base = Array.fill(4)(0.05 + (i % 7) * 0.01)
    base(axis) = 1.0
    (i.toLong, base.toSeq)
  }.toDF("vec_id", "embedding")

  test("blobs land in distinct cells; codebook deterministic") {
    def train() = Similarity.kmeans(blobs, "embedding", "vec_id",
      k = 3, iters = 4, seed = 1)
    val cent = train()
    val assigned = Similarity.ivfAssign(blobs, "embedding", "vec_id", cent)
      .select($"vec_id", $"cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member of a blob shares a cell, and the three blobs use
    // three different cells
    val cellsByBlob = (0 until 3).map { axis =>
      val cells = assigned.collect { case (id, c) if id % 3 == axis => c }.toSet
      assert(cells.size == 1, s"blob $axis split across cells: $cells")
      cells.head
    }
    assert(cellsByBlob.toSet.size == 3, s"blobs merged: $cellsByBlob")

    val c1 = cent.orderBy($"centroid_id").collect().map(_.toString).toSeq
    val c2 = train().orderBy($"centroid_id").collect().map(_.toString).toSeq
    assert(c1 == c2, "codebook must be deterministic across runs")
  }

  test("ivfAssign nprobe=1 aggregate argmax equals the sort-window " +
    "reference (ties to the smallest centroid id)") {
    // round-19: the single-cell assignment was re-expressed as a
    // partial-aggregable max(struct) (guide §2.3). Pin it row-for-row
    // against the window form it replaced, on a codebook with EXACT
    // cosine ties (duplicate centroids) so the smallest-cid tie-break
    // is actually exercised.
    import org.apache.spark.sql.expressions.Window
    val cent = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0, 0.0)), // duplicate of 0: forced tie
      (3L, Seq(0.0, 0.0, 1.0, 0.0))
    ).toDF("centroid_id", "centroid_vec")
    val got = Similarity.ivfAssign(blobs, "embedding", "vec_id", cent)
      .select($"vec_id", $"cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy($"vec_id")
      .orderBy($"_ccos".desc, $"centroid_id")
    val ref = blobs.crossJoin(broadcast(cent))
      .withColumn("_ccos", round(
        graft.functions.GraftFunctions.cosine($"embedding", $"centroid_vec"), 6))
      .withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1)
      .select($"vec_id", $"centroid_id".as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref, s"aggregate argmax diverged from the window " +
      s"reference: ${got.toSeq.diff(ref.toSeq).take(5)}")
    // the tie really fired: axis-0 blob members must sit in cell 0,
    // never the duplicate cell 2
    assert(got.collect { case (id, c) if id % 3 == 0 => c }.toSet == Set(0L))
  }

  test("empty cells keep their previous centroid (codebook size stable)") {
    // k=5 over 3 blobs: at least 2 cells end up empty after the first
    // assignment; they must survive with k rows in the codebook
    val cent = Similarity.kmeans(blobs, "embedding", "vec_id",
      k = 5, iters = 3, seed = 1)
    assert(cent.count() == 5)
    assert(cent.select("centroid_id").distinct().count() == 5)
  }
}
