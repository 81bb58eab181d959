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

  test("empty cells keep their previous centroid (codebook size stable)") {
    // k=5 over 3 blobs: at least 2 cells end up empty after the first
    // assignment; they must survive with k rows in the codebook
    val cent = Similarity.kmeans(blobs, "embedding", "vec_id",
      k = 5, iters = 3, seed = 1)
    assert(cent.count() == 5)
    assert(cent.select("centroid_id").distinct().count() == 5)
  }
}
