package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity.pqTrain]]/[[Similarity.pqCodeCol]]/[[Similarity.pqReconCol]]:
  * codebook shape, code range and determinism, identical vectors coding
  * identically, and reconstruction = the literal codebook lookup.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  // 4-dim vectors, 2 subspaces of 2 dims; two well-separated directions
  // per subspace so a 2-cell codebook is stable
  private val vecs = Seq(
    (0L, Seq(1.0f, 0.1f, 0.1f, 1.0f)),
    (1L, Seq(0.9f, 0.2f, 0.2f, 0.9f)),
    (2L, Seq(0.1f, 1.0f, 1.0f, 0.1f)),
    (3L, Seq(0.2f, 0.9f, 0.9f, 0.2f)),
    (4L, Seq(1.0f, 0.1f, 0.1f, 1.0f)) // exact duplicate of vec 0
  ).toDF("vec_id", "embedding")

  private def codebook() = Similarity.pqTrain(
    vecs, "embedding", "vec_id", m = 2, subDim = 2, k = 2, iters = 2, seed = 5)

  test("codebook: m x k rows, subDim-wide centroids") {
    val cb = codebook().collect()
    assert(cb.length == 4, cb.toSeq)
    assert(cb.map(r => (r.getInt(0), r.getLong(1))).toSet
      == Set((0, 0L), (0, 1L), (1, 0L), (1, 1L)))
    assert(cb.forall(_.getSeq[Double](2).length == 2))
  }

  test("codes: in range, deterministic, equal vectors code equally; recon = lookup") {
    val cb = codebook().collect()
    val cents: Seq[Seq[Seq[Double]]] = (0 until 2).map { j =>
      cb.filter(_.getInt(0) == j).sortBy(_.getLong(1))
        .map(_.getSeq[Double](2).toSeq).toSeq
    }
    val codes = (0 until 2).map(j =>
      Similarity.pqCodeCol($"embedding", j, 2, cents(j)))
    val out = vecs.select($"vec_id", codes(0).as("c0"), codes(1).as("c1"),
        Similarity.pqReconCol(codes, cents).as("rv"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getSeq[Double](3).toSeq))).toMap
    assert(out.values.forall { case (c0, c1, _) =>
      Set(0, 1)(c0) && Set(0, 1)(c1) }, out)
    assert(out(0L) == out(4L), "identical vectors must code identically")
    // reconstruction is exactly the concatenated codebook entries
    out.values.foreach { case (c0, c1, rv) =>
      assert(rv == cents(0)(c0) ++ cents(1)(c1), (rv, c0, c1))
    }
    // the two separated directions land in different cells per subspace
    assert(out(0L)._1 != out(2L)._1, "subspace 0 must separate the groups")
    assert(out(0L)._2 != out(2L)._2, "subspace 1 must separate the groups")
  }
}
