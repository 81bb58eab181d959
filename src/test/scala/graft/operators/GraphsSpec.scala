package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Graphs.pageRank]] against an independent plain-Scala reference
  * that replays the exact arithmetic contract (round-9 terms, 12-dp
  * decimal sums), plus the invariants: mass conservation, symmetry,
  * multi-edge folding, and layout determinism.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def decSum(xs: Iterable[Double]): Double =
    xs.map(JBD.valueOf(_).setScale(12, RoundingMode.HALF_UP))
      .foldLeft(JBD.ZERO)(_.add(_)).doubleValue

  /** Reference PageRank over folded edges: the operator's integer-nanos
    * formula, replayed with plain Long arithmetic.
    */
  private def ref(edges: Seq[(Long, Long, Double)], iters: Int,
                  num: Long = 17, den: Long = 20): Map[Long, Double] = {
    val S = Graphs.Scale
    val folded = edges.groupBy(e => (e._1, e._2))
      .map { case ((s, t), es) => (s, t, decSum(es.map(_._3))) }.toSeq
    val outW = folded.groupBy(_._1).map { case (s, es) => s -> decSum(es.map(_._3)) }
    val ratioN = folded.map { case (s, t, w) =>
      (s, t) -> math.round(S.toDouble * w / outW(s)) }.toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val base = (2 * (den - num) * S + den * n) / (2 * den * n)
    var rank = nodes.map(v => v -> (2 * S + n) / (2 * n)).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(outW.contains)
      val dang = if (dangling.isEmpty) 0L
        else (2 * dangling.map(rank).sum + n) / (2 * n)
      rank = nodes.map { v =>
        val s = ratioN.collect { case ((u, t), rt) if t == v =>
          (rank(u) * rt + S / 2) / S }.sum
        v -> (base + (2 * num * (s + dang) + den) / (2 * den))
      }.toMap
    }
    rank.map { case (v, rn) => v -> rn.toDouble / S.toDouble }
  }

  private val edges = Seq(
    (1L, 2L, 1.0), (1L, 2L, 0.5), // parallel edge: folds to w=1.5
    (1L, 3L, 2.0), (2L, 3L, 1.0), (2L, 5L, 1.0),
    (3L, 1L, 1.0), (4L, 1L, 1.0)) // node 5: dangling (no out-edges)

  test("matches the plain-Scala reference on a dangling multi-edge graph") {
    val got = Graphs.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = ref(edges, 5)
    assert(got.keySet === want.keySet)
    for ((v, r) <- want) assert(got(v) === r, s"node $v")
  }

  test("rank mass stays ~1 despite per-term rounding") {
    val got = Graphs.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      iters = 5).agg(sum($"rank")).head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-6, s"mass drifted to $got")
  }

  test("uniform ring stays exactly uniform") {
    val ring = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 0L, 1.0))
    val got = Graphs.pageRank(ring.toDF("src", "dst", "w"), "src", "dst", "w",
      iters = 3).collect().map(_.getDouble(1)).distinct
    assert(got === Seq(0.25))
  }

  test("result is identical across input partition layouts") {
    def run(parts: Int) =
      Graphs.pageRank(edges.toDF("src", "dst", "w").repartition(parts),
        "src", "dst", "w", iters = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(1) === run(7))
  }
}
