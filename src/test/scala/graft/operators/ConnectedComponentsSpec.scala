package graft.operators

import graft.SparkSpec

/** Unit tests for large-star/small-star connected components — chains
  * (multi-hop propagation), disjoint components, self-loop/duplicate
  * edges, and the adversarial long-chain case that O(diameter)
  * min-label propagation cannot finish in bounded rounds.
  */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain propagates the min label across multiple hops") {
    // 5-4-3-2-1: min label 1 must travel 4 hops
    val got = comps(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct labels") {
    val got = comps(Seq((1L, 2L), (10L, 11L), (11L, 12L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("duplicate and reversed edges are harmless") {
    val got = comps(Seq((2L, 1L), (1L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("edge direction does not matter for label flow") {
    // min vertex only ever appears as destination
    val got = comps(Seq((9L, 1L), (8L, 9L)))
    assert(got == Map(1L -> 1L, 8L -> 1L, 9L -> 1L))
  }

  test("self-loops and isolated-by-self-loop vertices keep their own label") {
    val got = comps(Seq((7L, 7L), (1L, 2L)))
    assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("a 300-node chain converges within O(log n) rounds (diameter 299)") {
    // min-label propagation needs 299 rounds here — far past any sane
    // maxIter; large-star/small-star halves the chain every round.
    val edges = (1L until 300L).map(i => (i + 1, i))
    val got = comps(edges)
    assert(got.size == 300 && got.values.forall(_ == 1L))
  }

  test("random graphs match a driver-side union-find oracle") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      assert(comps(edges) == expect, s"trial $trial")
    }
  }
}
