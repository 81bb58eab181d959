package graft.operators

import graft.SparkSpec

/** Unit tests for min-label connected components — chains (multi-hop
  * propagation), disjoint components, and self-loop/duplicate edges.
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
}
