package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{PropHelper, SparkSpec}

/** [[PortableBloom]]: no false negatives ever (the property the
  * prefilter's correctness rests on), deterministic bit positions,
  * false positives only where the filter is genuinely saturated, and a
  * shuffle-free probe plan.
  */
class PortableBloomSpec extends SparkSpec {

  import spark.implicits._

  private val keyGen = Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)

  test("every seen key hits — no false negatives (200 random keys)") {
    val keys = PropHelper.samples(keyGen, 200).distinct
    val seen = keys.toDF("key")
    val bits = PortableBloom.build(seen, $"key", k = 3, mBits = 1024)
    val probed = PortableBloom.probe(seen, $"key", bits, 3, 1024, "hit")
    assert(probed.filter(!$"hit").count() == 0,
      "a key that was inserted can never miss")
  }

  test("unseen keys can miss; hit semantics = all k bits set") {
    val seen = Seq("a", "b", "c").toDF("key")
    // 3 keys x 3 hashes in a wide filter: nearly every foreign key misses
    val bits = PortableBloom.build(seen, $"key", k = 3, mBits = 1 << 16)
    val foreign = PropHelper.samples(keyGen, 100, seed = 7L)
      .filterNot(Set("a", "b", "c")).toDF("key")
    val hits = PortableBloom.probe(foreign, $"key", bits, 3, 1 << 16, "hit")
      .filter($"hit").count()
    assert(hits == 0, s"9 set bits of 65536 should yield no FP here, got $hits")
  }

  test("probe plan: broadcast joins only, no shuffle of the probe side") {
    val seen = (0 until 50).map(i => s"k$i").toDF("key")
    val bits = PortableBloom.build(seen, $"key", k = 3, mBits = 4096)
    val p = PortableBloom.probe(seen, $"key", bits, 3, 4096, "hit")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"probe side must never shuffle on the bit key:\n$p")
  }

  test("bit positions are stable across calls and within [0, mBits)") {
    val df = Seq("x", "y").toDF("key")
    def pos() = df.select(
      array(PortableBloom.bitPositions($"key", 3, 512): _*).as("p"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val p1 = pos()
    assert(p1 == pos(), "positions must be deterministic")
    assert(p1.flatten.forall(b => b >= 0 && b < 512), p1)
  }
}
