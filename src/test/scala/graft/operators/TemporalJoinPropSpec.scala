package graft.operators

import java.sql.Timestamp

import graft.PropHelper.samples
import graft.SparkSpec
import org.scalacheck.Gen

/** Property tests for the temporal joins: the distributed formulations
  * (union+window as-of; bucketized interval join) must agree with a
  * brute-force in-memory reference on random event sets — including
  * key boundaries, equal timestamps, and empty sides.
  */
class TemporalJoinPropSpec extends SparkSpec {

  import spark.implicits._

  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  // timestamps on a coarse grid so equal-ts collisions actually happen
  private val tsGen = Gen.choose(0, 40).map(m => new Timestamp(base + m * 60000L))
  private val keyGen = Gen.choose(1L, 4L)

  private val leftGen = Gen.listOfN(12,
    Gen.zip(keyGen, tsGen)).map(_.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })
  // right side unique per (key, ts) — the operator's documented contract
  private val rightGen = Gen.listOfN(10, Gen.zip(keyGen, tsGen))
    .map(_.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) })

  test("as-of backward agrees with the brute-force reference") {
    samples(Gen.zip(leftGen, rightGen), 12).foreach { case (ls, rs) =>
      val left = ls.toDF("id", "k", "ts")
      val right = rs.toDF("k", "ts", "payload")
      val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts")
        .select("id", "asof_payload")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap

      ls.foreach { case (id, k, t) =>
        val expect = rs.filter(r => r._1 == k && !r._2.after(t))
          .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
        assert(got(id) == expect,
          s"as-of mismatch for id=$id k=$k t=$t: got ${got(id)}, want $expect")
      }
    }
  }

  test("interval-join pairs agree with the brute-force reference") {
    val windowSec = 300L
    samples(Gen.zip(leftGen, rightGen), 12).foreach { case (ls, rs) =>
      val probes = ls.toDF("id", "k", "ts")
      val cands = rs.toDF("k", "ts", "payload")
      val got = RangeJoin.lookbackPairs(probes, cands, Seq("k"), "ts", "ts", windowSec)
        .select("id", "cand_payload")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val want = (for {
        (id, k, t) <- ls
        (ck, ct, p) <- rs
        if ck == k &&
          ct.getTime >= t.getTime - windowSec * 1000 &&
          ct.getTime < t.getTime
      } yield (id, p)).toSet
      assert(got == want, s"interval mismatch: extra=${got -- want} missing=${want -- got}")
    }
  }
}
