package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Unit tests for the bucketized interval join — boundary inclusion and
  * the cross-bucket candidate case that the 2-bucket explode exists for.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lookbackPairs: [t-W, t) boundaries are exact") {
    val probes = Seq((1L, 10L, ts("2026-01-01 10:00:00"))).toDF("id", "k", "ts")
    val cands = Seq(
      (10L, ts("2026-01-01 09:00:00"), "at-lower-bound"), // == t-W → in
      (10L, ts("2026-01-01 08:59:59"), "below-lower"), // < t-W  → out
      (10L, ts("2026-01-01 09:30:00"), "inside"), // in
      (10L, ts("2026-01-01 10:00:00"), "at-probe-ts"), // == t   → out
      (20L, ts("2026-01-01 09:30:00"), "other-key") // wrong key → out
    ).toDF("k", "ts", "tag")

    val got = RangeJoin.lookbackPairs(probes, cands, Seq("k"), "ts", "ts", 3600L)
      .select("cand_tag").as[String].collect().toSet
    assert(got == Set("at-lower-bound", "inside"))
  }

  test("lookbackPairs: candidates in the previous bucket are found") {
    // probe at 10:00:10; candidate at 09:59:50 lives in the PREVIOUS
    // 60-second bucket — only reachable through the b-1 explode leg.
    val probes = Seq((1L, 1L, ts("2026-01-01 10:00:10"))).toDF("id", "k", "ts")
    val cands = Seq((1L, ts("2026-01-01 09:59:50"), "prev-bucket"))
      .toDF("k", "ts", "tag")
    val got = RangeJoin.lookbackPairs(probes, cands, Seq("k"), "ts", "ts", 60L)
      .select("cand_tag").as[String].collect().toSeq
    assert(got == Seq("prev-bucket"))
  }

  test("lookbackPairs: no duplicate pairs from the 2-bucket explode") {
    // a candidate matching the probe can only be joined via ONE bucket
    // (its own), so the pair appears exactly once.
    val probes = Seq((1L, 1L, ts("2026-01-01 10:00:30"))).toDF("id", "k", "ts")
    val cands = Seq(
      (1L, ts("2026-01-01 10:00:00"), "same-bucket"),
      (1L, ts("2026-01-01 09:59:45"), "prev-bucket")).toDF("k", "ts", "tag")
    val rows = RangeJoin.lookbackPairs(probes, cands, Seq("k"), "ts", "ts", 60L)
      .select("cand_tag").as[String].collect().toSeq.sorted
    assert(rows == Seq("prev-bucket", "same-bucket"))
  }

  test("lookbackPairs: probes with no candidates drop out (inner join)") {
    val probes = Seq((1L, 1L, ts("2026-01-01 10:00:00"))).toDF("id", "k", "ts")
    val cands = Seq((2L, ts("2026-01-01 09:30:00"), "x")).toDF("k", "ts", "tag")
    assert(RangeJoin.lookbackPairs(probes, cands, Seq("k"), "ts", "ts", 3600L).count() == 0)
  }
}
