package graft

import org.apache.spark.sql.functions._

/** The q43 contract: `percentile_approx(accuracy = a)` returns a value
  * whose RANK is within n/a of the requested rank — pinned against the
  * exact aggregate on real table data. Since round 9 the q43 ORACLE
  * also checks this contract in SQL per engine (each side verifies its
  * own sketch against its own exact ranks and emits an
  * engine-independent verdict); this spec keeps the tighter
  * per-value assertion.
  */
class ApproxPercentileSpec extends SparkSpec {

  test("approx percentile rank error is within n/accuracy of exact") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_extendedprice".as("v"))
    val n = li.count()
    val accuracy = 1000
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val approx = li.agg(
        percentile_approx($"v", lit(p), lit(accuracy))).head().getDouble(0)
      // true rank of the returned value vs the requested rank
      val rank = li.filter($"v" <= approx).count()
      val err = math.abs(rank - p * n)
      assert(err <= n.toDouble / accuracy + 1,
        s"p=$p: rank $rank vs target ${p * n} (n=$n, bound ${n / accuracy})")
    }
  }

  test("q43 groups match q35 exactly where the sketch is exact (small groups)") {
    // with accuracy >= group size the sketch degenerates to exact ranks,
    // so the approx value must be an actual element within the group
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(percentile_approx($"v", lit(0.5), lit(10000)).as("m"))
      .head().getDouble(1)
    assert(got == 50.0 || got == 51.0, s"median of 1..100 must be 50/51, got $got")
  }
}
