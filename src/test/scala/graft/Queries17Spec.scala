package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Hand-computed oracles for the round-11 part-11 customer-analytics
  * queries (DuckDB parity runs separately via Verify): a 4-customer
  * RFM lattice, a constructed basket-lift table, and a two-cohort LTV
  * triangle.
  */
class Queries17Spec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("q140: four archetype customers land in the diagonal segments") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q17s").toString
    // customer k: k orders, last on day k, each worth 100*k —
    // recency, frequency, and monetary ranks all order 4,3,2,1
    val rows = for {
      k <- 1 to 4; i <- 1 to k
    } yield (k.toLong * 100 + i, k.toLong, ts(f"2024-01-$k%02d 12:00:00"),
      100.0 * k)
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q140_rfm_segments")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // rank i (1 = best) maps to customer 5-i: (i,i,i) with 1 customer
    assert(out.toSeq == (1 to 4).map { i =>
      val k = 5 - i; (i.toLong, i.toLong, i.toLong, 1L, 100.0 * k * k)
    }, out.mkString("; "))
  }

  test("q141: lift reflects marginals; sub-floor pairs are cut") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q17t").toString
    // 20 orders {A,B}, 4 orders {A,C}, 4 orders {C}: AB passes the
    // floor with lift 20*28/(24*20) = 1.166667; AC (4) is cut
    val baskets =
      (1 to 20).map(i => (i.toLong, Seq("A", "B"))) ++
        (21 to 24).map(i => (i.toLong, Seq("A", "C"))) ++
        (25 to 28).map(i => (i.toLong, Seq("C")))
    val brands = Map("A" -> 1L, "B" -> 2L, "C" -> 3L)
    baskets.flatMap { case (ok, bs) => bs.map(b => (ok, brands(b))) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    brands.toSeq.map { case (b, k) => (k, s"Brand#$b") }
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = SparkEntry.queries("q141_basket_affinity")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("Brand#A", "Brand#B", 20L, 1.166667)),
      out.mkString("; "))
  }

  test("q142: cumulative LTV divides by the COHORT size, not actives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q17u").toString
    // cohort 2023: u1 (100 in y0, 50 in y1), u2 (100 in y0 only) —
    // age0: 200/2 = 100; age1: (200+50)/2 = 125 with 1 active
    Seq(
      (1L, 1L, ts("2023-06-01 00:00:00"), 100.0),
      (2L, 2L, ts("2023-07-01 00:00:00"), 100.0),
      (3L, 1L, ts("2024-06-01 00:00:00"), 50.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q142_ltv_cohorts")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq((2023L, 0L, 2L, 100.0), (2023L, 1L, 1L, 125.0)),
      out.mkString("; "))
  }
}
