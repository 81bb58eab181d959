package graft.operators

import org.scalacheck.Gen

import graft.{PropHelper, SparkSpec}

/** [[Percentiles.exactCont]] must agree with the built-in exact
  * `percentile()` aggregate (the per-group value-map formulation it
  * replaces for scale) on arbitrary data: random group sizes, heavy
  * ties, single-element groups, nulls, and the p ∈ {0, 1} edges.
  */
class PercentilesSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)

  private def check(rows: Seq[(String, Option[Double])]): Unit = {
    val df = rows.toDF("g", "v")
    val got = Percentiles.exactCont(df, "g", "v", ps)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val psSql = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val want = df.groupBy($"g")
      .agg(expr(s"percentile(v, $psSql)").as("q"))
      .collect()
      .flatMap { r =>
        val q = r.getSeq[Double](1)
        if (q == null) Nil
        else ps.zipWithIndex.map { case (p, i) => (r.getString(0), p) -> q(i) }
      }
      .toMap
    assert(got.keySet == want.keySet, s"group×p sets differ: $got vs $want")
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) <= 1e-9 * math.max(1.0, math.abs(want(k))),
        s"$k: exactCont=$v builtin=${want(k)}")
    }
  }

  test("single-element, tied, null-keyed, and empty-after-null groups") {
    check(Seq(
      "a" -> Some(42.0),                       // n = 1: every p hits the row
      "b" -> Some(7.0), "b" -> Some(7.0), "b" -> Some(7.0), // all ties
      "c" -> Some(1.0), "c" -> Some(2.0),      // interpolation between 2
      "d" -> None,                             // nulls only: no output row
      (null: String) -> Some(3.0),             // NULL group key is a real
      (null: String) -> Some(5.0)))            // group, like groupBy
  }

  test("multi-column groups (melted metrics) match per-group builtins") {
    val df = Seq(
      ("a", "m1", 1.0), ("a", "m1", 3.0), ("a", "m2", 10.0),
      ("b", "m1", 5.0), ("b", "m2", 2.0), ("b", "m2", 4.0), ("b", "m2", 6.0)
    ).toDF("g", "m", "v")
    val got = Percentiles.exactCont(df, Seq("g", "m"), "v", Seq(0.25, 0.5))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    val want = df.groupBy($"g", $"m")
      .agg(expr("percentile(v, array(0.25D, 0.5D))").as("q"))
      .collect()
      .flatMap { r =>
        val q = r.getSeq[Double](2)
        Seq((r.getString(0), r.getString(1), 0.25) -> q(0),
          (r.getString(0), r.getString(1), 0.5) -> q(1))
      }
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) <= 1e-9, s"$k") }
  }

  test("random groups match the built-in percentile aggregate") {
    val genRow = for {
      g <- Gen.oneOf("g1", "g2", "g3", "g4")
      v <- Gen.frequency(
        8 -> Gen.chooseNum(-1e6, 1e6).map(x => Some(math.rint(x) / 4)), // ties
        1 -> Gen.const(Option.empty[Double]))
    } yield (g, v)
    PropHelper.samples(Gen.listOfN(120, genRow), 8).foreach { rows =>
      check(rows)
    }
  }

  test("thresholds seam: ExactThresholds == exactCont row-for-row; " +
    "SketchThresholds == percentile_approx at the same accuracy, " +
    "same relation shape, nulls skipped") {
    val rows = (0 until 500).map(i =>
      (if (i % 3 == 0) "a" else "b",
        if (i % 97 == 0) Option.empty[Double] else Some((i % 50).toDouble))) ++
      Seq(("nullonly", Option.empty[Double]))
    val df = rows.toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.75)
    def collect(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = collect(
      Percentiles.thresholds(df, Seq("g"), "v", qs, Percentiles.ExactThresholds))
    assert(exact == collect(Percentiles.exactCont(df, Seq("g"), "v", qs)),
      "ExactThresholds must dispatch to exactCont unchanged")
    val sketch = collect(Percentiles.thresholds(df, Seq("g"), "v", qs,
      Percentiles.SketchThresholds(1000)))
    val want = df.filter($"v".isNotNull).groupBy($"g")
      .agg(percentile_approx($"v", array(qs.map(lit): _*), lit(1000)).as("q"))
      .collect()
      .flatMap(r => qs.zipWithIndex.map { case (p, i) =>
        (r.getString(0), p) -> r.getSeq[Double](1)(i) })
      .toMap
    assert(sketch == want,
      "SketchThresholds must equal the raw percentile_approx aggregate")
    assert(!sketch.keySet.exists(_._1 == "nullonly"),
      "all-null groups produce no rows under both sources")
  }

  test("the thresholds seam is free: ExactThresholds plan == exactCont plan") {
    // the round-14 seam routed q94/q122/q140 through thresholds(...,
    // ExactThresholds); this pins that the dispatch adds NOTHING to the
    // physical plan, so any bench movement on those queries cannot be
    // the seam's (the round-15 uptick adjudication)
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.75)
    // expression/plan ids are fresh per instantiation — normalize them
    // away; everything else (operators, exchanges, expressions) must be
    // byte-identical
    def norm(d: org.apache.spark.sql.DataFrame): String =
      d.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
    val viaSeam = norm(Percentiles
      .thresholds(df, Seq("g"), "v", qs, Percentiles.ExactThresholds))
    val direct = norm(Percentiles.exactCont(df, Seq("g"), "v", qs))
    assert(viaSeam == direct, s"plans differ:\n$viaSeam\nvs\n$direct")
  }
}
