package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The native dot product must be BIT-IDENTICAL to the builtin
  * `aggregate(zip_with(...))` composition it replaced — same sequential
  * double accumulation, same null propagation — because the DuckDB oracle
  * reproduces that exact float pipeline.
  */
class DotProductSpec extends SparkSpec {

  import spark.implicits._

  private def builtinDot(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the aggregate/zip_with composition on floats") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
    val vecs = graft.PropHelper.samples(Gen.zip(vecGen, vecGen), 50)
    val df = vecs.toDF("a", "b")
      .select(dot($"a", $"b").as("native"), builtinDot($"a", $"b").as("builtin"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} builtin=${r.getDouble(1)}")
    }
  }

  test("null propagation: null side, length mismatch, null element") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]),          // null side
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),                     // length mismatch
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0)))                 // ok
    ).toDF("a", "b")
    val out = df.select(dot($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) == null && out(1) == null && out(2) == 5.0)
  }

  test("empty arrays dot to 0.0 (like the builtin composition)") {
    val df = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    assert(df.select(dot($"a", $"b")).head.getDouble(0) == 0.0)
  }

  test("registered as SQL function dot_product") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
    assert(r.head.getDouble(0) == 11.0)
  }
}
