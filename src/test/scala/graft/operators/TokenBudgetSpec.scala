package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions.hash64
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase prefix-sum must equal the naive single-partition global
  * window, and the budget boundary must be inclusive.
  */
class TokenBudgetSpec extends SparkSpec {

  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, (i % 13 + 1).toInt)).toDF("id", "toks")

  private def naive(budget: Long) = {
    val w = Window.orderBy(col("_h").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_h", hash64(col("id").cast("string"), 17))
      .withColumn("cum_tokens", sum(col("toks").cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select("id", "toks", "cum_tokens")
  }

  test("two-phase prefix sum equals the global-window reference") {
    for (budget <- Seq(50L, 300L, 100000L)) {
      val got = TokenBudget.take(docs, "id", "toks", budget, numParts = 7)
        .select("id", "toks", "cum_tokens")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val want = naive(budget)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == want, s"budget=$budget: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("budget boundary is inclusive and the next row is dropped") {
    val all = TokenBudget.take(docs, "id", "toks", Long.MaxValue, numParts = 5)
      .select("cum_tokens").as[Long].collect().sorted
    val cut = all(10) // an exact cumulative value
    val kept = TokenBudget.take(docs, "id", "toks", cut, numParts = 5)
      .select("cum_tokens").as[Long].collect().sorted
    assert(kept.length == 11 && kept.last == cut)
  }

  test("more partitions than rows is harmless") {
    val tiny = Seq((1L, 5), (2L, 5)).toDF("id", "toks")
    val out = TokenBudget.take(tiny, "id", "toks", 7L, numParts = 16)
    assert(out.count() == 1)
  }
}
