package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{PropHelper, SparkSpec}

/** [[CountMin]]: estimates never undercount (the sketch's one-sided
  * guarantee), a wide sketch counts exactly, unseen keys estimate 0,
  * and the probe plan stays broadcast-only.
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  // skewed multiset: key "k0" is hot, the tail is thin
  private val items = PropHelper.samples(Gen.choose(0, 40), 500)
    .map(i => s"k${if (i > 30) 0 else i}").toDF("key")

  test("never undercounts; wide sketch is exact") {
    val truth = items.groupBy($"key").agg(count(lit(1)).as("n_true"))
    def est(width: Int) = CountMin.estimate(
      truth, $"key", CountMin.build(items, $"key", 3, width), 3, width, "n_est")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val narrow = est(16) // 31 keys in 16 buckets: collisions guaranteed
    assert(narrow.forall { case (_, t, e) => e >= t },
      s"count-min must never undercount: ${narrow.filter(r => r._3 < r._2).toSeq}")
    assert(narrow.exists { case (_, t, e) => e > t },
      "16 buckets over 31 keys should collide somewhere")
    val wide = est(1 << 16)
    assert(wide.forall { case (_, t, e) => e == t },
      s"65536 buckets over 31 keys should be exact: ${wide.toSeq}")
  }

  test("buildWeighted over the key histogram equals build over the raw " +
    "multiset, cell for cell") {
    // the q69 one-pass shape: a pre-aggregated (key, count) histogram
    // must produce the IDENTICAL sketch the per-occurrence build does
    val hist = items.groupBy($"key").agg(count(lit(1)).as("n"))
    val viaHist = CountMin.buildWeighted(hist, $"key", $"n", 3, 512)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaRaw = CountMin.build(items, $"key", 3, 512)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaHist == viaRaw,
      s"weighted build diverged: ${viaHist.toSeq.diff(viaRaw.toSeq).take(5)}")
  }

  test("depth=1 sketch estimates without crashing (single-row least)") {
    val truth = items.groupBy($"key").agg(count(lit(1)).as("n_true"))
    val out = CountMin.estimate(truth, $"key",
      CountMin.build(items, $"key", 1, 1 << 16), 1, 1 << 16, "n_est")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.forall { case (t, e) => e == t },
      "one row, 65536 buckets over 31 keys: exact")
  }

  test("unseen keys estimate 0 in a wide sketch") {
    val sketch = CountMin.build(items, $"key", 3, 1 << 16)
    val out = CountMin.estimate(Seq("absent-key-xyz").toDF("key"),
      $"key", sketch, 3, 1 << 16, "n_est")
      .collect().map(_.getLong(1))
    assert(out.toSeq == Seq(0L), out.toSeq)
  }

  test("sketches merge by cell-wise addition") {
    // the distributable/streamable property: sketch(A) + sketch(B) ==
    // sketch(A ++ B), cell for cell
    val (a, b) = (items.limit(200), items.exceptAll(items.limit(200)))
    val merged = CountMin.build(a, $"key", 3, 512)
      .unionByName(CountMin.build(b, $"key", 3, 512))
      .groupBy($"r", $"bucket").agg(sum($"cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = CountMin.build(items, $"key", 3, 512)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("estimate plan: broadcast joins only, probe side never shuffles") {
    val sketch = CountMin.build(items, $"key", 3, 1024)
    val p = CountMin.estimate(items.distinct(), $"key", sketch, 3, 1024, "e")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"probe must stay map-side:\n$p")
  }
}
