package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The OR-of-contains collapse: results unchanged, plan radically
  * smaller, small chains and mixed predicates left alone.
  */
class ContainsAnyRewriteSpec extends SparkSpec {

  private val kws =
    Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta", "iota")

  private def orChain(c: org.apache.spark.sql.Column) =
    kws.map(k => c.contains(k)).reduce(_ || _)

  private def withExtSession[A](f: SparkSession => A): A = {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions).getOrCreate())
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("wide OR-of-contains rewrites to one exists and keeps results") {
    withExtSession { s =>
      import s.implicits._
      val df = Seq("the beta release", "nothing here", "iota particle", null)
        .toDF("t")
      val filtered = df.filter(orChain(col("t")))
      val optimized = filtered.queryExecution.optimizedPlan.toString
      assert(optimized.contains("exists("), optimized)
      assert(!optimized.contains("Contains(t#") ||
        optimized.split("Contains").length <= 3,
        s"literal chain should have collapsed:\n$optimized")
      assert(filtered.collect().map(_.getString(0)).sorted.toSeq ==
        Seq("iota particle", "the beta release"))
    }
  }

  test("rewrite triggers only at MinTerms; short chains are left alone") {
    withExtSession { s =>
      import s.implicits._
      val df = Seq("x alpha", "y").toDF("t")
      val short = df.filter(
        Seq("alpha", "beta", "gamma").map(k => col("t").contains(k)).reduce(_ || _))
      val p = short.queryExecution.optimizedPlan.toString
      assert(!p.contains("exists("), p)
      assert(short.count() == 1)
    }
  }

  test("mixed disjuncts survive alongside the collapsed group") {
    withExtSession { s =>
      import s.implicits._
      val df = Seq(("no-kw", 99L), ("beta here", 1L), ("zzz", 1L)).toDF("t", "n")
      val mixed = df.filter(orChain(col("t")) || col("n") > 50)
      assert(mixed.collect().map(_.getString(0)).sorted.toSeq ==
        Seq("beta here", "no-kw"))
    }
  }

  test("an interleaved non-contains term splits the run (order preserved)") {
    withExtSession { s =>
      import s.implicits._
      // 5 contains + an unrelated predicate + 4 contains: neither run
      // reaches MinTerms, so NOTHING rewrites — collapsing across the
      // interleaved term would let a later-true contains short-circuit
      // a disjunct that previously evaluated (visible under ANSI
      // errors / nondeterminism)
      val df = Seq(("iota x", 0L), ("plain", 99L)).toDF("t", "n")
      val (front, back) = kws.map(k => col("t").contains(k)).splitAt(5)
      val pred = (front :+ (col("n") > 50)) ++ back
      val q = df.filter(pred.reduce(_ || _))
      val p = q.queryExecution.optimizedPlan.toString
      assert(!p.contains("exists("), s"must not collapse across the run break:\n$p")
      assert(q.count() == 2)
    }
  }

  test("null input keeps three-valued OR semantics (row dropped, no error)") {
    withExtSession { s =>
      import s.implicits._
      val df = Seq(Option("beta x"), None).toDF("t")
      assert(df.filter(orChain(col("t"))).count() == 1)
      // negated: null stays null → dropped by filter in both forms
      assert(df.filter(!orChain(col("t"))).count() == 0)
    }
  }
}
