package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {

  test("salted join returns exactly the plain join's result on skewed data") {
    import spark.implicits._
    // 90% of rows share one key — the classic straggler shape
    val left = spark.range(0, 20000)
      .select(when($"id" % 10 === 0, $"id" % 50).otherwise(7L).as("k"),
        $"id".as("payload"))
    val right = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = left.join(right, "k")
    val salted = ScaleJoins.saltedJoin(left, right, "k", buckets = 8)

    assert(salted.count() == plain.count())
    val a = plain.orderBy("k", "payload").collect().toSeq
    val b = salted.select("k", "payload", "attr").orderBy("k", "payload").collect().toSeq
    assert(a == b)
  }

  test("salting spreads the hot key across shuffle partitions") {
    import spark.implicits._
    val left = spark.range(0, 8000).select(lit(7L).as("k"), $"id".as("payload"))
    val right = Seq((7L, "hot")).toDF("k", "attr")
    val salted = ScaleJoins.saltedJoin(left, right, "k", buckets = 8)
    // the single logical key occupies several (key, salt) shuffle keys
    val saltsUsed = left.withColumn("_salt", (rand(42L) * 8).cast("int"))
      .select("_salt").distinct().count()
    assert(saltsUsed > 4)
    assert(salted.count() == 8000)
  }

  test("two-phase shape: hot/cold split present, uniform data takes the cold path") {
    import spark.implicits._
    // perfectly uniform keys → the sampled histogram finds nothing hot →
    // every row flows through the plain (unreplicated) cold join
    val left = spark.range(0, 1000).select(($"id" % 500).as("k"), $"id".as("payload"))
    val right = (0L until 500L).map(k => (k, s"d$k")).toDF("k", "attr")
    val joined = ScaleJoins.saltedJoin(left, right, "k", buckets = 8)
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"cold branch must be a plain join:\n$plan")
    assert(plan.contains("LeftSemi"), s"salted branch must be hot-key guarded:\n$plan")
  }

  test("null join keys behave exactly as in the plain inner join (dropped)") {
    import spark.implicits._
    val left = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (1L, "c"), (null, "d"))
      .toDF("k", "payload")
    val right = Seq((1L, "dim")).toDF("k", "attr")
    val salted = ScaleJoins.saltedJoin(left, right, "k", buckets = 4)
    val plain = left.join(right, "k")
    assert(salted.count() == plain.count() && plain.count() == 2)
  }

  test("bucketed tables join without a shuffle") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-wh")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bx LOCATION '${wh.toString}'")
    // Turn off auto-broadcast: with a broadcastable side the planner
    // (correctly) prefers broadcast and ignores the buckets — the
    // bucketing payoff is for two LARGE sides, which is what we force.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = spark.range(0, 10000)
        .select(($"id" % 100).as("k"), $"id".as("v"))
      val dims = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("w"))
      ScaleJoins.writeBucketedPair(spark,
        facts, "graft_bx.facts", dims, "graft_bx.dims", "k", numBuckets = 4)

      val joined = spark.table("graft_bx.facts")
        .join(spark.table("graft_bx.dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must be shuffle-free:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP DATABASE IF EXISTS graft_bx CASCADE")
    }
  }
}
