package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join shapes for hostile data distributions at scale (SURVEY §4.4):
  * salting for skewed keys, bucketing for shuffle-free co-located joins.
  * AQE's skew-join handling covers many cases automatically; explicit
  * salting remains necessary when one logical key exceeds what a single
  * task can hold even after AQE splitting (the classic "null key" /
  * power-user problem), and bucketing when the same large join repeats
  * across many queries.
  */
object ScaleJoins {

  /** Salted inner equi-join for a skewed LEFT side: left rows get a
    * random salt in [0, buckets); the (small-enough-to-replicate but
    * too-big-to-broadcast) right side is replicated `buckets` times.
    * One skewed key then lands in `buckets` different shuffle
    * partitions instead of one straggler task.
    *
    * `rand(seed)` is fine here: the salt only chooses a partition, it
    * never changes the join result, so nondeterminism does not affect
    * correctness (retries may route rows differently — same output).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int, seed: Long = 42L): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      (rand(seed) * buckets).cast("int"))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(explodedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * shuffle-free (co-located partitions). Returns the two catalog table
    * names. `numBuckets` should match the target parallelism of the
    * repeated join, not the one-off write.
    */
  def writeBucketedPair(
      spark: SparkSession,
      left: DataFrame, leftTable: String,
      right: DataFrame, rightTable: String,
      key: String, numBuckets: Int): (String, String) = {
    def write(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite")
        .bucketBy(numBuckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    write(left, leftTable)
    write(right, rightTable)
    (leftTable, rightTable)
  }
}
