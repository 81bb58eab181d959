package graft.operators

import scala.util.chaining._

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

  /** Skew-aware salted inner equi-join — two-phase:
    *
    *  1. SAMPLE the left side and estimate per-key row counts. Keys
    *     whose estimated count exceeds `skewFactor ×` the average
    *     shuffle-partition share are HOT (capped at `maxHotKeys`; the
    *     per-key frequency table is persisted spill-safely only within
    *     this call, and phase-1 cost is proportional to
    *     `sampleFraction`, not to the left side).
    *  2. COLD keys — almost all of them — take the plain shuffled join
    *     with ZERO replication. HOT left rows get a random salt in
    *     [0, buckets); only the right rows whose key is hot are
    *     replicated `buckets` times. The result is the union of the
    *     two joins.
    *
    * This replaces naive full-replication salting (entire right side
    * ×buckets — 8× the shuffle volume for every row, hot or not):
    * replication cost is now `buckets × |right rows at hot keys|`,
    * proportional to the actual skew. The hot-key table (≤ maxHotKeys
    * rows) is pinned ([[Checkpoints.pin]]) and broadcast into the semi/anti
    * guards, so phase 1 runs once, not per branch.
    *
    * `rand(seed)` is fine for the salt: it only picks a partition and
    * never changes the join result, so retries routing rows
    * differently still produce the same output. Null join keys land in
    * the cold branch and fall out of the inner join — exactly as in
    * the plain join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int, seed: Long = 42L,
                 sampleFraction: Double = 0.05,
                 skewFactor: Double = 4.0,
                 maxHotKeys: Int = 10000): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    require(sampleFraction > 0 && sampleFraction <= 1,
      "sampleFraction must be in (0, 1]")
    // "spark.sql.shuffle.partitions" can hold a non-numeric value on
    // AQE-managed platforms (e.g. "auto"); fall back to the context's
    // default parallelism rather than throwing on the parse
    val numParts = scala.util
      .Try(left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(left.sparkSession.sparkContext.defaultParallelism)
    val sampled =
      if (sampleFraction < 1.0) left.sample(sampleFraction, seed) else left
    val freq = sampled.groupBy(col(key)).count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val estTotal =
        freq.agg(coalesce(sum("count"), lit(0L))).head().getLong(0)
      // a key is hot when one task would carry skewFactor× the average
      // partition share of the (estimated) left side
      val hotCut = math.max(1.0, skewFactor * estTotal.toDouble / numParts)
      val hot = freq.filter(col("count") >= hotCut)
        .orderBy(col("count").desc).limit(maxHotKeys)
        .select(col(key))
        .pipe(Checkpoints.pin)

      val coldJoin = left.join(broadcast(hot), Seq(key), "left_anti")
        .join(right, Seq(key))
      val hotLeft = left.join(broadcast(hot), Seq(key), "left_semi")
        .withColumn("_salt", (rand(seed) * buckets).cast("int"))
      val hotRight = right.join(broadcast(hot), Seq(key), "left_semi")
        .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
      val hotJoin = hotLeft.join(hotRight, Seq(key, "_salt")).drop("_salt")
      coldJoin.unionByName(hotJoin)
    } finally freq.unpersist()
  }

  /** Write `df` as a parquet catalog table bucketed+sorted by
    * `bucketCol`, so later equi-joins keyed on it read the table
    * co-partitioned from disk (no table-side Exchange). Clears any
    * stale managed-table location first: a previous JVM's files outlive
    * the in-memory catalog, and `saveAsTable` refuses a fresh table
    * over them (LOCATION_ALREADY_EXISTS). Shared by the on-disk index
    * builders ([[graft.operators.Dedup.writeBandIndex]],
    * [[graft.operators.Similarity.writeIvfIndex]]).
    */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCol: String, buckets: Int): String = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // Cluster rows to their bucket BEFORE the write (round 19; guide
    // §6 small-files): repartition(buckets, key) uses the same
    // pmod(murmur3, n) arithmetic as Spark's bucket-id assignment, so
    // each write task holds exactly one whole bucket and emits ONE
    // file — without it every task writes a file per bucket it
    // happens to hold (tasks × buckets tiny files at scale: slower
    // build, slower probe opens, heavier listing). Same rows, same
    // bucketed layout, strictly fewer files.
    df.repartition(buckets, col(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
    table
  }

  /** Write `df` as a parquet catalog table PARTITIONED by `partCol` —
    * the time-axis layout a 100 TB event store ships with: a predicate
    * on the partition column prunes whole directories at planning time
    * (`PartitionFilters` in the scan, zero I/O for pruned days), where
    * the unpartitioned layout scans every file and filters rows.
    * Bucketing (above) co-locates JOIN keys; partitioning prunes SCAN
    * ranges — a production store uses both (partition by day, bucket by
    * user). Same stale-location cleanup contract as [[writeBucketed]].
    */
  def writePartitioned(df: DataFrame, table: String,
                       partCol: String): String = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partCol)
      .saveAsTable(table)
    table
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
    writeBucketed(left, leftTable, key, numBuckets)
    writeBucketed(right, rightTable, key, numBuckets)
    (leftTable, rightTable)
  }
}
