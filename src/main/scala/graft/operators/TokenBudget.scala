package graft.operators

import scala.util.chaining._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget selection: keep documents, in a deterministic pseudo-
  * random order, until a cumulative token budget is reached — the "cut
  * a 1T-token corpus down to the 300B best-shuffled tokens" step of a
  * training-data pipeline.
  *
  * The obvious formulation — a running sum over one global ORDER BY —
  * plans as a SINGLE-partition window: one task sums the whole corpus,
  * a 100 TB non-starter. This is the two-phase prefix-sum instead:
  *
  *  1. range-repartition by the order key (Spark samples split points —
  *     parallel, balanced);
  *  2. per-partition totals → tiny driver-side running offset (one row
  *     per partition, not per document);
  *  3. within-partition running sum + broadcast offset = exact global
  *     cumulative sum, all partitions in parallel;
  *  4. filter `cum <= budget`.
  *
  * The order key is a hash of the id — a deterministic shuffle, so the
  * kept prefix is an unbiased sample, reproducible across runs and
  * engines (unlike `orderBy(rand())`).
  */
object TokenBudget {

  /** @param df        input; must contain `idCol` and `tokenCol`
    * @param idCol     unique id (orders ties; hash of it orders rows)
    * @param tokenCol  per-row token count (integer-typed)
    * @param budget    inclusive cumulative-token cap
    * @param numParts  range partitions for phase 1 (cluster-sized)
    * @return kept rows with `cum_tokens` (running total INCLUDING the
    *         row). Rows are hash-ordered WITHIN each partition only —
    *         after the window the frame is partitioned by `_pid`, so
    *         global iteration order is not the hash order; callers that
    *         need a globally ordered result must add their own
    *         `orderBy` (as q42 does).
    */
  def take(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numParts: Int = 32): DataFrame = {
    import graft.functions.GraftFunctions.hash64

    val keyed = df.withColumn("_h", hash64(col(idCol).cast("string"), 17))
    // The partitioned frame is consumed by TWO jobs (totals, then the
    // cumsum) — and repartitionByRange derives its boundary-sampling
    // seed from the underlying RDD id, which differs per job. Without
    // pinning, large inputs (where the sampler subsamples) could range-
    // partition DIFFERENTLY in the second job, mis-assigning offsets.
    // Checkpoints.pin materializes one layout for both reads (reliable
    // checkpoint when the session has a checkpoint dir; localCheckpoint
    // otherwise, where a lost partition fails loudly instead of
    // silently recomputing under a different partitioning).
    val parted = keyed.repartitionByRange(numParts, col("_h"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .pipe(Checkpoints.pin)

    // tiny: one row per partition; collect is O(numParts), never O(rows)
    val partTotals = parted.groupBy("_pid")
      .agg(sum(col(tokenCol).cast("long")).as("_ptot"),
        min("_h").as("_pmin"))
      .collect()
      .sortBy(r => (r.getAs[Long]("_pmin"), r.getAs[Int]("_pid")))
    val offsets = partTotals.scanLeft(0L)(_ + _.getAs[Long]("_ptot"))
    val offsetMap = partTotals.map(_.getAs[Int]("_pid")).zip(offsets).toMap

    // offsets attach via a broadcast equi-join on _pid — O(1) per row at
    // any partition count (a when-chain of numParts branches would cost
    // O(numParts) comparisons per row and overflow codegen method limits
    // at cluster-sized partition counts)
    val offsetsDf = broadcast(
      df.sparkSession.createDataFrame(offsetMap.toSeq).toDF("_pid", "_offset"))
    val w = Window.partitionBy("_pid")
      .orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .join(offsetsDf, Seq("_pid"))
      .withColumn("cum_tokens",
        sum(col(tokenCol).cast("long")).over(w) + col("_offset"))
      .filter(col("cum_tokens") <= budget)
      .drop("_pid", "_offset")
      .sortWithinPartitions(col("_h"), col(idCol))
      .drop("_h")
  }
}
