package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.GraftFunctions._

/** Streaming dataset-card maintenance — the continuous form of q79's
  * per-source summary: each micro-batch reduces to one PARTIAL row per
  * (source, lang) carrying decomposable statistics (doc count, short-doc
  * count, whitespace + subword token sums), and the live card is the
  * key-wise sum of every batch's partials — exactly the card of the
  * concatenated stream, because every statistic is an integer sum.
  * Non-decomposable card fields (dup counts, modal language) stay
  * derivable on read: the modal language falls out of the (source, lang)
  * key; exact-dup counting needs content state and belongs to
  * [[StreamingContentDedup]]'s band index, not a sum.
  *
  * Replay safety: the [[StreamingHeavyHitters]] convention — each batch
  * overwrites its own `batch=<id>` partition, so at-least-once
  * foreachBatch delivery cannot double-count. Per-batch cost scales
  * with the batch (one partial agg over its rows); the read-side merge
  * touches ≤ batches · |sources × langs| partial rows, and
  * [[graft.operators.Compaction.compactBatchTree]] folds committed
  * partitions as batch count grows.
  */
object StreamingCardStats {

  /** Start the maintenance query over a streaming frame carrying
    * `source`, `lang`, and `text` columns: per micro-batch, write the
    * (source, lang) partials under `path/batch=<id>`.
    */
  def run(stream: DataFrame, path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, path, batchId)
      }
      .start()

  /** One batch's partial card — idempotent per `batchId`. */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Unit =
    partials(batch)
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The decomposable per-(source, lang) statistics of one frame. */
  def partials(df: DataFrame): DataFrame = partialsKeyed(df, Nil)

  /** [[partials]] with extra leading grouping keys — the takedown card
    * rebuild ([[StreamingCurationChain.deleteDocs]]) groups by the kept
    * batch id so every partition's partial recomputes in ONE job.
    */
  def partialsKeyed(df: DataFrame, extraKeys: Seq[String]): DataFrame =
    df.select(extraKeys.map(col) ++ Seq(col("source"), col("lang"),
        size(words(col("text"))).cast("long").as("_nt"),
        bpe_token_count(col("text")).cast("long").as("_ns")): _*)
      .groupBy((extraKeys ++ Seq("source", "lang")).map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("_nt") < graft.operators.TextAnalysis.ShortDocTokens, 1))
          .as("n_short"),
        sum(col("_nt")).as("n_tokens_ws"),
        sum(col("_ns")).as("n_tokens_subword"))

  /** The live card: key-wise sum over all persisted batches, plus the
    * derived per-source fields (modal language by (count desc, lang),
    * short fraction, average length). Identical to running [[partials]]
    * + the same derivation over the concatenated stream. Reads as the
    * empty card before any batch commits.
    */
  def card(spark: SparkSession, path: String): DataFrame = {
    // existence check, not a broad catch — see [[StreamingBatchDirs]]
    val batches =
      if (StreamingBatchDirs.exists(spark, path)) spark.read.parquet(path)
      else spark.range(0).select(
        lit("").as("source"), lit("").as("lang"), lit(0L).as("n_docs"),
        lit(0L).as("n_short"), lit(0L).as("n_tokens_ws"),
        lit(0L).as("n_tokens_subword"))
    val merged = batches
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_short")).as("n_short"),
        sum(col("n_tokens_ws")).as("n_tokens_ws"),
        sum(col("n_tokens_subword")).as("n_tokens_subword"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_docs").desc, col("lang"))
    val top = merged
      .withColumn("_rn", row_number().over(wl))
      .filter(col("_rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    merged
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens_ws")).as("n_tokens_ws"),
        sum(col("n_tokens_subword")).as("n_tokens_subword"),
        round(sum(col("n_tokens_ws")).cast("double") / sum(col("n_docs")), 2)
          .as("avg_doc_tokens"),
        round(sum(col("n_short")).cast("double") / sum(col("n_docs")), 4)
          .as("pct_short"))
      .join(top, Seq("source"))
  }
}
