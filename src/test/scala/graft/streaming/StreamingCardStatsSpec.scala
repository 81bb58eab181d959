package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class CardDocIn(source: String, lang: String, text: String)

/** [[StreamingCardStats]]: the merged on-disk card equals the batch card
  * of the concatenated stream, per-batch writes are replay-idempotent,
  * and the pre-commit read is the empty card.
  */
class StreamingCardStatsSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def cardRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))
      .toSeq

  test("merged card over batches == one-shot card of all data") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("scard").toString
    val in = MemoryStream[CardDocIn]
    val q = StreamingCardStats.run(in.toDF(),
      path = s"$dir/card", checkpoint = s"$dir/ckpt")
    val b1 = Seq(
      CardDocIn("s0", "en", "a b c"),
      CardDocIn("s0", "fr", (1 to 25).map(i => s"w$i").mkString(" ")),
      CardDocIn("s1", "en", "x y"))
    val b2 = Seq(
      CardDocIn("s0", "fr", "d e f g"),
      CardDocIn("s0", "fr", "h i"),
      CardDocIn("s1", "de", (1 to 30).map(i => s"v$i").mkString(" ")))
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val merged = cardRows(StreamingCardStats.card(spark, s"$dir/card"))
    // one-shot: partials of everything written as a single batch
    val oneDir = java.nio.file.Files.createTempDirectory("scard1").toString
    StreamingCardStats.writeBatch((b1 ++ b2).toDF(), s"$oneDir/card", 0L)
    val oneShot = cardRows(StreamingCardStats.card(spark, s"$oneDir/card"))
    assert(merged == oneShot,
      s"key-wise partial sums must equal the one-shot card:\n$merged\n$oneShot")

    // spot-check the derived fields: s0 has 4 docs, fr is modal (3 > 1)
    val s0 = merged.find(_._1 == "s0").get
    assert(s0._2 == 4L && s0._7 == "fr", s0)
    assert(s0._6 == 0.75, s"3 of s0's 4 docs are short: $s0")
  }

  test("replayed batch overwrites its own partition — no double count") {
    val dir = java.nio.file.Files.createTempDirectory("scard2").toString
    val batch = Seq(CardDocIn("s0", "en", "a b c")).toDF()
    StreamingCardStats.writeBatch(batch, s"$dir/card", batchId = 3L)
    StreamingCardStats.writeBatch(batch, s"$dir/card", batchId = 3L)
    val n = StreamingCardStats.card(spark, s"$dir/card")
      .agg(sum($"n_docs")).collect().head.getLong(0)
    assert(n == 1L, s"replay must not double-count: $n")
  }

  test("card before any batch commits is empty") {
    val dir = java.nio.file.Files.createTempDirectory("scard0").toString
    assert(StreamingCardStats.card(spark, s"$dir/card").count() == 0L)
  }
}
