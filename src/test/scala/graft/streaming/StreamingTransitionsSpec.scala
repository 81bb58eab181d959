package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming journey transitions: cross-batch pairs come from keyed
  * state (batch N's last event → batch N+1's first), and the
  * accumulated matrix equals the batch lead() reference on the full
  * concatenated log — the q128 equivalence that makes the operator a
  * drop-in incremental twin.
  */
class StreamingTransitionsSpec extends SparkSpec {

  import StreamingTransitions._
  import spark.implicits._

  test("cross-batch pairs emit once; totals equal the batch lead() matrix") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingTransitions(in.toDS())
    val q = out.writeStream
      .format("memory").queryName("transitions")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    val all = Seq(
      // batch 0: u1 view->click (out-of-order arrival within the batch)
      Seq(Ev(1L, 2L, 200L, "click"), Ev(1L, 1L, 100L, "view")),
      // batch 1: u1 click->view (cross-batch), u2 starts
      Seq(Ev(1L, 3L, 300L, "view"), Ev(2L, 4L, 100L, "view")),
      // batch 2: u2 view->error (cross-batch), u1 idle
      Seq(Ev(2L, 5L, 400L, "error")))
    try {
      all.foreach { batch => in.addData(batch: _*); q.processAllAvailable() }
      val got = spark.table("transitions").as[Transition].collect()
        .groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.length).toMap
      // batch reference: lead() over the full concatenated log
      val ref = all.flatten.toDF()
        .withColumn("to_type", lead($"event_type", 1).over(
          Window.partitionBy($"user_id").orderBy($"us", $"event_id")))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type", $"to_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got.map { case (k, v) => k -> v.toLong } == ref,
        s"got $got vs ref $ref")
      assert(got(("click", "view")) == 1, "cross-batch pair seen exactly once")
    } finally q.stop()
  }
}
