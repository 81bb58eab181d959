package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Hand-computed oracles for the round-11 part-7 analytics queries
  * (DuckDB parity runs separately via Verify): funnel sequencing on a
  * constructed event log, a two-cohort retention triangle, and a
  * two-user transition matrix.
  */
class Queries13Spec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q13s").toString
    rows.map { case (id, tsIso, uid, et) =>
      (id, Timestamp.valueOf(tsIso), uid, et, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q125: a click BEFORE the first view does not convert the user") {
    // u1 converts fully; u2 clicked before viewing (no click step);
    // u3 views only
    val dir = writeEvents(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 1L, "click"),
      (3L, "2024-01-01 12:00:00", 1L, "purchase"),
      (4L, "2024-01-02 09:00:00", 2L, "click"),
      (5L, "2024-01-02 10:00:00", 2L, "view"),
      (6L, "2024-01-03 10:00:00", 3L, "view")))
    val out = SparkEntry.queries("q125_event_funnel")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("view", 3L, 1.0), ("click", 1L, 0.333333),
      ("purchase", 1L, 1.0)), out.mkString("; "))
  }

  test("q126: retention triangle counts only distinct user-weeks") {
    // week numbering is absolute (µs div 7d); use offsets within one
    // cohort: u1 active weeks {w, w+1}, u2 only {w} -> retention 1.0, 0.5
    val dir = writeEvents(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 1L, "view"), // same week, deduped
      (3L, "2024-01-09 10:00:00", 1L, "click"),
      (4L, "2024-01-02 10:00:00", 2L, "view")))
    val out = SparkEntry.queries("q126_retention_cohorts")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0L, 2L, 1.0), (1L, 1L, 0.5)),
      out.mkString("; "))
  }

  test("q128: per-user ordered transitions, probabilities row-normalized") {
    // u1: view->click->view ; u2: view->error
    val dir = writeEvents(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:01:00", 1L, "click"),
      (3L, "2024-01-01 10:02:00", 1L, "view"),
      (4L, "2024-01-01 10:00:00", 2L, "view"),
      (5L, "2024-01-01 10:05:00", 2L, "error")))
    val out = SparkEntry.queries("q128_event_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "error", 1L, 0.5)), out.mkString("; "))
  }

  test("q127: buckets clamp to [0,9] and labeled rate only counts src0/src1") {
    // exercised end-to-end on the driver tables (training included) —
    // structural invariants; value parity is the DuckDB gate's job
    val out = SparkEntry.queries("q127_probe_calibration")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 9L))
    assert(out.forall(r => r.getLong(3) <= r.getLong(1)),
      "labeled subset cannot exceed bucket size")
    assert(out.map(_.getLong(1)).sum == 500L, "every doc lands in a bucket")
  }
}
