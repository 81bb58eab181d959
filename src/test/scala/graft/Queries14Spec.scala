package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Hand-computed oracles for the round-11 part-8 statistics queries
  * (DuckDB parity runs separately via Verify): a 4-user Kaplan–Meier
  * curve, an asymmetric two-arm z-test, and a constructed error-rate
  * spike over a flat trailing week.
  */
class Queries14Spec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q14s").toString
    rows.map { case (id, tsIso, uid, et) =>
      (id, Timestamp.valueOf(tsIso), uid, et, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q129: censoring shrinks the risk set without counting as an event") {
    // 4 signups day 0; u1,u2 purchase day 1; u3 day 3; u4 censored at
    // the horizon (day 5). KM: S(1)=1-2/4=0.5, S(3)=0.5*(1-1/2)=0.25
    val dir = writeEvents(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "signup"),
      (2L, "2024-01-01 00:00:00", 2L, "signup"),
      (3L, "2024-01-01 00:00:00", 3L, "signup"),
      (4L, "2024-01-01 00:00:00", 4L, "signup"),
      (5L, "2024-01-02 00:30:00", 1L, "purchase"),
      (6L, "2024-01-02 01:00:00", 2L, "purchase"),
      (7L, "2024-01-04 01:00:00", 3L, "purchase"),
      (8L, "2024-01-06 02:00:00", 4L, "view")))
    val out = SparkEntry.queries("q129_survival_km")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 4L, 2L, 0.5), (3L, 2L, 1L, 0.25)),
      out.mkString("; "))
  }

  test("q130: parity arms, 1-day attribution, pooled-variance z") {
    // variant 1 = users 1,3 (both convert); variant 0 = users 2,4
    // (only u2 converts, u4's purchase is outside the 1-day window)
    val dir = writeEvents(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:00:00", 2L, "view"),
      (3L, "2024-01-01 10:00:00", 3L, "view"),
      (4L, "2024-01-01 10:00:00", 4L, "view"),
      (5L, "2024-01-01 12:00:00", 1L, "purchase"),
      (6L, "2024-01-01 13:00:00", 2L, "purchase"),
      (7L, "2024-01-01 14:00:00", 3L, "purchase"),
      (8L, "2024-01-05 10:00:00", 4L, "purchase")))
    val out = SparkEntry.queries("q130_ab_ztest")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 1L, 0.5)),
      "variant 0 arm")
    assert((r.getLong(3), r.getLong(4), r.getDouble(5)) == ((2L, 2L, 1.0)),
      "variant 1 arm")
    assert(r.getDouble(6) == -1.154701, s"z ${r.getDouble(6)}")
  }

  test("q131: spike day scores against the trailing 7 observed days") {
    // day 0 rate 0.7, days 1..6 rate 0, day 7 rate 0.5 (the spike):
    // mean 0.1, sd 0.244948974 -> z 1.632993; days 0..6 have z null
    val rows = Seq.newBuilder[(Long, String, Long, String)]
    var id = 0L
    def day(d: Int, errs: Int, total: Int): Unit =
      (0 until total).foreach { i =>
        id += 1
        rows += ((id, f"2024-01-${d + 1}%02d 0${i % 8}:00:00", 1L,
          if (i < errs) "error" else "view"))
      }
    day(0, 7, 10); (1 to 6).foreach(day(_, 0, 10)); day(7, 5, 10)
    val out = SparkEntry.queries("q131_error_spike")(spark, writeEvents(rows.result()))
      .collect()
    assert(out.length == 8)
    assert(out.take(7).forall(_.isNullAt(4)), "no z before a full window")
    val last = out.last
    assert(last.getDouble(3) == 0.5)
    assert(last.getDouble(4) == 1.632993, s"z ${last.getDouble(4)}")
  }
}
