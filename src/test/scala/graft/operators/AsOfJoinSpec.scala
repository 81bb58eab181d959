package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Unit tests for the union+window as-of join — the semantic edges the
  * oracle query can't isolate: equal-timestamp inclusion, no-match nulls,
  * per-key isolation.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, ts("2026-01-01 10:00:00")), // after both right rows of key 10
    (2L, 10L, ts("2026-01-01 08:30:00")), // between them
    (3L, 10L, ts("2026-01-01 07:00:00")), // before all → null attach
    (4L, 20L, ts("2026-01-01 09:00:00")), // equal-ts right row → included
    (5L, 30L, ts("2026-01-01 09:00:00")) // key with no right rows at all
  ).toDF("id", "k", "ts")

  private val right = Seq(
    (10L, ts("2026-01-01 08:00:00"), "a"),
    (10L, ts("2026-01-01 09:00:00"), "b"),
    (20L, ts("2026-01-01 09:00:00"), "c")
  ).toDF("k", "ts", "tag")

  test("backward: latest at-or-before row attaches per key") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts")
      .select("id", "asof_tag").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "b", "latest of two earlier rows wins")
    assert(out(2L) == "a", "only the earlier right row is visible")
    assert(out(3L) == null, "no right row at-or-before → null")
    assert(out(4L) == "c", "equal timestamp is included (<= semantics)")
    assert(out(5L) == null, "key absent from right side → null")
  }

  test("backward: left row count and columns are preserved") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts")
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("id", "k", "ts", "asof_ts", "asof_tag"))
    // the attached right ts equals the matched row's ts
    val r1 = out.filter($"id" === 1L).select("asof_ts").head()
    assert(r1.getTimestamp(0) == ts("2026-01-01 09:00:00"))
  }

  test("backward: right rows never appear in the output") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts")
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 5L))
  }
}
