package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Hand-computed oracle for the q138 sole-late-supplier logic (the
  * trickiest of the part-10 relational shapes; DuckDB parity pins the
  * rest via Verify at two scale factors).
  */
class Queries16Spec extends SparkSpec {

  test("q138: blame lands only on the sole late supplier of a " +
    "multi-supplier order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q16s").toString
    def ts(s: String) = Timestamp.valueOf(s)
    // order 1: suppliers 10 (late) and 11 (on time)  -> blame 10
    // order 2: suppliers 10 and 11 both late         -> no sole blame
    // order 3: single supplier 12, late              -> not multi-supplier
    Seq(
      (1L, 10L, ts("2024-06-01 00:00:00")),
      (1L, 11L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-06-01 00:00:00")),
      (2L, 11L, ts("2024-06-02 00:00:00")),
      (3L, 12L, ts("2024-06-01 00:00:00")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")),
      (3L, ts("2024-01-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "Supp#10"), (11L, "Supp#11"), (12L, "Supp#12"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val out = SparkEntry.queries("q138_late_sole_supplier")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("Supp#10", 1L)), out.mkString("; "))
  }
}
