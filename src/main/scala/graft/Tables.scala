package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md).
  *
  * All reads go through here so that scan-level concerns (schema pinning,
  * future bucketing / partition layout at real scale) live in one place.
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * query code only ever sees a DataFrame, so swapping the physical
  * layout is a one-file change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
