package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md).
  *
  * All reads go through here so that scan-level concerns (schema pinning,
  * future bucketing / partition layout at real scale) live in one place.
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * query code only ever sees a DataFrame, so swapping the physical
  * layout is a one-file change.
  *
  * `events.ts` is written as parquet INT64 TIMESTAMP(NANOS), which Spark
  * rejects by default; we read nanos as long (legacy conf) and convert to
  * a microsecond timestamp with integer division (`div`, not `/` — a
  * double division would lose precision above 2^53). The driver data is
  * µs-aligned, so the conversion is exact and matches what DuckDB sees.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        acc.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else if (f.dataType == TimestampNTZType)
        // Writers that don't adjust to UTC (isAdjustedToUTC=false) read
        // back as TIMESTAMP_NTZ, which unix_micros()/cast-to-long/window
        // reject (seen on events.ts in external parquet and on the
        // driver's o_orderdate). The session runs in UTC, so the
        // wall-clock reinterpretation is lossless.
        acc.withColumn(f.name, col(f.name).cast(TimestampType))
      else acc
    }
  }
}
