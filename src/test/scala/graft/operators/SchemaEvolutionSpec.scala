package graft.operators

import graft.SparkSpec
import graft.pipeline.Pipeline
import org.apache.spark.sql.types._

/** Schema-evolution conformance: an old-version store (missing columns,
  * drifted types) reads cleanly under today's schema.
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("missing columns appear as typed nulls, order conforms") {
    val target = StructType(Seq(
      StructField("a", LongType),
      StructField("b", StringType),
      StructField("c", DoubleType)))
    // old writer: no `c`, different column order
    val old = Seq(("x", 1L)).toDF("b", "a")
    val out = SchemaEvolution.conformTo(old, target)
    assert(out.schema.fields.map(_.name).toSeq == Seq("a", "b", "c"))
    assert(out.schema("c").dataType == DoubleType)
    val r = out.head()
    assert(r.getLong(0) == 1L && r.getString(1) == "x" && r.isNullAt(2))
  }

  test("drifted types are cast; extra columns are dropped") {
    val target = StructType(Seq(StructField("n", LongType)))
    val old = Seq((1, "junk")).toDF("n", "legacy") // int n + obsolete col
    val out = SchemaEvolution.conformTo(old, target)
    assert(out.schema("n").dataType == LongType)
    assert(out.columns.toSeq == Seq("n"))
    assert(out.head().getLong(0) == 1L)
  }

  test("the pipeline store schema round-trips: pre-migration store conforms") {
    val full = Pipeline.emptyStore(spark).schema
    // simulate the reference's pre-migration store: no linkedin_url /
    // tech_roles (upsert.py:26-42 adds them on init)
    val oldSchema = StructType(full.fields.filterNot(f =>
      f.name == "linkedin_url" || f.name == "tech_roles"))
    val old = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], oldSchema)
    val out = SchemaEvolution.conformTo(old, full)
    assert(SchemaEvolution.conforms(out, full))
    assert(!SchemaEvolution.conforms(old, full))
  }
}
