package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema conformance for evolving at-rest tables — the engine analogue
  * of the reference's hand-rolled migration (`PRAGMA table_info` +
  * `ALTER TABLE ... ADD COLUMN` for linkedin_url / tech_roles,
  * app/store/upsert.py:26-42).
  *
  * A store written by an older engine version lacks newer columns;
  * [[conformTo]] reads it against today's schema by adding the missing
  * columns as typed nulls, casting drifted types, and projecting the
  * target column order. Pure projection — no shuffle, codegen'd, and
  * column-pruned like any other select, so conforming a 100 TB store
  * costs only the columns actually read downstream.
  */
object SchemaEvolution {

  /** Project `df` to exactly `target`: missing columns become typed
    * nulls, present columns are cast to the target type (no-op when
    * types already match), extra columns are dropped (they have no
    * meaning under the target schema — the reference's migration
    * likewise never deletes, only adds).
    */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    // resolve the way Spark does by default — case-insensitively — or a
    // store written as "Linkedin_URL" would silently conform to null
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(target.fields.toSeq.map { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(actual) => col(actual).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** True iff `df` already matches `target` by name+type+order (the
    * fast-path check before deciding a rewrite is needed).
    */
  def conforms(df: DataFrame, target: StructType): Boolean =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq
}
