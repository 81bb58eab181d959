package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J5 — keyed merge-upsert with per-column COALESCE-vs-overwrite rules,
  * the reference's core state semantic
  * (reference: app/store/upsert.py:96-127 — `INSERT ... ON CONFLICT DO
  * UPDATE` with `COALESCE(excluded.x, x)` for amount/website/linkedin/
  * lead_investor/tech_roles and unconditional overwrite — even with an
  * explicit NULL — for investors/hiring_tier/careers_url/ats_provider/
  * last_seen).
  *
  * No Delta in this build (offline), so MERGE is a full-outer join on the
  * natural key + per-column merge expressions. At scale this is one
  * shuffle on the key for each side (or zero if both are bucketed by the
  * key); the output overwrites the store atomically (write-new-dir +
  * swap), which [[graft.Pipeline]] handles at the sink.
  *
  * Key semantics: standard equality (`===`), not null-safe — SQLite treats
  * NULLs as distinct in UNIQUE constraints, so a batch row with a null key
  * column never matches and always inserts (SURVEY.md §7.4).
  */
object MergeUpsert {

  /** @param store         current table state
    * @param batch         incoming rows (same schema as store)
    * @param keys          natural-key column names
    * @param coalesceCols  prefer the batch value unless it is null
    * @param overwriteCols take the batch value whenever the batch has the
    *                      row, even if the new value is null
    * @param keepCols      keep the store value whenever the store has the
    *                      row (columns absent from the reference's
    *                      DO UPDATE list, e.g. headquarter_country —
    *                      upsert.py:117-126 never touches them on
    *                      conflict); batch value used only on insert
    */
  def apply(
      store: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      coalesceCols: Seq[String],
      overwriteCols: Seq[String],
      keepCols: Seq[String] = Seq.empty): DataFrame = {
    val s = store
      .select(store.columns.toIndexedSeq.map(c => col(c).as(s"_s_$c")): _*)
      .withColumn("_s_exists", lit(true))
    val b = batch
      .select(batch.columns.toIndexedSeq.map(c => col(c).as(s"_b_$c")): _*)
      .withColumn("_b_exists", lit(true))

    // Null-key batch rows must never match (SQLite UNIQUE-NULL fidelity):
    // standard === already yields false on null, so they fall out of the
    // join as insert-side rows, exactly like the reference.
    val cond = keys.map(k => col(s"_s_$k") === col(s"_b_$k")).reduce(_ && _)
    val joined = s.join(b, cond, "full_outer")

    val bExists = col("_b_exists").isNotNull
    val sExists = col("_s_exists").isNotNull
    val merged = store.columns.toIndexedSeq.map { c =>
      val sc = col(s"_s_$c")
      val bc = col(s"_b_$c")
      val out =
        if (keys.contains(c)) coalesce(bc, sc)
        else if (coalesceCols.contains(c)) coalesce(bc, sc)
        else if (overwriteCols.contains(c)) when(bExists, bc).otherwise(sc)
        else if (keepCols.contains(c)) when(sExists, sc).otherwise(bc)
        else coalesce(bc, sc)
      out.as(c)
    }
    joined.select(merged: _*)
  }
}
