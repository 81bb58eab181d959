package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * @param batchOrder    ordering of rows within the batch for the
    *                      duplicate-key pre-reduction (the reference
    *                      upserts sequentially, so later rows win —
    *                      upsert.py:88-159). Defaults to a deterministic
    *                      all-column ordering when the caller has no
    *                      natural sequence column.
    */
  def apply(
      store: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      coalesceCols: Seq[String],
      overwriteCols: Seq[String],
      keepCols: Seq[String] = Seq.empty,
      batchOrder: Option[Column] = None): DataFrame = {
    val reduced =
      reduceBatch(batch, keys, coalesceCols, overwriteCols, keepCols, batchOrder)
    val s = store
      .select(store.columns.toIndexedSeq.map(c => col(c).as(s"_s_$c")): _*)
      .withColumn("_s_exists", lit(true))
    val b = reduced
      .select(reduced.columns.toIndexedSeq.map(c => col(c).as(s"_b_$c")): _*)
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

  /** Collapse duplicate natural keys WITHIN the batch before the merge
    * join. The reference upserts rows one at a time, so two articles about
    * the same (company, round, date) in a single run fold sequentially:
    * COALESCE columns keep the last non-null value seen, overwrite columns
    * keep the last value (even null), and keep-columns retain the FIRST
    * row's value (set at insert, never touched on conflict). A full-outer
    * join, by contrast, would fan the duplicates out into duplicate store
    * rows — corrupting the key's uniqueness for every later merge.
    *
    * Rows with any null key column bypass the reduction entirely: SQLite
    * UNIQUE treats NULLs as distinct, so each such row always inserts as
    * its own store row (SURVEY §7.4).
    *
    * Cost: one extra shuffle on the same natural key the merge join uses
    * (exchange reuse co-partitions them); window + row_number, no
    * collect_list of whole rows.
    */
  private def reduceBatch(
      batch: DataFrame,
      keys: Seq[String],
      coalesceCols: Seq[String],
      overwriteCols: Seq[String],
      keepCols: Seq[String],
      batchOrder: Option[Column]): DataFrame = {
    val nonKeyCols = batch.columns.toIndexedSeq.filterNot(keys.contains)
    // Default order: the non-key payload as a struct — DETERMINISTIC but
    // arbitrary w.r.t. arrival order; callers whose duplicate keys must
    // fold in arrival order (the reference's row-at-a-time semantics)
    // must pass an explicit batchOrder (e.g. an ingest timestamp). A
    // keys-only batch has no payload to order by (struct() of zero
    // columns fails at runtime in the window orderBy) — every duplicate
    // is identical, so any constant order is correct.
    val ord = batchOrder.getOrElse(
      if (nonKeyCols.isEmpty) lit(1) else struct(nonKeyCols.map(col): _*))
    val anyNullKey = keys.map(col(_).isNull).reduce(_ || _)
    val keyed = batch.filter(!anyNullKey)
    val nullKeyed = batch.filter(anyNullKey)

    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val folded = keyed
      .select(keys.map(col) ++ nonKeyCols.map { c =>
        val v =
          if (keepCols.contains(c)) first(col(c)).over(full)
          else if (overwriteCols.contains(c)) last(col(c), ignoreNulls = false).over(full)
          else last(col(c), ignoreNulls = true).over(full) // coalesce + default
        v.as(c)
      } :+ row_number().over(w).as("_rn_dup"): _*)
      .filter(col("_rn_dup") === 1)
      .drop("_rn_dup")
      .select(batch.columns.toIndexedSeq.map(col): _*)
    folded.unionByName(nullKeyed)
  }
}
