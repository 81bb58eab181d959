package graft.operators

import org.apache.spark.sql.{Column, DataFrame, graftcolumn}
import org.apache.spark.sql.catalyst.expressions.StringReplace
import org.apache.spark.sql.functions._

import graft.functions.BpeTokenCount
import graft.functions.GraftFunctions._

/** BPE merge-table INDUCTION — trains the kind of table
  * [[graft.functions.BpeTokenCount]] ships fixed, from the corpus
  * itself: repeatedly count adjacent symbol pairs and merge the most
  * frequent one (ties broken lexicographically), the classic byte-pair-
  * encoding loop.
  *
  * Scale shape — the standard trick that makes BPE training tractable
  * at corpus scale: train on the WORD HISTOGRAM, not the corpus. One
  * partial-agg shuffle builds `(word, n)` (vocab-sized — Heaps' law,
  * not corpus-sized); every merge round then touches only the
  * histogram: one tiny (a, b) pair aggregation weighted by `n`, one
  * driver collect of the single winning pair (O(rounds) collects, the
  * [[Sampling.rebalanceToMix]] convention), and one narrow `replace`
  * over the vocab symbol strings.
  *
  * Symbols use [[BpeTokenCount]]'s exact representation — each symbol
  * wrapped as `SEP sym SEP` so a merge is one plain string replace with
  * leftmost non-overlapping semantics, bit-identical in Java and DuckDB
  * — which means a trained table dropped into `bpe_merges.txt` tokenizes
  * exactly as the trainer modeled it.
  */
object BpeTrain {

  private val SepS = BpeTokenCount.Sep.toString

  /** `(word, n)` occurrence histogram of whitespace tokens. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** The word as a delimiter-wrapped symbol string (one symbol per
    * char initially): `SEP c SEP SEP c SEP …` — [[BpeTokenCount]]'s
    * representation, so merges are plain `replace` calls.
    */
  def symString(word: Column): Column =
    concat(lit(SepS),
      array_join(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))), SepS + SepS),
      lit(SepS))

  private def strReplace(src: Column, find: Column, repl: Column): Column =
    graftcolumn(StringReplace(graftcolumn.expr(src),
      graftcolumn.expr(find), graftcolumn.expr(repl)))

  /** Adjacent-pair counts over the symbol-string histogram `(symstr, n)`:
    * `(a, b, cnt)` with sliding-window multiplicity (a word containing
    * the pair twice contributes `2n`).
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = filter(split(col("symstr"), SepS), s => s =!= "")
    vocab.select(col("n"), syms.as("_s"))
      .filter(size(col("_s")) >= 2)
      .select(col("n"), explode(transform(sequence(lit(0), size(col("_s")) - 2),
        i => struct(element_at(col("_s"), i + 1).as("a"),
          element_at(col("_s"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))
  }

  /** Train `rounds` merges over the corpus: each round takes the
    * highest-count pair (count desc, then `a`, then `b`) and applies it
    * to the histogram. Returns `(merge_rank, a, b, pair_count)` — rank
    * 1-based in learned order, directly usable as a
    * [[BpeTokenCount]]-format merge table.
    *
    * Only the BASE histogram is cached; round r's symbol strings are
    * the base under a chain of r narrow replaces, recomputed per round
    * — for a Heaps'-law vocab that is far cheaper than materializing a
    * new cached table every round (the replace chain is per-row string
    * work; a persist + materialize is a full extra job).
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = wordHistogram(docs, textCol)
      .select(symString(col("word")).as("symstr"), col("n"))
      .persist() // one job per round scans it through the replace chain
    var chain: Column = col("symstr")
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = pairCounts(base.select(chain.as("symstr"), col("n")))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r, a, b, cnt))
        chain = strReplace(chain,
          lit(SepS + a + SepS + SepS + b + SepS),
          lit(SepS + a + b + SepS))
      }
    }
    base.unpersist()
    learned.result().toDF("merge_rank", "a", "b", "pair_count")
  }

  /** Persist a [[train]]ed table as a `bpe_merges.txt`-format artifact
    * — one "a b" line per merge in learned order, the exact format the
    * shipped [[BpeTokenCount]] resource uses — so an induced vocabulary
    * becomes a deployable tokenizer file. O(rounds) driver rows, like
    * the codebook collects.
    */
  def writeMerges(trained: DataFrame, path: String): Unit = {
    val rows = trained
      .select(col("merge_rank"), col("a"), col("b"))
      .orderBy(col("merge_rank")).collect()
    val body = rows.map(r => s"${r.getString(1)} ${r.getString(2)}")
    val lines = ("# BPE merge table (application order); see " +
      "graft/bpe_merges.txt for the format contract") +: body
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load a [[writeMerges]] artifact (or any `bpe_merges.txt`-format
    * file) into the `Seq[(a, b)]` form [[BpeTokenCount.countWordWith]]
    * and [[BpeTokenCount.compileTable]] execute.
    */
  def loadMerges(path: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path.toString, "UTF-8")
    try BpeTokenCount.parseMerges(src.getLines())
    finally src.close()
  }
}
