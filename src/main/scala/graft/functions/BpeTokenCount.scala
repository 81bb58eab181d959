package graft.functions

import scala.io.Source

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_token_count(text)` — deterministic subword token count under the
  * fixed merge table shipped at `graft/bpe_merges.txt` (a versioned,
  * public contract — see the resource header). Whitespace `words()`
  * counts are a ~1.3–1.5x biased proxy for what training pipelines
  * actually budget and pack by (subword tokens); this expression makes
  * token budgeting (q42) and sequence packing (q55) subword-honest
  * while staying exactly replayable by the DuckDB oracle.
  *
  * Algorithm (BPE-style, "ordered-merge" variant): per space-separated
  * word, symbols start as single codepoints; each merge `(a, b)` from
  * the table — in table order — replaces all leftmost non-overlapping
  * adjacent `[a][b]` symbol pairs with `[ab]`; the word's token count
  * is its final symbol count, and the text's count is the sum over
  * words (empty words count 0). This differs from classic best-rank-
  * first BPE only in merge scheduling (fixed table order instead of
  * re-scanning for the lowest-rank pair each step) — the property that
  * makes it SQL-replayable: the whole per-word loop is a chain of
  * plain string `replace` calls over a delimiter-wrapped symbol
  * string, identical in Java and DuckDB.
  *
  * Representation: every symbol is wrapped as `SEP sym SEP` (SEP =
  * U+001F, asserted absent from input), so a merge is
  * `replace(SEP a SEP SEP b SEP → SEP ab SEP)`: both operands are
  * anchored at full-symbol boundaries (no mid-symbol false matches,
  * and adjacent pairs don't share a delimiter, so leftmost
  * non-overlapping replacement merges runs pairwise exactly like the
  * list-form fold — pinned by BpeTokenCountSpec's property test
  * against an independent list-based reference).
  *
  * Null in → null out. Codegen'd via a static call (one pass per row;
  * per-merge `indexOf` guards skip the ~90% of merges absent from a
  * given word).
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.countText(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeTokenCount.countText($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {

  /** Symbol delimiter (U+001F unit separator): a control char the text
    * corpus must not contain — [[countText]] asserts it.
    */
  final val Sep = '\u001F'

  /** Parse `bpe_merges.txt`-format lines: one "a b" merge per line in
    * application order; blank lines and `#` comments ignored. The one
    * parser behind both the shipped resource and
    * [[graft.operators.BpeTrain.loadMerges]]-loaded artifacts.
    */
  def parseMerges(lines: Iterator[String]): Seq[(String, String)] =
    lines
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(a, b) = l.split(" ", 2)
        (a, b)
      }.toVector

  /** The fixed merge table, in application order. */
  val merges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bpe_merges.txt resource missing")
    try parseMerges(Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  // precompiled (pattern, replacement) pairs in the wrapped-symbol form
  private val compiled: Array[(String, String)] = merges.map { case (a, b) =>
    (s"$Sep$a$Sep$Sep$b$Sep", s"$Sep$a$b$Sep")
  }.toArray

  /** Bounded per-thread memo for [[countWord]]: word frequency is
    * Zipfian, so almost every lookup after warmup is a repeat of a
    * common word. `countWord` is a pure function of the word and the
    * fixed merge table, so caching cannot change results; the LRU cap
    * bounds memory per executor thread. ~4x on the sf0.1 corpus.
    */
  private val memo = ThreadLocal.withInitial[java.util.LinkedHashMap[String, Integer]](
    () => new java.util.LinkedHashMap[String, Integer](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Integer]): Boolean = size() > 16384
    })

  /** Token count of one word (no spaces). Exposed for the spec. */
  def countWord(word: String): Int = {
    if (word.isEmpty) return 0
    val m = memo.get()
    val hit = m.get(word)
    if (hit != null) return hit.intValue()
    val n = countWordUncached(word)
    m.put(word, Integer.valueOf(n))
    n
  }

  private def countWordUncached(word: String): Int =
    countWordImpl(word, compiled)

  /** Precompile an arbitrary merge table into the wrapped-pattern form
    * [[countWordCompiled]] consumes — do this ONCE per table; a
    * vocab-sized scoring pass calls the counter per word, and
    * rebuilding the O(|table|) pattern array each call would make it
    * O(vocab × table) in allocations.
    */
  def compileTable(table: Seq[(String, String)]): Array[(String, String)] =
    table.map { case (a, b) =>
      (s"$Sep$a$Sep$Sep$b$Sep", s"$Sep$a$b$Sep")
    }.toArray

  /** Token count of one word under a [[compileTable]]d table (uncached:
    * trained tables are ad hoc, the memo is for the fixed shipped table
    * only).
    */
  def countWordCompiled(word: String, compiled: Array[(String, String)]): Int =
    countWordImpl(word, compiled)

  /** One-shot convenience: count under an ARBITRARY merge table — the
    * shipped-table algorithm with the table as a parameter, so a table
    * trained by [[graft.operators.BpeTrain]] is directly executable.
    * Compiles the table per call; loops should [[compileTable]] once.
    */
  def countWordWith(word: String, table: Seq[(String, String)]): Int =
    countWordImpl(word, compileTable(table))

  private def countWordImpl(word: String,
                            table: Array[(String, String)]): Int = {
    if (word.isEmpty) return 0
    val sb = new java.lang.StringBuilder(word.length * 3)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      require(cp != Sep.toInt, "input contains the U+001F symbol delimiter")
      sb.append(Sep).appendCodePoint(cp).append(Sep)
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var m = 0
    while (m < table.length) {
      val (pat, repl) = table(m)
      if (s.contains(pat)) s = s.replace(pat, repl)
      m += 1
    }
    var seps = 0
    var j = 0
    while (j < s.length) {
      if (s.charAt(j) == Sep) seps += 1
      j += 1
    }
    seps / 2
  }

  /** Token count of a whole text: sum of [[countWord]] over single-
    * space-separated words (the `words()` pre-tokenization).
    */
  def countText(text: String): Int = {
    var total = 0
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) total += countWord(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** The DuckDB expression computing the IDENTICAL count for a text
    * column — the merge chain rendered as nested `replace` calls over
    * the same wrapped-symbol representation, generated from the same
    * loaded table so the two engines cannot drift. `col` must be a SQL
    * expression yielding the text.
    */
  def duckdbSql(col: String): String = {
    def lit(s: String): String =
      s.map {
        case Sep => "'||chr(31)||'"
        case '\'' => "''"
        case c => c.toString
      }.mkString("'", "", "'")
    val wrapped =
      "chr(31) || array_to_string(string_split(w, ''), chr(31)||chr(31)) || chr(31)"
    val chain = compiled.foldLeft(wrapped) { case (acc, (pat, repl)) =>
      s"replace($acc, ${lit(pat)}, ${lit(repl)})"
    }
    // token count = SEP occurrences / 2, read off a single evaluation
    // of the chain via string_split (k SEPs -> k+1 split elements)
    s"""CAST(list_sum(list_transform(string_split($col, ' '), w ->
        CASE WHEN w = '' THEN 0
             ELSE (len(string_split($chain, chr(31))) - 1) // 2
        END)) AS BIGINT)"""
  }
}
