package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `multi_pattern_counts(text, patterns)` — per-pattern OVERLAPPING
  * substring occurrence counts for a whole dictionary in ONE pass over
  * the text, via an Aho–Corasick automaton (Aho & Corasick, CACM 1975)
  * built once on the driver and shipped inside the plan.
  *
  * This is the scale answer to dictionary tagging (blocklists,
  * taxonomy keyword tagging, Dolma-style attribute taggers): the
  * composed alternative — one `LIKE`/`instr` column per pattern — scans
  * the text K times and re-plans as the dictionary grows, where this
  * expression is O(len + matches) regardless of K. Patterns that are
  * substrings or suffixes of other patterns are counted at every
  * position they occur (the automaton's output links), which per-pattern
  * scans get right only with overlapping semantics — so the DuckDB
  * oracle counts occurrences positionally (`substr(text, i, len(p)) =
  * p` over all i), not by `replace`-division, which would undercount
  * self-overlapping patterns.
  *
  * The automaton rides the generated code as a plan reference object
  * (the [[TokenSetCounts]] contract): built once per plan on the
  * driver, serialized to executors with the task binary, matching in
  * whole-stage codegen without a UDF boundary. Null text → null;
  * counts are longs (a 100 TB shard can exceed Int on a boilerplate
  * pattern aggregated downstream).
  */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "patterns must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_counts requires STRING, got ${other.sql}")
  }

  @transient private lazy val automaton: AhoCorasick =
    AhoCorasick.build(patterns)

  override protected def nullSafeEval(input: Any): Any =
    automaton.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
}

/** Immutable matching automaton: goto transitions, BFS fail links, and
  * per-state flattened output sets (each state carries the indices of
  * EVERY pattern ending there, suffix outputs pre-merged at build time —
  * the match loop never walks fail chains for output).
  *
  * The match loop runs on a full goto-DFA over the ASCII plane (fail
  * transitions pre-resolved into a flat `states × 128` int table, the
  * standard AC-to-DFA compilation): one array load per character, no
  * boxing, no fail-chain walk. The table is `@transient lazy` — the
  * plan ships only the sparse trie (pattern-sized), and each executor
  * JVM compiles the DFA once on first use. Non-ASCII characters take
  * the sparse fail-chain path; states reached that way re-enter the
  * DFA at the next ASCII character, so mixed text stays correct.
  */
final class AhoCorasick private (
    trans: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    out: Array[Array[Int]],
    nPatterns: Int) extends Serializable {

  // full transition function over ASCII, fail links resolved: BFS order
  // guarantees delta(fail(u)) rows are complete before u's row
  @transient private lazy val delta: Array[Int] = {
    val n = trans.length
    val d = new Array[Int](n * 128)
    val depth = AhoCorasick.bfsOrder(trans)
    var c = 0
    while (c < 128) {
      val t = trans(0).get(Character.valueOf(c.toChar))
      d(c) = if (t == null) 0 else t.intValue()
      c += 1
    }
    depth.foreach { u =>
      var ch = 0
      while (ch < 128) {
        val t = trans(u).get(Character.valueOf(ch.toChar))
        d(u * 128 + ch) =
          if (t != null) t.intValue() else d(fail(u) * 128 + ch)
        ch += 1
      }
    }
    d
  }

  /** Per-pattern overlapping occurrence counts in `s`. */
  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    val dfa = delta
    val acc = new Array[Long](nPatterns)
    var state = 0
    var i = 0
    val len = str.length
    while (i < len) {
      val ch = str.charAt(i)
      if (ch < 128) {
        state = dfa(state * 128 + ch)
      } else {
        val key = Character.valueOf(ch)
        var next = trans(state).get(key)
        while (next == null && state != 0) {
          state = fail(state)
          next = trans(state).get(key)
        }
        state = if (next == null) 0 else next.intValue()
      }
      val os = out(state)
      if (os.length != 0) {
        var j = 0
        while (j < os.length) { acc(os(j)) += 1L; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }
}

object AhoCorasick {
  /** Non-root states in BFS (depth) order. */
  private[functions] def bfsOrder(
      trans: Array[java.util.HashMap[Character, Integer]]): Array[Int] = {
    val order = new scala.collection.mutable.ArrayBuffer[Int](trans.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    trans(0).forEach((_, v) => queue.enqueue(v.intValue()))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      order += u
      trans(u).forEach((_, v) => queue.enqueue(v.intValue()))
    }
    order.toArray
  }

  def build(patterns: Seq[String]): AhoCorasick = {
    val trans = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var state = 0
      p.foreach { ch =>
        val key = Character.valueOf(ch)
        val next = trans(state).get(key)
        if (next == null) {
          trans += new java.util.HashMap[Character, Integer]()
          ends += Nil
          trans(state).put(key, trans.size - 1)
          state = trans.size - 1
        } else state = next.intValue()
      }
      ends(state) = pi :: ends(state)
    }
    val n = trans.size
    val fail = new Array[Int](n)
    val out = Array.tabulate(n)(i => ends(i))
    val queue = scala.collection.mutable.Queue.empty[Int]
    trans(0).forEach((_, v) => queue.enqueue(v.intValue()))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      trans(u).forEach { (ch, v) =>
        queue.enqueue(v.intValue())
        var f = fail(u)
        while (f != 0 && trans(f).get(ch) == null) f = fail(f)
        val fn = trans(f).get(ch)
        fail(v.intValue()) =
          if (fn != null && fn.intValue() != v.intValue()) fn.intValue() else 0
        out(v.intValue()) = out(v.intValue()) ++ out(fail(v.intValue()))
      }
    }
    new AhoCorasick(trans.toArray, fail,
      out.map(_.sorted.toArray).toArray, patterns.size)
  }
}
