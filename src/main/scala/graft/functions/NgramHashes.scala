package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `ngram_hashes(wh, n)` — rolling n-gram window hashes over a word-hash
  * array: for each window start, the left fold `h ← (h·37 + uₖ) mod p`
  * over the window's `uₖ = wh[k] mod 2³⁰`, starting at `h = 0`. The
  * long-window generalization of [[ShingleHash3]] (which pins its own
  * historical 3-gram mix), built for substring-level dedup where n is
  * 10–50 tokens. Arithmetic stays below 2³⁶, so the DuckDB oracle
  * replays it exactly with `list_reduce` over BIGINTs (prepending 0 to
  * emulate the zero-initialized fold).
  *
  * Null semantics match [[ShingleHash3]]: NULL input or fewer than `n`
  * elements → EMPTY array; a window containing any null element → a
  * null entry at that offset.
  *
  * The per-window fold is O(array · n) rather than O(array) rolling
  * arithmetic — deliberate: the mod-p rolling form needs a modular
  * subtraction of the outgoing term that the oracle's list ops can't
  * express as cleanly, n is a small constant, and the pass is one
  * codegen'd primitive-long loop either way.
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram_hashes requires n >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires ARRAY<BIGINT>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NgramHashes.Empty()
    else NgramHashes.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = ${c.isNull}
          ? graft.functions.NgramHashes.Empty()
          : graft.functions.NgramHashes.compute(${c.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  private val M = MinHashSig.M // 2^30
  private val P = MinHashSig.P // largest prime < 2^30

  private val empty = new GenericArrayData(new Array[Any](0))
  def Empty(): ArrayData = empty

  def compute(wh: ArrayData, n: Int): ArrayData = {
    val len = wh.numElements()
    if (len < n) return empty
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var h = 0L
      var ok = true
      var k = 0
      while (ok && k < n) {
        if (wh.isNullAt(i + k)) ok = false
        else h = (h * 37L + wh.getLong(i + k) % M) % P
        k += 1
      }
      if (ok) out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
