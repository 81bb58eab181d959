package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `shingle_hash3(wh)` — rolling 3-gram shingle hashes over a word-hash
  * array: `((u₁·37 + u₂) mod p · 41 + u₃) mod p` with `uₖ = wh[k] mod
  * 2³⁰`, value-identical to the composed slice/zip_with form the
  * DuckDB oracle reproduces (see
  * [[graft.operators.Dedup.shingleHashes3]]).
  *
  * Exists for performance on the dedup hot path: the composed form
  * allocates three slice copies and runs two interpreted zip_with
  * lambdas per row (~4.3 s over the 10× soak corpus); this native
  * expression emits all shingles in one pass of primitive-long
  * arithmetic inside whole-stage codegen.
  *
  * Null semantics match the composed form exactly: a NULL input array
  * or fewer than 3 elements → EMPTY array (the `when(size ≥ 3, …)
  * .otherwise(array())` fallback — note `size(null)` is null under
  * ANSI, which also falls to the otherwise branch); a window
  * containing any null element → a null shingle entry (lambda null
  * propagation).
  */
case class ShingleHash3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash3 requires ARRAY<BIGINT>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHash3.Empty
    else ShingleHash3.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = ${c.isNull}
          ? graft.functions.ShingleHash3.Empty()
          : graft.functions.ShingleHash3.compute(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash3 =
    copy(child = newChild)
}

object ShingleHash3 {
  private val M = MinHashSig.M
  private val P = MinHashSig.P

  private val empty = new GenericArrayData(new Array[Any](0))
  def Empty(): ArrayData = empty

  def compute(wh: ArrayData): ArrayData = {
    val n = wh.numElements()
    if (n < 3) return empty
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      if (!(wh.isNullAt(i) || wh.isNullAt(i + 1) || wh.isNullAt(i + 2))) {
        val u1 = wh.getLong(i) % M
        val u2 = wh.getLong(i + 1) % M
        val u3 = wh.getLong(i + 2) % M
        out(i) = ((u1 * 37L + u2) % P * 41L + u3) % P
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
