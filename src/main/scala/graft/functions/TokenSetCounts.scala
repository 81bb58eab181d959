package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_set_counts(tokens, sets)` — for each keyword set, the number of
  * tokens (with multiplicity) that belong to it, in ONE pass over the
  * token array with hashed membership.
  *
  * Replaces N× `size(filter(toks, t => array_contains(set, t)))`: the
  * composed form scans the token array once per set with an O(|set|)
  * interpreted containment per token (language-ID over 5 marker sets =
  * 5 array scans × set scans — the measured hotspot of the text-quality
  * query). Semantics are identical, so the DuckDB oracle keeps the
  * `list_filter`/`list_contains` formulation.
  */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_counts requires ARRAY<STRING>, got ${other.sql}")
  }

  @transient private lazy val prepared: Array[java.util.HashSet[UTF8String]] =
    TokenSetCounts.prepare(sets)

  override protected def nullSafeEval(input: Any): Any =
    TokenSetCounts.count(input.asInstanceOf[ArrayData], prepared)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("tokenSets", prepared,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenSetCounts.count($c, $setsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCounts =
    copy(child = newChild)
}

object TokenSetCounts {
  def prepare(sets: Seq[Seq[String]]): Array[java.util.HashSet[UTF8String]] =
    sets.map { s =>
      val hs = new java.util.HashSet[UTF8String](s.size * 2)
      s.foreach(w => hs.add(UTF8String.fromString(w)))
      hs
    }.toArray

  /** Shared by interpreted eval and generated code. */
  def count(tokens: ArrayData, sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val counts = new Array[Int](sets.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(t)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => Int.box(c): Any))
  }
}
