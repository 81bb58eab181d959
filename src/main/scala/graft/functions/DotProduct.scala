package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot_product(a, b)` — sequential double-precision dot product of two
  * float/double array columns.
  *
  * Bit-identical to the composable
  * `aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)), 0d, _+_)`
  * form (and to the DuckDB oracle's `list_reduce(list_transform(...))`):
  * every product is computed in double and accumulated strictly in array
  * order, so the IEEE result is reproducible across engines. NULL when
  * either side is NULL, the lengths differ, or any element is NULL —
  * exactly the builtin composition's propagation.
  *
  * Exists for performance on the similarity hot path (SURVEY.md §0 north
  * star): higher-order-function lambdas are interpreted per element, which
  * made the within-bucket cosine joins (q14/q15/q25/q26) spend ~90% of
  * their time in `aggregate`/`zip_with` eval. This native expression is
  * one tight loop over the two ArrayDatas and participates in whole-stage
  * codegen through a single static call.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<FLOAT|DOUBLE> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.functions.DotProduct.dot(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Sequential in-order double accumulation; null on length mismatch or
    * any null element (matching zip_with + aggregate null propagation).
    */
  def dot(a: ArrayData, b: ArrayData,
          aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
