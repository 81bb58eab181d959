package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(hashes, seeds)` — the per-seed minima of the affine
  * mixes `(aₛ·(h mod 2³⁰) + 7aₛ+3) mod p` over a BIGINT hash array,
  * value-identical to the composable form
  * `array(array_min(transform(hashes, h -> ...)) per seed)` that the
  * DuckDB oracle reproduces.
  *
  * Exists for performance on the dedup hot path: the composed form
  * walks the shingle array once PER SEED with an interpreted lambda
  * (8 seeds × ~100 shingles × corpus rows — measured 34 s at the 10×
  * soak where everything around it is seconds); this native expression
  * computes all seed minima in ONE pass of primitive-long arithmetic
  * and participates in whole-stage codegen through a single static
  * call (~25× on that measurement).
  *
  * Null semantics match the composed form exactly — including the
  * subtle one: a NULL input array yields an array of `seeds` null
  * entries, NOT null (the outer `array(...)` constructor in the
  * composed form is not null-propagating, and neither is the SQL
  * oracle's list literal). Null ELEMENTS are skipped; an empty or
  * all-null array likewise yields all-null entries (which
  * [[graft.operators.Dedup.lshBands]] turns into NULL band keys that
  * fall out of the candidate join).
  */
case class MinHashSig(child: Expression, seeds: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if seeds >= 1 && seeds <= MinHashSig.A.length =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig seeds must be in 1..${MinHashSig.A.length}, got $seeds")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinHashSig.ofNulls(seeds)
    else MinHashSig.compute(v.asInstanceOf[ArrayData], seeds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = ${c.isNull}
          ? graft.functions.MinHashSig.ofNulls($seeds)
          : graft.functions.MinHashSig.compute(${c.value}, $seeds);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Affine-mix multipliers for the minhash family. The mix stays below
    * 2⁴⁰ for non-negative h, so it is exact in BIGINT on both engines.
    */
  val A: Array[Long] = Array(31, 37, 41, 43, 47, 53, 59, 61, 67, 71, 73, 79, 83, 89, 97, 101)
  val M: Long = 1073741824L // 2^30
  val P: Long = 1073741789L // largest prime < 2^30

  def ofNulls(seeds: Int): ArrayData = new GenericArrayData(new Array[Any](seeds))

  def compute(arr: ArrayData, seeds: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Any](seeds) // stays null where no non-null element
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hm = arr.getLong(i) % M
        var s = 0
        while (s < seeds) {
          val v = (A(s) * hm + (A(s) * 7L + 3L)) % P
          val cur = mins(s)
          if (cur == null || v < cur.asInstanceOf[Long]) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
