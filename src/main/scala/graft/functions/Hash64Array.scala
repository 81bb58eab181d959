package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash64_array(arr, seed)` — md5-based 60-bit hash of every element of
  * a string array, bit-identical to the composable
  * `conv(substr(md5(seed || ':' || x), 1, 15), 16, 10)` form
  * ([[GraftFunctions.hash64]]) that the DuckDB oracle reproduces.
  *
  * Exists for performance on the dedup hot path: hashing inside a
  * higher-order-function lambda runs the interpreted md5→substr→conv
  * expression chain per element (~17 µs each measured at sf0.1); this
  * native expression does one digest per element in a tight loop with a
  * thread-local MessageDigest (~0.5 µs), and participates in whole-stage
  * codegen through a single static call.
  */
case class Hash64Array(child: Expression, seed: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash64_array requires ARRAY<STRING>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Hash64Array.hashAll(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash64Array.hashAll($c, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Hash64Array =
    copy(child = newChild)
}

object Hash64Array {
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** 60-bit value of the first 15 hex digits of md5(seed ++ ":" ++ s). */
  def hashOne(s: UTF8String, seedPrefix: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    md.update(seedPrefix)
    md.update(s.getBytes)
    val d = md.digest()
    // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >> 4)
  }

  def seedPrefix(seed: Int): Array[Byte] =
    (seed.toString + ":").getBytes("UTF-8")

  def hashAll(arr: ArrayData, seed: Int): ArrayData = {
    val prefix = seedPrefix(seed)
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(i) = hashOne(arr.getUTF8String(i), prefix)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side scalar twin (for precomputing data-independent
    * constants like LSH hyperplanes — identical to the SQL form).
    */
  def hashString(s: String, seed: Int): Long =
    hashOne(UTF8String.fromString(s), seedPrefix(seed))
}
