package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `parse_money("$5M") = 5000000L` — normalize a human money string to
  * integer USD.
  *
  * Deterministic engine-side re-implementation of the normalization
  * contract the reference delegates to its LLM prompt
  * (reference: app/extract/llm_parse.py:44-48 — "$5M"→5000000,
  * "₹20 Cr"→~2.4M via 1 Cr = 10^7 INR at 0.012 USD/INR, EUR×1.1).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` (the
  * generated code calls the static parser) so it participates in
  * whole-stage codegen instead of breaking the pipeline like a UDF.
  * Returns null on unparseable input (e.g. "Undisclosed").
  */
case class ParseMoney(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // Strict input typing: fail at analysis time, not with a runtime
  // ClassCastException / generated-code compile error.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_money requires a STRING argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    ParseMoney.parse(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("parsedMoney")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        java.lang.Long $tmp = graft.functions.ParseMoney.parse(${c.value}.toString());
        if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp.longValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseMoney =
    copy(child = newChild)
}

object ParseMoney {
  // symbol → USD rate, per the reference's prompt contract
  // (app/extract/llm_parse.py:44-48: EUR×1.1, 1 Cr ≈ 2,400,000/20 USD).
  private val Rates = Map('$' -> 1.0, '€' -> 1.1, '£' -> 1.25, '₹' -> 0.012)
  private val Re = Pattern.compile(
    """(?i)\s*([$€£₹])?\s*([0-9][0-9,]*(?:\.[0-9]+)?)\s*(k|m|mn|million|b|bn|billion|cr|crore|l|lakh)?\s*""")
  private val InrMagnitudes = Set("cr", "crore", "l", "lakh")

  /** Static entry point shared by interpreted eval and generated code.
    *
    * Pinned contract (ParseMoneySpec): crore/lakh magnitudes imply INR
    * even without an explicit ₹ ("20 Cr" ≡ "₹20 Cr" → 2,400,000 USD);
    * an explicit non-₹ symbol wins over the magnitude word. Malformed
    * digit grouping ("12,34") is rejected.
    */
  def parse(s: String): java.lang.Long = {
    val m = Re.matcher(s.trim)
    if (!m.matches()) return null
    val numStr = m.group(2)
    // Enforce digit grouping: commas, if present, must be thousands groups.
    if (numStr.contains(",") &&
        !numStr.matches("""[0-9]{1,3}(,[0-9]{3})*(\.[0-9]+)?""")) return null
    val sym = Option(m.group(1)).map(_.charAt(0))
    val num =
      try numStr.replace(",", "").toDouble
      catch { case _: NumberFormatException => return null }
    val magWord = Option(m.group(3)).map(_.toLowerCase)
    val mag = magWord match {
      case None                              => 1e0
      case Some("k")                         => 1e3
      case Some("m" | "mn" | "million")      => 1e6
      case Some("b" | "bn" | "billion")      => 1e9
      case Some("cr" | "crore")              => 1e7
      case Some("l" | "lakh")                => 1e5
      case _                                 => return null
    }
    val rate = sym.flatMap(Rates.get).getOrElse {
      if (magWord.exists(InrMagnitudes)) Rates('₹') else 1.0
    }
    java.lang.Long.valueOf(math.round(num * mag * rate))
  }
}
