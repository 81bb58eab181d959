package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
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
  // symbol → USD rate; Cr/L handle the INR magnitude words.
  private val Rates = Map('$' -> 1.0, '€' -> 1.1, '£' -> 1.25, '₹' -> 0.012)
  private val Re = Pattern.compile(
    """(?i)\s*([$€£₹])?\s*([0-9][0-9,]*(?:\.[0-9]+)?)\s*(k|m|mn|million|b|bn|billion|cr|crore|l|lakh)?\s*""")

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(s: String): java.lang.Long = {
    val m = Re.matcher(s.trim)
    if (!m.matches()) return null
    val sym = Option(m.group(1)).map(_.charAt(0))
    val num =
      try m.group(2).replace(",", "").toDouble
      catch { case _: NumberFormatException => return null }
    val mag = Option(m.group(3)).map(_.toLowerCase) match {
      case None                              => 1e0
      case Some("k")                         => 1e3
      case Some("m" | "mn" | "million")      => 1e6
      case Some("b" | "bn" | "billion")      => 1e9
      case Some("cr" | "crore")              => 1e7
      case Some("l" | "lakh")                => 1e5
      case _                                 => return null
    }
    val rate = sym.flatMap(Rates.get).getOrElse(1.0)
    java.lang.Long.valueOf(math.round(num * mag * rate))
  }
}
