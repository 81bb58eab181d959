package graft.functions

import java.net.URI

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `url_join(base, href)` — resolve a possibly-relative href against a base
  * URL (RFC 3986 resolution, what a browser does with an anchor's href).
  *
  * Spark has no builtin for this (SURVEY.md §2.7 — the reference leans on
  * Python's urljoin at app/hiring/detect_ats.py:98,108,114). Native
  * Catalyst `Expression` with codegen calling the static resolver.
  * Null-safe: null if either side is null or the base is unparseable.
  */
case class UrlJoin(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_join requires (STRING, STRING), got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(base: Any, href: Any): Any =
    UrlJoin.resolve(base.toString, href.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val tmp = ctx.freshName("joined")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${l.isNull} && !${r.isNull}) {
        UTF8String $tmp = graft.functions.UrlJoin.resolve(${l.value}.toString(), ${r.value}.toString());
        if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp; }
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlJoin =
    copy(left = l, right = r)
}

object UrlJoin {
  /** Static entry point shared by interpreted eval and generated code.
    *
    * `java.net.URI.resolve` implements RFC 2396, which drops the base
    * path for empty and query-only references; RFC 3986 §5.3 (what
    * browsers and Python's urljoin do) keeps it — patched here.
    */
  def resolve(base: String, href: String): UTF8String =
    try {
      val b = new URI(base)
      val resolved =
        if (href.isEmpty) stripFragment(base)
        else if (href.startsWith("?")) stripQueryFragment(base) + href
        else if (href.startsWith("#")) stripFragment(base) + href
        else b.resolve(href).toString
      UTF8String.fromString(resolved)
    } catch { case _: Exception => null }

  private def stripFragment(u: String): String = {
    val i = u.indexOf('#')
    if (i < 0) u else u.substring(0, i)
  }

  private def stripQueryFragment(u: String): String = {
    val f = stripFragment(u)
    val i = f.indexOf('?')
    if (i < 0) f else f.substring(0, i)
  }
}
