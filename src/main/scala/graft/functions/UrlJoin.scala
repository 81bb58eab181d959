package graft.functions

import java.net.URI

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
  /** Static entry point shared by interpreted eval and generated code. */
  def resolve(base: String, href: String): UTF8String =
    try UTF8String.fromString(new URI(base).resolve(href).toString)
    catch { case _: Exception => null }
}
