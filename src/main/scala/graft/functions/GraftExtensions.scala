package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: makes the engine's custom Catalyst
  * expressions available as SQL functions in any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * This is the library-distribution path (cluster-wide via the config
  * key, no code change in the user's job); [[GraftFunctions.registerAll]]
  * does the same imperatively for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Arity guard: a mis-called function gets a clean AnalysisException
    * naming the expected signature instead of an
    * IndexOutOfBoundsException from `es(1)`.
    */
  private def checkArity(es: Seq[Expression], n: Int, sig: String): Unit =
    if (es.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> sig.takeWhile(_ != '('),
          "expectedNum" -> n.toString,
          "actualNum" -> es.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ContainsAnyRewrite)
    ext.injectFunction((
      FunctionIdentifier("parse_money"),
      info("parse_money", "parse_money(str) - money string to integer USD"),
      (es: Seq[Expression]) => {
        checkArity(es, 1, "parse_money(str)")
        ParseMoney(es.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("url_join"),
      info("url_join", "url_join(base, href) - RFC 3986 reference resolution"),
      (es: Seq[Expression]) => {
        checkArity(es, 2, "url_join(base, href)")
        UrlJoin(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential double dot product"),
      (es: Seq[Expression]) => {
        checkArity(es, 2, "dot_product(a, b)")
        DotProduct(es.head, es(1))
      }))
  }
}
