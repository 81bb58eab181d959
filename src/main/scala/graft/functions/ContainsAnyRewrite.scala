package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Optimizer rule: collapse wide OR-chains of `Contains(c, 'lit')` over
  * the SAME (canonicalized) child into one `exists(array(lits), x ->
  * contains(c, x))`.
  *
  * Motivation (measured, not hypothetical): a keyword/blocklist
  * membership test written as `c.contains(a) || c.contains(b) || ...`
  * duplicates the whole expression tree of `c` once per literal. With
  * `c` a nested parse_url host chain and ~21 list entries, that
  * inflated the resolver stage's plan ~20x — optimizer and codegen time
  * dominated the hermetic pipeline's wall clock (q27, round 4). Library
  * code now writes `exists` directly; this rule repairs the pattern
  * wherever USER queries contain it.
  *
  * Semantics are EXACTLY preserved, including evaluation order: only
  * CONTIGUOUS runs of contains-on-the-same-child collapse, and the
  * `exists` replaces the run in place. `ArrayExists` evaluates the
  * literal array left-to-right with the same short-circuit and 3VL as
  * the OR chain it replaces (null child → null element results → null
  * overall unless a true exists; string literals are never null), so
  * under ANSI mode an error-throwing or nondeterministic disjunct
  * elsewhere in the chain still evaluates exactly when it did before —
  * a non-contiguous rewrite could short-circuit it away (run true
  * before the interleaved term) or reorder it. Only runs of at least
  * [[MinTerms]] rewrite — below that the fold is harmless and the plan
  * churn isn't worth it.
  */
object ContainsAnyRewrite extends Rule[LogicalPlan] {

  val MinTerms = 8

  private def orTerms(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => orTerms(l) ++ orTerms(r)
    case other => Seq(other)
  }

  private def isStringLit(e: Expression): Boolean = e match {
    case Literal(v, StringType) => v != null
    case _ => false
  }

  /** Collapsible term: contains(deterministic child, non-null string
    * literal). The deterministic-child guard matches Catalyst's own
    * rewrites — collapsing N disjuncts into one evaluation is only
    * sound when re-evaluating the child cannot change its value.
    */
  private def runKey(e: Expression): Option[Expression] = e match {
    case Contains(c, p) if isStringLit(p) && c.deterministic =>
      Some(c.canonicalized)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case or: Or =>
      val terms = orTerms(or)
      val out = scala.collection.mutable.ArrayBuffer.empty[Expression]
      var fired = false
      var i = 0
      while (i < terms.length) {
        val k = runKey(terms(i))
        if (k.isEmpty) { out += terms(i); i += 1 }
        else {
          // maximal contiguous run on the same canonicalized child
          var j = i + 1
          while (j < terms.length && runKey(terms(j)) == k) j += 1
          val run = terms.slice(i, j)
          if (run.size >= MinTerms) {
            val child = run.head.asInstanceOf[Contains].left
            val lits = run.map(_.asInstanceOf[Contains].right)
            val x = NamedLambdaVariable("x", StringType, nullable = false)
            out += ArrayExists(
              CreateArray(lits),
              LambdaFunction(Contains(child, x), Seq(x)))
            fired = true
          } else out ++= run
          i = j
        }
      }
      if (!fired) or else out.reduceLeft(Or(_, _))
  }
}
