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
  * Semantics are unchanged: OR is commutative under three-valued logic
  * and `ArrayExists` follows the same 3VL (null child → null element
  * results → null overall unless a true exists; string literals are
  * never null). Only groups of at least [[MinTerms]] rewrite — below
  * that the fold is harmless and the plan churn isn't worth it.
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case or: Or =>
      val terms = orTerms(or)
      // deterministic-child guard: collapsing N disjuncts into one
      // evaluation is only sound when re-evaluating the child cannot
      // change its value (Catalyst's own rewrites guard the same way)
      val (containsTerms, rest) = terms.partition {
        case Contains(c, p) => isStringLit(p) && c.deterministic
        case _ => false
      }
      val groups = containsTerms.groupBy {
        case Contains(c, _) => c.canonicalized
      }
      if (!groups.exists(_._2.size >= MinTerms)) or
      else {
        val rewritten = groups.toSeq.flatMap { case (_, grp) =>
          if (grp.size < MinTerms) grp
          else {
            val child = grp.head.asInstanceOf[Contains].left
            val lits = grp.map(_.asInstanceOf[Contains].right)
            val x = NamedLambdaVariable("x", StringType, nullable = false)
            Seq(ArrayExists(
              CreateArray(lits),
              LambdaFunction(Contains(child, x), Seq(x))))
          }
        }
        (rewritten ++ rest).reduceLeft(Or(_, _))
      }
  }
}
