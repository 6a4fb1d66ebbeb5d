package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Descending,
  Ascending, EqualTo, Expression, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal, NullsLast, RowNumber, RowOrdering, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project,
  Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer extension (brief option (c), the `Rule[LogicalPlan]`
  * leg): rewrites the classic per-group top-k anti-pattern
  *
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(v.desc, t.asc)))
  *     .filter(rn <= k).drop("rn")
  *
  * into the TopKPerGroup heap operator whenever the rank column is
  * DISCARDED above the filter — i.e. the query wants the top-k ROWS,
  * not their ranks. The window plan sorts every row of every group
  * after a full shuffle; Spark's own InferWindowGroupLimit (3.5+)
  * prunes rows below rank k map-side but still sorts the survivors
  * and still runs the Window operator. This rewrite removes the sort
  * and the Window entirely: partial per-partition k-heaps, one
  * clustered exchange of ≤ k rows per group per partition, final
  * heaps. Where the rank IS kept (q_topn_per_group's output), the
  * window plan stands — the rule never fires on it.
  *
  * Fires only when the plan provably matches the heap's semantics:
  * single row_number window expression, value DESC NULLS LAST, tie
  * ASC with NULLS LAST (or a non-nullable tie), orderable types, and
  * a non-empty partition spec.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** rn <= k / rn < k+1 / rn = 1 / k >= rn, with an integer literal. */
  private object RnLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, _)) => Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(k: Int, _)) if k == 1 => Some((a, 1))
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) => Some((a, k))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projList,
        Filter(RnLimit(rn, k),
          Window(Seq(al @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(part, Seq(ord, tie), _)), _)),
            _, _, child, _)))
        if k >= 1 && part.nonEmpty &&
          rn.semanticEquals(al.toAttribute) &&
          ord.direction == Descending && ord.nullOrdering == NullsLast &&
          tie.direction == Ascending &&
          (tie.nullOrdering == NullsLast || !tie.child.nullable) &&
          RowOrdering.isOrderable(ord.child.dataType) &&
          RowOrdering.isOrderable(tie.child.dataType) &&
          projList.forall(ne => !ne.references.contains(al.toAttribute)) =>
      // Spark's own InferWindowGroupLimit (which runs in the main
      // optimizer batches, before extension rules) may already have
      // slid a WindowGroupLimit under the Window; the heap subsumes
      // its pruning, so strip it — keeping it would sort AND heap.
      val base = child match {
        case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case other => other
      }
      Project(projList, TopKPerGroup(k, part, ord.child, tie.child, base))
  }
}
