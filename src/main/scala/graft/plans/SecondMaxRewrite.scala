package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, LongType}
import graft.functions.SecondMax

/** Optimizer rule: rewrite the naive second-largest SQL idiom
  *
  *   sort_array(collect_list(v), false)[1]          (legacy indexing)
  *   try_element_at(sort_array(collect_list(v), false), 2)
  *
  * into the native [[graft.functions.SecondMax]] aggregate. The naive
  * form materializes every group's values in an ObjectHashAggregate
  * buffer and sorts the array per group — unbounded per-group state,
  * a list-payload shuffle, and no whole-stage codegen. The native
  * aggregate keeps two longs per group, combines map-side, and stays
  * in HashAggregateExec codegen — the second-max downsample kernel's
  * shape (ktx/util.py:164 `'arthur'`, tiff2octree.py:237
  * `downsample_2ndmax`) made available to plain `spark.sql` users
  * through the [[graft.GraftExtensions]] seam.
  *
  * Semantics are matched exactly: duplicates count separately
  * ([5,5] → 5), nulls are skipped by collect_list and by the
  * aggregate's null-skipping update, groups with fewer than two
  * values yield null — which is why only the null-on-out-of-bounds
  * access forms are rewritten (ANSI `[1]` / `element_at` THROW on a
  * 1-element group; those are left untouched).
  */
object SecondMaxRewrite extends Rule[LogicalPlan] {

  /** sort_array(collect_list(c), false) over BIGINT c, non-distinct
    * (distinct would change duplicate semantics) → the rewritten
    * aggregate expression (any FILTER clause is preserved).
    */
  private def sortedDescCollect(e: Expression): Option[Expression] = e match {
    case SortArray(ae @ AggregateExpression(CollectList(c, _, _), _, false, _, _),
          Literal(false, BooleanType)) if c.dataType == LongType =>
      Some(ae.copy(aggregateFunction = SecondMax(c)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate => agg.transformExpressions {
      case g @ GetArrayItem(arr, IntegerLiteral(1), false) =>
        sortedDescCollect(arr).getOrElse(g)
      case el @ ElementAt(arr, IntegerLiteral(2), None, false) =>
        sortedDescCollect(arr).getOrElse(el)
    }
  }
}
