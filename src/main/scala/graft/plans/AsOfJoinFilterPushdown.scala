package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (injected via `GraftExtensions.injectOptimizerRule`):
  * push filter conjuncts that reference only the LEFT side below an
  * [[AsOfJoin]].
  *
  * Catalyst's built-in PushDownPredicates knows nothing about custom
  * nodes, so without this rule ANY filter above an as-of join sticks
  * above it — the join processes the full input and the predicate never
  * reaches the parquet scan. Pushing left-only conjuncts is semantics-
  * preserving because the as-of LEFT join emits each left row exactly
  * once (right columns are attached or null-padded, never multiplied or
  * dropped), so filtering on left columns commutes with the join.
  * Right-side conjuncts do NOT commute (dropping right rows changes
  * which row is "most recent") and stay put.
  *
  * Once below the join, the predicate lands directly above the left
  * subtree where FileSourceStrategy's PhysicalOperation collection
  * carries it into the scan's PushedFilters — verified in
  * AsOfJoinSpec.
  */
object AsOfJoinFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      // Mirror Catalyst's PushDownPredicates: only the deterministic
      // PREFIX (conjuncts before the first nondeterministic one) may
      // move — pushing a conjunct from after it would change how many
      // rows, and in what order, the nondeterministic predicate sees.
      val (candidates, nonDetTail) =
        splitConjunctivePredicates(cond).span(_.deterministic)
      val (leftOnly, rest) =
        candidates.partition(_.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(leftOnly.reduce(And), j.left))
        (rest ++ nonDetTail).reduceOption(And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
