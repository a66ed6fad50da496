package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** As-of join as a FIRST-CLASS operator (SURVEY.md §2.3: the operator
  * class Spark lacks natively; q36 composes it from windows): for every
  * left row, attach the right row with the greatest timestamp `<=` the
  * left timestamp within the same key — null-padded when none exists
  * (as-of LEFT join).
  *
  * This is the full custom-operator stack the engine exposes beyond
  * expressions: logical [[AsOfJoin]] → [[AsOfJoinStrategy]] (planner
  * rule injected via `GraftExtensions`) → [[AsOfJoinExec]], a
  * sort-merge-shaped physical operator.
  *
  * Scale shape: identical to SortMergeJoin — both sides hash-shuffle on
  * the key (`ClusteredDistribution`, so EnsureRequirements co-partitions
  * them) and arrive sorted by (key, ts) (`requiredChildOrdering`, so the
  * sorts ride the shuffle). The merge itself is one streaming pass per
  * partition holding ONE buffered right row and ONE candidate copy — no
  * per-key buffering, no range-join explosion, O(|L|+|R|) per partition
  * at any data size.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    strictUnique: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, strict) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    strictUnique: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same contract as SortMergeJoin: cluster both sides on their key so
    * EnsureRequirements shuffles them co-partitioned.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Sorted by (key, ts) on both sides — the sort rides the shuffle.
    * The RIGHT side additionally totals its order over the remaining
    * atomic columns: when two right rows tie on (key, ts) at the match
    * boundary, the candidate the merge keeps is the LAST in sort order,
    * so without a total order the picked row would vary run-to-run
    * (and a hash-compared query would flake). With it the pick is
    * pinned: the max remaining-columns tuple. (DuckDB's ASOF makes no
    * tie guarantee either — oracle-gated queries should keep the right
    * side unique on (key, ts), as q74's corpus is.)
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      right.output
        .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(a.dataType))
        .filterNot(a => rightKey.references.contains(a) ||
          rightTs.references.contains(a))
        .map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  /** UI/history-server metrics, same as built-in join operators. */
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size

    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // downstream operators require UnsafeRow; flatten the JoinedRow
      val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outputAttrs, outputAttrs)
      // one candidate (copied) right row; valid only while its key
      // equals the current left key
      var cand: InternalRow = null
      var candKey: Long = 0L
      var candTs: Long = 0L

      lIter.map { lRow =>
        val lkAny = lKeyB.eval(lRow)
        val ltAny = lTsB.eval(lRow)
        if (lkAny == null || ltAny == null) {
          numOutputRows += 1
          toUnsafe(joined(lRow, nullRight))
        } else {
          val lk = lkAny.asInstanceOf[Long]
          val lt = ltAny.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rkAny = rKeyB.eval(head)
            val rtAny = rTsB.eval(head)
            if (rkAny == null || rtAny == null) {
              rBuf.next() // null keys/timestamps can never match
            } else {
              val rk = rkAny.asInstanceOf[Long]
              val rt = rtAny.asInstanceOf[Long]
              if (rk < lk || (rk == lk && rt <= lt)) {
                val row = rBuf.next()
                if (rk == lk) { // newest-so-far match for this key
                  // strict mode: a duplicate right (key, ts) that could
                  // influence a result — both copies consumed while
                  // matching this key — raises instead of tie-breaking.
                  // (Ties never consumed, beyond every left ts, cannot
                  // affect output and are deliberately not scanned for.)
                  if (strictUnique && cand != null && candKey == lk &&
                      candTs == rt) throw new IllegalStateException(
                    s"as-of join: right side has duplicate (key=$lk, " +
                      s"ts=$rt) rows and strictUnique is set — " +
                      "deduplicate the right side on (key, ts) first")
                  cand = row.copy()
                  candKey = lk
                  candTs = rt
                }
              } else {
                advance = false
              }
            }
          }
          val matched = cand != null && candKey == lk
          numOutputRows += 1
          if (matched) numMatchedRows += 1
          toUnsafe(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.join(purchases, clicks, "user_id", "user_id", "ts",
  * "ts")`. Columns are resolved BY NAME against each side's analyzed
  * output (Spark 4's Column→Expression bridge defers attribute
  * resolution to the analyzer, so unresolved Column objects can't be
  * planted into a custom logical node directly). Key columns must be
  * LongType and ts columns TimestampType or LongType (both evaluate to
  * long internally) — checked eagerly so misuse fails at plan time, not
  * mid-job. Pre-project expressions (casts, arithmetic) before joining.
  */
object AsOf {
  import org.apache.spark.sql.graftbridge.DatasetBridge

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String): DataFrame =
    join(left, right, leftKey, rightKey, leftTs, rightTs,
      strictUnique = false)

  /** As [[join]], with the right-side uniqueness precondition made
    * STRUCTURAL: `strictUnique = true` raises mid-merge on any duplicate
    * right (key, ts) pair that could influence a result, instead of
    * applying the deterministic max-remaining-columns tie-break. Use it
    * whenever results are compared across engines (DuckDB's ASOF makes
    * no tie guarantee), as q74 does. The check is free: it looks only at
    * rows the merge already consumes.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      strictUnique: Boolean): DataFrame = {
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Self-join guard: when both sides derive from the same DataFrame,
    // any right column not re-aliased by the caller shares its exprId
    // with the left twin; the analyzer's dedupRight only rewrites
    // built-in nodes, and the exec's output projection binds by exprId,
    // so the duplicated right column would silently project the LEFT
    // value. Re-alias every right column to a fresh exprId instead.
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def resolve(name: String, plan: LogicalPlan, side: String,
        keyRole: Boolean): Expression = {
      val matches = plan.output.filter(_.name == name)
      if (matches.isEmpty) throw new IllegalArgumentException(
        s"$side column $name not found in ${plan.output.map(_.name)}")
      if (matches.length > 1) throw new IllegalArgumentException(
        s"$side column $name is ambiguous (${matches.length} attributes) — " +
          "rename one side before joining")
      val attr = matches.head
      (keyRole, attr.dataType) match {
        // keys must be bigint: a timestamp key would silently compare
        // epoch-micros against raw longs on the other side
        case (true, LongType) => attr
        case (true, t) => throw new IllegalArgumentException(
          s"$side as-of KEY column $name must be bigint, got $t")
        case (false, LongType | TimestampType) => attr
        case (false, t) => throw new IllegalArgumentException(
          s"$side as-of ts column $name must be bigint or timestamp, got $t")
      }
    }
    DatasetBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      resolve(leftKey, lPlan, "left key", keyRole = true),
      resolve(rightKey, rPlan, "right key", keyRole = true),
      resolve(leftTs, lPlan, "left ts", keyRole = false),
      resolve(rightTs, rPlan, "right ts", keyRole = false),
      strictUnique))
  }
}
