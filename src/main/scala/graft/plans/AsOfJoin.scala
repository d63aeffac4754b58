package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the whole-operator extension level (logical
  * node → strategy → physical operator) for the one relational shape
  * Spark has no first-class operator for.
  *
  * Semantics: for each left row (key, time), attach the right row
  * with the same key and the greatest (rightTime, rightTie) such that
  * rightTime <= time; right columns are null when no such row exists
  * (a left outer as-of match, `q_asof`'s union-and-window semantics).
  *
  * Physical shape: both sides hash-cluster on their key and sort
  * within partitions ((key, t) left / (key, t, tie) right) — declared
  * via requiredChildDistribution/Ordering so EnsureRequirements
  * plans the exchanges, AQE coalesces them, and an already-bucketed
  * input skips the shuffle entirely. The merge itself is one
  * streaming pass per partition holding ONE buffered right row —
  * against the union-and-window formulation ([[graft.relational.Queries.qAsof]])
  * this avoids unioning the two frames into one wide null-padded
  * shuffle and never materializes a window frame; against a
  * point-in-interval bucketed join it needs no interval bound.
  * State is O(1) per partition regardless of key skew; neither side
  * is ever collected or broadcast, so both sides scale to 100 TB.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Maps the logical [[AsOfJoin]] to [[AsOfJoinExec]] — injected via
  * [[graft.GraftExtensions]] and (idempotently) via
  * `spark.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: one forward pass over the two co-partitioned
  * sorted streams. All key/time expressions must be non-null LongType
  * (the caller projects them; nulls upstream should be filtered).
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lEval = UnsafeProjection.create(Seq(leftKey, leftTime), left.output)
      val rEval = UnsafeProjection.create(Seq(rightKey, rightTime), right.output)
      // bind against the node's OWN output: the right attributes are
      // nullable there, so the projection null-checks the null-row
      // fields even when the child schema declares them non-nullable
      val outProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var rKey = 0L
        private var rTime = 0L
        private var rRow: InternalRow = _
        private var haveR = advanceR()
        // the ONE buffered row: the best match seen for matchKey so far
        private var matchRow: InternalRow = _
        private var matchKey = 0L

        private def advanceR(): Boolean = {
          if (rIter.hasNext) {
            rRow = rIter.next()
            val kv = rEval(rRow)
            rKey = kv.getLong(0); rTime = kv.getLong(1)
            true
          } else { rRow = null; false }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val kv = lEval(l)
          val lk = kv.getLong(0); val lt = kv.getLong(1)
          // consume right rows at or before (lk, lt); the last one with
          // key == lk is the as-of match (right is sorted by tie within
          // equal times, so "last" is the greatest (time, tie))
          while (haveR && (rKey < lk || (rKey == lk && rTime <= lt))) {
            if (rKey == lk) {
              // copy: the sorter reuses its output row buffer
              matchRow = rRow.copy(); matchKey = lk
            }
            haveR = advanceR()
          }
          if (matchRow != null && matchKey == lk) outProj(joined(l, matchRow))
          else outProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
