package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the whole-operator Catalyst route (logical node
  * + planner strategy + physical operator), for the one relational
  * operator in the surface that Spark's built-ins cannot express
  * without either a row-exploding range join or a union+window detour
  * (see graft.operators.AsOfJoin for the composed form and the
  * semantics contract; q93 exercises both against DuckDB ASOF JOIN).
  *
  * Physical algorithm: both children hash-clustered on the equi-keys
  * and sorted by (keys, time); a single streaming merge walks the two
  * sorted iterators per partition, carrying the most recent right
  * payload per key — one shuffle each side, zero buffering beyond one
  * lookahead row and one matched payload, no row explosion. This is
  * the same cost shape as a sort-merge join, but emits exactly one
  * output row per left row.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinPlan into AsOfJoinExec. Registered either via
  * `spark.sql.extensions=graft.plans.GraftExtensions` or lazily by
  * `graft.operators.AsOfJoin.asofBackwardExec` through
  * `spark.experimental.extraStrategies`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(lk, rk, lt, rt, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // Both sides clustered on the join keys (EnsureRequirements makes the
  // two hash partitionings compatible, exactly as for a sort-merge
  // join) and sorted by (keys, time) so the merge below is streaming.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // One output row per left row, in left order => left partitioning
  // and ordering survive (downstream per-key aggregations reuse the
  // exchange).
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val rVals = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val rValProj = UnsafeProjection.create(rVals, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      // bind against NULLABLE right-value attrs: unmatched left rows
      // carry a null payload row, and a non-nullable input attribute
      // (count(), literals) would bind a BoundReference that skips the
      // null check and reads the placeholder as 0
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rVals.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rVals.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one-row lookahead into the right side; rows from rIter stay
        // valid until the next rIter.next(), so no copy is needed here
        private var rCur: InternalRow = _
        // last right payload matching the current key (copied: outlives
        // the iterator's row buffer) and the key it belongs to
        private var lastMatch: InternalRow = _
        private var curKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          if (curKey == null || keyOrd.compare(lKey, curKey) != 0) {
            lastMatch = null
            curKey = lKey.copy()
          }
          // SQL equi-join semantics: null keys never match
          if (!lKey.anyNull) {
            var done = false
            while (!done) {
              if (rCur == null) {
                if (rIter.hasNext) rCur = rIter.next() else done = true
              }
              if (rCur != null) {
                val rKey = rKeyProj(rCur)
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) {
                  // right key already passed by the sorted left side
                  rCur = null
                } else if (c == 0 && rTimeProj(rCur).isNullAt(0)) {
                  // a NULL right time can never satisfy "<= left time"
                  // (it sorts first, so discard and keep scanning)
                  rCur = null
                } else if (c == 0 && !rKey.anyNull &&
                    timeOrd.compare(rTimeProj(rCur), lTimeProj(l)) <= 0) {
                  lastMatch = rValProj(rCur).copy()
                  rCur = null
                } else {
                  done = true // right row is ahead; keep as lookahead
                }
              }
            }
          }
          joined(l, if (lastMatch != null) lastMatch else nullRight)
          resultProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
