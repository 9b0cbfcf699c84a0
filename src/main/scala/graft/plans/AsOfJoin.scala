package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native AS-OF JOIN — a whole-operator Catalyst extension (LogicalPlan +
  * SparkStrategy + SparkPlan), the (c)-tier of the custom-operator
  * preference order. OSS Spark has no as-of/range join: the declarative
  * formulation (equi-join on the key + `ts <= ts` residual + max_by)
  * materializes every (left, prior-right) PAIR before aggregating — at a
  * skewed 100 TB key that blowup is quadratic per key. This operator
  * instead asks for both sides hash-partitioned on the key and sorted by
  * (key, ts[, tiebreak]) — one shuffle each, exactly like a sort-merge
  * join — then streams BOTH sides once per partition: for each left row,
  * the latest right row with `r_ts <= l_ts` on the same key. Left-outer
  * semantics: unmatched left rows emit nulls for the right columns.
  *
  * Constraints (checked at planning): key and tiebreak are BIGINT, ts is
  * TIMESTAMP or BIGINT, and the two sides must not share column names
  * (pre-alias the right side). Ties on (key, ts) resolve to the largest
  * tiebreak value — a total, engine-portable order.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one hash shuffle per side (same as SMJ) …
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // … and in-partition sort by (key, ts[, tiebreak]) so the merge is one pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val nRight = right.output.size
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey = 0L
        private var rHeadTs = 0L
        private var rDone = false
        private var primed = false
        private var candidate: InternalRow = _
        private var prevKey = 0L
        private var firstLeft = true

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rk.eval(rHead).asInstanceOf[Long]
            rHeadTs = rt.eval(rHead).asInstanceOf[Long]
          } else { rHead = null; rDone = true }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          if (!primed) { advanceRight(); primed = true }
          val l = lIter.next()
          val k = lk.eval(l).asInstanceOf[Long]
          val t = lt.eval(l).asInstanceOf[Long]
          if (firstLeft || k != prevKey) { candidate = null; prevKey = k; firstLeft = false }
          // advance the right side past every row that is (a) on an earlier
          // key or (b) on this key at ts <= t; the last (b)-row seen is the
          // as-of match (right side is sorted by (key, ts, tiebreak))
          while (!rDone && rHead != null &&
              (rHeadKey < k || (rHeadKey == k && rHeadTs <= t))) {
            if (rHeadKey == k) candidate = rHead.copy()
            advanceRight()
          }
          resultProj(joiner(l, if (candidate == null) nullRight else candidate))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical operator.
  * Installed either via `GraftExtensions` (injectPlannerStrategy) or
  * lazily through `spark.experimental.extraStrategies` (AsOfJoin.asof does
  * this), mirroring the dual registration of the native functions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rtb) =>
      require(lk.dataType == LongType && rk.dataType == LongType,
        "graft as-of join: keys must be BIGINT")
      require(Seq(lt, rt).forall(e =>
        e.dataType == TimestampType || e.dataType == LongType),
        "graft as-of join: ts must be TIMESTAMP or BIGINT")
      require(rtb.dataType == LongType,
        "graft as-of join: tiebreak must be BIGINT")
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rtb) :: Nil
    case _ => Nil
  }
}

/** Public API: `AsOfJoin.asof(errors, clicks, "user_id", "c_user",
  * "ts", "c_ts", "c_id")`. Column names are resolved against their own
  * side eagerly, so the plan reaches the planner fully resolved. */
object AsOfJoin {
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTiebreak: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    import org.apache.spark.sql.graftbridge.Bridge
    def attr(df: DataFrame, name: String): Expression =
      Bridge.expression(df.col(name))
    Bridge.ofRows(spark,
      AsOfJoinPlan(left.queryExecution.analyzed, right.queryExecution.analyzed,
        attr(left, leftKey), attr(right, rightKey),
        attr(left, leftTs), attr(right, rightTs),
        attr(right, rightTiebreak)))
  }
}
