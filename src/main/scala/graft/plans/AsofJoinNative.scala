package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join as a first-class planner operator: logical node +
  * strategy + physical exec, registered through SparkSessionExtensions
  * (the (c) rung of the custom-operator ladder — used when composition of
  * built-ins can't express the operator's cost model; compare
  * [[graft.operators.AsofJoin]], the compositional union+window form).
  *
  * Physical semantics: both children are hash-clustered on the key and
  * sorted by (key, ts) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements plans the minimal
  * shuffles/sorts (and can elide them when the child is already
  * partitioned correctly, e.g. bucketed tables — exactly what the
  * union+window encoding cannot communicate to the planner). Each task
  * then runs a single streaming merge over the two sorted iterators:
  * O(|L| + |R|) per partition, no buffering beyond one payload row.
  *
  * v1 restrictions (checked at construction): key and ts must be
  * long-backed (LongType / TimestampType / IntegerType keys widen fine via
  * cast upstream). Right rows should be unique per (key, ts) for
  * deterministic output — same contract as the compositional form.
  * Nullable key/ts are supported and follow the window form's semantics:
  * a null key is one ordinary group, a null ts sorts before (matches
  * at-or-before) every timestamp.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    // constructor parameter, NOT derived: output attribute ids must stay
    // stable across copy()/withNewChildren during analysis/optimization
    payloadOut: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  // the asof_* columns are minted by this operator, not read from children
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinPlan {
  def apply(left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, leftTs: Attribute,
      rightKey: Attribute, rightTs: Attribute,
      payload: Seq[Attribute]): AsofJoinPlan =
    AsofJoinPlan(left, right, leftKey, leftTs, rightKey, rightTs, payload,
      payload.map(a =>
        AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)()))
}

class AsofJoinStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.payload, p.output) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    output: Seq[Attribute]) extends BinaryExecNode {

  override def producedAttributes: AttributeSet =
    AttributeSet(output.drop(left.output.size))

  // Pin both children to the same explicit partition count: doExecute zips
  // the two RDDs partitionwise, so AQE must not coalesce the two input
  // shuffles to different counts (a requiredNumPartitions-bearing
  // distribution is honored by EnsureRequirements and re-validated after
  // every AQE re-plan).
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKey :: Nil, requiredNumPartitions = n) ::
      ClusteredDistribution(rightKey :: Nil, requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyOrd >= 0 && lTsOrd >= 0 && rKeyOrd >= 0 && rTsOrd >= 0,
      "asof join: key/ts attributes must come from the respective child")
    val payloadOrds = payload.map(a =>
      right.output.indexWhere(_.exprId == a.exprId)).toArray
    require(payloadOrds.forall(_ >= 0),
      "asof join: payload attributes must come from the right child")
    val rightSchema = right.output
    val nPayload = payloadOrds.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // project a right row to its payload fields (copied: the source
      // UnsafeRow is reused by the sort iterator)
      val payloadProj = UnsafeProjection.create(payload, rightSchema)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadValid = false
        private var lastKeyNull = false
        private var lastKey = 0L
        private var lastPayload: InternalRow = _

        private def advanceRight(): Unit = {
          if (rIter.hasNext) { rHead = rIter.next(); rHeadValid = true }
          else { rHead = null; rHeadValid = false }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        // Nullable key/ts must follow the child SortOrder (Ascending =
        // NULLS FIRST) or the merge's monotonic-key assumption breaks on a
        // partition mixing null and negative keys (getLong reads null as 0).
        // Semantics match asofJoinLast's window form: null keys are one
        // ordinary group (SQL partitionBy), null ts sorts before every
        // timestamp (= matches "at or before" any left ts).
        @inline private def cmp(aNull: Boolean, a: Long,
            bNull: Boolean, b: Long): Int =
          if (aNull && bNull) 0 else if (aNull) -1 else if (bNull) 1
          else java.lang.Long.compare(a, b)

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkNull = l.isNullAt(lKeyOrd)
          val lk = if (lkNull) 0L else l.getLong(lKeyOrd)
          val ltNull = l.isNullAt(lTsOrd)
          val lt = if (ltNull) 0L else l.getLong(lTsOrd)
          // consume right rows at or before (lk, lt); remember the latest
          while (rHeadValid && {
            val rkNull = rHead.isNullAt(rKeyOrd)
            val rk = if (rkNull) 0L else rHead.getLong(rKeyOrd)
            val kc = cmp(rkNull, rk, lkNull, lk)
            kc < 0 || (kc == 0 && {
              val rtNull = rHead.isNullAt(rTsOrd)
              val rt = if (rtNull) 0L else rHead.getLong(rTsOrd)
              cmp(rtNull, rt, ltNull, lt) <= 0
            })
          }) {
            lastKeyNull = rHead.isNullAt(rKeyOrd)
            lastKey = if (lastKeyNull) 0L else rHead.getLong(rKeyOrd)
            lastPayload = payloadProj(rHead).copy()
            advanceRight()
          }
          if (lastPayload != null && cmp(lastKeyNull, lastKey, lkNull, lk) == 0)
            joined(l, lastPayload)
          else joined(l, nullPayload)
        }
      }
    }
  }
}
