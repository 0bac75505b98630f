package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a first-class plan — SURVEY §2's custom-operator
  * ladder rung (c): logical node + Strategy + physical operator,
  * registered through [[graft.GraftExtensions]]. The compositional form
  * ([[graft.operators.AsOfJoin]]) expresses the same semantics with
  * union + window; this operator plans the join directly as one streamed
  * merge pass per co-partition: no union of mismatched schemas, no
  * window frame buffering, and the right side's payload is held as ONE
  * row per key at any moment. Same scale shape (hash-cluster both sides
  * on the key, sort within partitions), strictly less work per row.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression,
    carried: Seq[NamedExpression],
    carriedOut: Seq[Attribute]) extends BinaryNode {
  // the exec derives its interpreted orderings from the LEFT types and
  // applies them to right-side values — a type mismatch would surface as
  // a ClassCastException inside an executor task (or a silently wrong
  // comparison); fail at plan construction instead
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types differ: left ${leftKey.dataType.simpleString} " +
      s"vs right ${rightKey.dataType.simpleString}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types differ: left ${leftTime.dataType.simpleString} " +
      s"vs right ${rightTime.dataType.simpleString}")
  override def output: Seq[Attribute] = left.output ++ carriedOut
  // the node republishes EVERY left column: without this, ColumnPruning
  // would strip the left child down to the key/time expressions
  override def references: AttributeSet =
    AttributeSet(left.output) ++
      AttributeSet(Seq(rightKey, rightTime, rightTie).flatMap(_.references)) ++
      AttributeSet(carried.flatMap(_.references))
  override def producedAttributes: AttributeSet = AttributeSet(carriedOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: inject via
  * `ext.injectPlannerStrategy(_ => AsOfJoinStrategy)`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie, carried, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, carried, out) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join. Children are hash-clustered on the key and sorted
  * by (key, time[, tie]) — EnsureRequirements inserts the exchanges/sorts —
  * then each co-partition pair merges in one pass: the right cursor
  * advances while its (key, time) is at-or-before the left row's, keeping
  * only the latest matching payload per key. Right rows for already-passed
  * keys are discarded as they stream by (both sides are key-sorted, so
  * they can never match again). NULL keys/times never match, mirroring
  * SQL join semantics and the window form (where NULL times sort first
  * and carry nothing).
  */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression,
    carried: Seq[NamedExpression],
    carriedOut: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carriedOut
  override def producedAttributes: AttributeSet = AttributeSet(carriedOut)

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
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val carriedExprs = carried
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val (lOut, rOut) = (left.output, right.output)
    val outAttrs = output
    val cOut = carriedOut
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val carriedProj = UnsafeProjection.create(carriedExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ cOut)
      val joined = new JoinedRow
      val nullCarried = InternalRow.fromSeq(Seq.fill(cOut.size)(null))
      val rBuf = rIter.buffered
      var lastKey: Any = null
      var lastCarried: InternalRow = null
      lIter.map { l =>
        val k = lk.eval(l)
        val t = lt.eval(l)
        if (k != null && t != null) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rk.eval(head)
            val ht = rt.eval(head)
            if (hk == null || ht == null) rBuf.next() // can never match
            else {
              val c = keyOrd.compare(hk, k)
              if (c < 0) rBuf.next() // passed key: discard
              else if (c == 0 && timeOrd.compare(ht, t) <= 0) {
                rBuf.next()
                // hk may be a buffer-backed value (UTF8String/Binary) that
                // the sorted iterator reuses on the next row — copy it, like
                // the .copy() on the carried projection below
                lastKey = InternalRow.copyValue(hk)
                lastCarried = carriedProj(head).copy()
              } else advance = false
            }
          }
        }
        val payload =
          if (k != null && lastCarried != null && keyOrd.compare(lastKey, k) == 0) lastCarried
          else nullCarried
        resultProj(joined(l, payload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
