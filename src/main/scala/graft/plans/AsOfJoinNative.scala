package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Native as-of join as a WHOLE-OPERATOR Catalyst extension — the
  * (c) rung of the custom-operator ladder: a custom LogicalPlan +
  * SparkStrategy + SparkPlan, registered through
  * SparkSessionExtensions (GraftExtensions.injectPlannerStrategy).
  *
  * Semantics (same contract as the composed operators/AsOfJoin): for
  * each left row, the LATEST right row with rightTime <= leftTime on
  * the same key; inner — unmatched left rows are dropped. The right
  * side should be unique per (key, time) for deterministic output.
  *
  * Physical shape: EnsureRequirements hash-partitions both sides on
  * the key and sorts them (key, time) — ONE exchange + one sort per
  * side, identical to a sort-merge equi-join — then AsOfJoinExec
  * streams the two sorted partitions with a single forward-only merge
  * pass holding ONE buffered right row (the current best match).
  * Unlike the composed version there is no union, no window, and no
  * null-slot padding: per-row work is two comparisons, memory is
  * O(1) per partition. No range explosion at any scale; skew follows
  * key cardinality exactly as for any keyed join.
  */
case class AsOfJoinPlan(
  left: LogicalPlan, right: LogicalPlan,
  leftKey: Expression, rightKey: Expression,
  leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
    newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinPlan → AsOfJoinExec; injected by GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
  left: SparkPlan, right: SparkPlan,
  leftKey: Expression, rightKey: Expression,
  leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // one hash exchange per side, co-partitioned on the key
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // sorted (key, time) within partitions — the merge pass relies on it
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // serializable ingredients only; the codegen'd projections are
    // compiled PER PARTITION inside the closure (generated classes
    // don't serialize)
    val (lOut, rOut, allOut) = (left.output, right.output, output)
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyGen = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyGen = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeGen = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeGen = UnsafeProjection.create(Seq(rt), rOut)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(allOut, allOut)
      new Iterator[InternalRow] {
        private var nextRow: InternalRow = _
        private var rCur: InternalRow = if (rIt.hasNext) rIt.next() else null
        private var rCurKey: Any = if (rCur != null) rKeyGen(rCur).copy().get(0, keyDt) else null
        private var rCurTime: Any = if (rCur != null) rTimeGen(rCur).copy().get(0, timeDt) else null
        private var bestMatch: InternalRow = _
        private var bestKey: Any = _

        private def advanceRight(): Unit = {
          if (rIt.hasNext) {
            rCur = rIt.next()
            rCurKey = rKeyGen(rCur).copy().get(0, keyDt)
            rCurTime = rTimeGen(rCur).copy().get(0, timeDt)
          } else rCur = null
        }

        private def computeNext(): Unit = {
          nextRow = null
          while (nextRow == null && lIt.hasNext) {
            val lRow = lIt.next()
            val lKey = lKeyGen(lRow).copy().get(0, keyDt)
            val lTime = lTimeGen(lRow).copy().get(0, timeDt)
            // consume right rows at-or-before (lKey, lTime); the last
            // same-key one seen is the as-of match
            var advancing = true
            while (advancing && rCur != null) {
              val kc = keyOrd.compare(rCurKey, lKey)
              if (kc < 0 || (kc == 0 && timeOrd.compare(rCurTime, lTime) <= 0)) {
                if (kc == 0) { bestMatch = rCur.copy(); bestKey = rCurKey }
                advanceRight()
              } else advancing = false
            }
            if (bestMatch != null && keyOrd.compare(bestKey, lKey) == 0) {
              nextRow = resultProj(joined(lRow, bestMatch))
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextRow == null) computeNext()
          nextRow != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
    newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Builder API: lifts two frames into the custom plan. Column names
  * must be disjoint (rename before joining) so the joined output is
  * unambiguous.
  */
object AsOfJoinNative {
  def asOf(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
    leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    val lp = PlanBridge.analyzed(left)
    val rp = PlanBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    PlanBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime)))
  }
}
