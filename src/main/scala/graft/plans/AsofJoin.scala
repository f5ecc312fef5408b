package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native sort-merge AS-OF join — the whole-operator extension case
  * ((c) in the build brief's preference order): Spark has no as-of join
  * operator, and the window-composition form (union both sides, one
  * window, filter) carries the probe side through the sort and cannot
  * prune the build side's columns independently. This operator is the
  * classic time-series implementation instead: co-partition both sides
  * by key, sort each by (key, time), and merge with a single forward
  * scan per partition — each right row is visited ONCE no matter how
  * many left rows it serves, state is one buffered row, and the plan
  * shape is two exchanges + two sorts, the same as a sort-merge equi
  * join.
  *
  * Semantics: for every left row, the matched right row is the LAST one
  * (in (key, time) order) with the same key and `rightTime <=
  * leftTime`; right columns are null when no such row exists. Callers
  * who need tie determinism beyond the time column should project only
  * the time (or aggregate) from the right side.
  *
  * Registered via `SparkSessionExtensions` (`GraftSparkExtensions` for
  * `spark.sql.extensions`) or injected into a live session through
  * `experimental.extraStrategies` — `AsofJoin.asof` does the latter
  * automatically.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val allOut = output
    val rWidth = rOut.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTime = BindReferences.bindReference(lTimeExpr, lOut)
      val rTime = BindReferences.bindReference(rTimeExpr, rOut)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(allOut, allOut)

      new Iterator[InternalRow] {
        // one-row lookahead on the right; rows are engine-reused, so
        // anything retained across next() is copied
        private var rHead: InternalRow = _
        private def peekRight(): InternalRow = {
          if (rHead == null && rIter.hasNext) rHead = rIter.next()
          rHead
        }
        private var lastMatch: InternalRow = _ // copied right row
        private var curKey: InternalRow = _    // copied left key

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          // SQL equi-join semantics: a null key never matches (the
          // natural ordering would treat NULL == NULL and pair
          // null-keyed rows, which no equi-join oracle produces).
          // Null-keyed left rows sort first, so emitting without
          // touching the right cursor is safe.
          if (lk.anyNull) {
            joined(l, nullRight)
            return outProj(joined)
          }
          if (curKey == null || keyOrd.compare(curKey, lk) != 0) {
            curKey = lk.copy()
            lastMatch = null
          }
          val ltv = lTime.eval(l)
          if (ltv == null) { // null time: nothing is "at or before" it
            joined(l, nullRight)
            return outProj(joined)
          }
          val lt = ltv.asInstanceOf[Long]
          var advancing = true
          while (advancing) {
            val r = peekRight()
            if (r == null) advancing = false
            else {
              val rk = rKeyProj(r)
              val c = if (rk.anyNull) -1 else keyOrd.compare(rk, curKey)
              if (c < 0) rHead = null // right key behind every future left
              else if (c == 0) {
                val rtv = rTime.eval(r)
                if (rtv != null && rtv.asInstanceOf[Long] <= lt) {
                  lastMatch = r.copy()
                  rHead = null
                } else if (rtv == null) {
                  rHead = null // null right time can never satisfy <=
                } else advancing = false
              } else advancing = false
            }
          }
          joined(l, if (lastMatch != null) lastMatch else nullRight)
          outProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Filter pushdown through the custom operator — the optimization a
  * custom LogicalPlan silently loses: Catalyst cannot know that
  * predicates over the PROBE side commute with an as-of join, so a
  * `filter` applied above one would otherwise run after the shuffle
  * and merge. Left-only conjuncts are semantics-preserving to push
  * (each left row's match is unaffected by dropping other left rows);
  * right-side predicates are NOT (they would change which row is
  * "last at-or-before", like pushing into the null-producing side of
  * an outer join) and stay put.
  */
object AsofJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoinPlan) =>
      // Only deterministic conjuncts may move (and be reordered past
      // their siblings) — same guard as Catalyst's own pushdown rules.
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p =>
          p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(leftOnly.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftSparkExtensions` registration. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    e.injectOptimizerRule(_ => AsofJoinFilterPushdown)
  }
}

object AsofJoin {

  /** Install the strategy + pushdown rule into a live session
    * (idempotent).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
    }
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(AsofJoinFilterPushdown)) {
      spark.experimental.extraOptimizations = opts :+ AsofJoinFilterPushdown
    }
  }

  /** `left ASOF JOIN right`: every left row picks the last right row of
    * the same key with `rightTime <= leftTime` (right columns null when
    * none). Time columns MUST be LongType (cast timestamps to epoch
    * micros upstream) — enforced here, because the merge unboxes with
    * `asInstanceOf[Long]` and an int/date column would otherwise throw
    * deep inside a task. Null keys and null times never match,
    * mirroring SQL equi-join semantics.
    */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lp = GraftPlanBridge.planOf(left)
    val rp = GraftPlanBridge.planOf(right)
    def attr(p: LogicalPlan, n: String) = p.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    def timeAttr(p: LogicalPlan, n: String) = {
      val a = attr(p, n)
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of time column $n must be LongType (epoch micros), got ${a.dataType}")
      a
    }
    GraftPlanBridge.ofRows(spark, AsofJoinPlan(
      lp, rp,
      Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
      timeAttr(lp, leftTime), timeAttr(rp, rightTime)))
  }
}
