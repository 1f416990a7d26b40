package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator Catalyst extension (SURVEY §2.2 tier (c)): a native
  * backward as-of join — for each left row, the single most recent right row
  * with equal keys and `rightTime <= leftTime` (LEFT OUTER: unmatched left
  * rows keep nulls on the right).
  *
  * Spark has no ASOF JOIN; the composable workaround (union both sides +
  * running conditional `max` over a per-key window, `Relational3.qAsof`)
  * shuffles left+right TOGETHER and carries every right column through the
  * window as a conditional struct. This operator is the plan you'd actually
  * want on a cluster: each side shuffles once on its own keys (Exchange
  * inserted by EnsureRequirements from the declared ClusteredDistribution),
  * each side sorts on (keys, time), and a single forward merge pass per
  * partition emits the matches — no window state, no union, and the right
  * side never re-sorts per left row. Scale shape: identical to a sort-merge
  * join (the gold standard for large-large equi-joins) plus an O(1) pointer
  * per partition.
  *
  * Semantics pinned by AsofJoinSpec: null keys/timestamps never match
  * (SQL join semantics); ties on rightTime resolve to the last row in
  * (keys, time) sort order, which is value-irrelevant when callers select
  * only the time column (the deterministic contract mirrored by the DuckDB
  * `ASOF LEFT JOIN` oracle).
  */
final case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] onto [[AsofJoinExec]]; injected via
  * `GraftExtensions` (cluster deployment) and auto-registered on
  * `spark.experimental.extraStrategies` by [[AsofOps.asofJoin]] (plain
  * sessions).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: requires children clustered on their keys
  * and sorted on (keys, time) — EnsureRequirements inserts the exchanges and
  * sorts — then merges each co-partition pair in one forward pass.
  */
final case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi-key and equal key arity")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def sortSpec(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    (keys :+ time).map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(sortSpec(leftKeys, leftTime), sortSpec(rightKeys, rightTime))

  // the merge is left-driven and order-preserving within each partition
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortSpec(leftKeys, leftTime)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // local copies: the partition closure must not capture `this` (SparkPlan
    // nodes aren't meant to ship to executors)
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOutput = left.output; val rOutput = right.output
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // input schema must be the NULLABLE-adjusted output: the right slots
      // of an unmatched row are null, and a non-nullable BoundReference
      // would read garbage zeros instead of null-checking
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOutput.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // buffered right head (rows with null key/time are dropped — they
        // can never match) plus the last right row whose (key, time) was
        // <= the current left cursor
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadTime: InternalRow = _
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val t = rTimeProj(r)
            if (!k.anyNull && !t.anyNull) {
              rHead = r.copy(); rHeadKey = k.copy(); rHeadTime = t.copy()
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l).copy()
          val lt = lTimeProj(l).copy()
          val comparable = !lk.anyNull && !lt.anyNull
          if (comparable) {
            var scanning = rHead != null
            while (scanning) {
              val c = keyOrd.compare(rHeadKey, lk)
              if (c < 0 || (c == 0 && timeOrd.compare(rHeadTime, lt) <= 0)) {
                if (c == 0) { matched = rHead; matchedKey = rHeadKey }
                advanceRight()
                scanning = rHead != null
              } else scanning = false
            }
          }
          val rightSide =
            if (comparable && matched != null && keyOrd.compare(matchedKey, lk) == 0) matched
            else nullRight
          numOutputRows += 1
          resultProj(joined(l, rightSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public DataFrame API for the native as-of join. */
object AsofOps {
  /** Backward as-of LEFT OUTER join: every `left` row, plus the most recent
    * `right` row with equal keys and `right` time at-or-before the `left`
    * time (nulls when none). Column names of the two sides must be disjoint
    * (rename on the way in — same contract as DuckDB/pandas `merge_asof`).
    *
    * The right side is re-aliased with fresh attribute ids, so self-joins
    * (both inputs derived from the same source) work without ambiguity.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    require(leftOn.nonEmpty && leftOn.length == rightOn.length,
      "leftOn/rightOn must be non-empty and of equal length")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"asofJoin sides must have disjoint column names; rename: $overlap")

    val spark = left.sparkSession
    // plain-session fallback; GraftExtensions injects the same strategy for
    // spark.sql.extensions deployments. Strategy is an object → idempotent.
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }

    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right so a self-join can't alias attributes
    val rAliases = right.queryExecution.analyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    val rOut = rAliases.map(_.toAttribute)

    def resolve(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in [${out.map(_.name).mkString(", ")}]"))

    val lk = leftOn.map(resolve(lPlan.output, _))
    val rk = rightOn.map(resolve(rOut, _))
    val lt = resolve(lPlan.output, leftTimeCol)
    val rt = resolve(rOut, rightTimeCol)
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}")
    }
    require(lt.dataType == rt.dataType,
      s"time type mismatch: ${lt.dataType} vs ${rt.dataType}")
    require(RowOrdering.isOrderable(lt.dataType),
      s"time type ${lt.dataType} is not orderable")

    GraftSqlShim.ofRows(spark, AsofJoinPlan(lPlan, rPlan, lk, rk, lt, rt))
  }
}
