package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator Catalyst extension (SURVEY §2.2 tier (c)), sibling of
  * [[AsofJoinPlan]]: a native point-in-interval INNER join — every left
  * (keys, t) row paired with EVERY right (keys, [start, end]) row whose
  * closed interval contains t.
  *
  * Spark plans `a.key = b.key AND t BETWEEN start AND end` as a hash join
  * on the key with the range as a post-join filter — correct, but every
  * co-keyed pair materializes through the join before the range prunes
  * it (quadratic in per-key row count). This operator is the plan a
  * time-series store uses: each side exchanges once on its own keys,
  * sorts on (keys, t) / (keys, start), and a single forward merge pass
  * per partition maintains the ACTIVE interval set — intervals whose
  * start has passed, pruned as their end falls behind t. Work is
  * O(left + right + matches); memory is the maximum number of
  * simultaneously open intervals per key, the quantity that is small by
  * construction in validity-interval data (SCD2 windows, sessions,
  * maintenance windows).
  *
  * Semantics pinned by IntervalJoinSpec: bounds are CLOSED on both ends;
  * null key/time/bound rows never match (SQL join semantics); INNER —
  * pointless left rows drop. Emission order is left-major (keys, t),
  * with a left row's matches in right (keys, start) order.
  */
final case class IntervalJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightStart: Expression,
    rightEnd: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinPlan]] onto [[IntervalJoinExec]]; injected via
  * `GraftExtensions` and auto-registered by [[IntervalOps.intervalJoin]].
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, lt, rs, re) =>
      IntervalJoinExec(lk, rk, lt, rs, re, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical point-in-interval join: children clustered on their keys and
  * sorted on (keys, t) / (keys, start) — EnsureRequirements inserts the
  * exchanges and sorts — then one forward merge per co-partition with an
  * active-interval buffer.
  */
final case class IntervalJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "interval join needs at least one equi-key and equal key arity")

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightStart).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rStart = rightStart; val rEnd = rightEnd
    val lOutput = left.output; val rOutput = right.output
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rStartProj = UnsafeProjection.create(Seq(rStart), rOutput)
      val rEndProj = UnsafeProjection.create(Seq(rEnd), rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // buffered right head (null key/start/end rows dropped — they can
        // never match)
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadStart: InternalRow = _
        private var rHeadEnd: InternalRow = _
        advanceRight()

        // the ACTIVE set: intervals of `bufKey` whose start <= current
        // left t; entries are pruned once end < t. Size = max concurrently
        // open intervals for one key.
        private var bufKey: InternalRow = _
        private val active = ArrayBuffer.empty[(InternalRow, InternalRow)]

        // matches of the current left row not yet emitted
        private var pendingLeft: InternalRow = _
        private var pendingIdx = 0
        private var pendingEnd = 0

        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val s = rStartProj(r)
            val e = rEndProj(r)
            if (!k.anyNull && !s.anyNull && !e.anyNull) {
              rHead = r.copy(); rHeadKey = k.copy()
              rHeadStart = s.copy(); rHeadEnd = e.copy()
            }
          }
        }

        private def fillPending(): Unit = {
          pendingLeft = null
          while (pendingLeft == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l).copy()
            val lt = lTimeProj(l).copy()
            if (!lk.anyNull && !lt.anyNull) {
              if (bufKey == null || keyOrd.compare(bufKey, lk) != 0) {
                active.clear(); bufKey = lk
              }
              // admit intervals opening at-or-before t (skipping keys that
              // sort before lk — no later left row can match them either)
              var scanning = rHead != null
              while (scanning) {
                val c = keyOrd.compare(rHeadKey, lk)
                if (c < 0) { advanceRight(); scanning = rHead != null }
                else if (c == 0 && timeOrd.compare(rHeadStart, lt) <= 0) {
                  active += ((rHead, rHeadEnd))
                  advanceRight(); scanning = rHead != null
                } else scanning = false
              }
              // retire intervals whose end has passed
              var i = 0
              while (i < active.length) {
                if (timeOrd.compare(active(i)._2, lt) < 0) active.remove(i)
                else i += 1
              }
              if (active.nonEmpty) {
                pendingLeft = l.copy(); pendingIdx = 0; pendingEnd = active.length
              }
            }
          }
        }

        override def hasNext: Boolean = {
          if (pendingLeft == null || pendingIdx >= pendingEnd) fillPending()
          pendingLeft != null && pendingIdx < pendingEnd
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = resultProj(joined(pendingLeft, active(pendingIdx)._1))
          pendingIdx += 1
          numOutputRows += 1
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public DataFrame API for the native interval join. */
object IntervalOps {
  /** Point-in-interval INNER join: every `left` row paired with every
    * `right` row with equal keys and `startCol <= timeCol <= endCol`
    * (closed bounds). Column names of the two sides must be disjoint;
    * the right side is re-aliased with fresh attribute ids so
    * self-derived inputs work without ambiguity.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      timeCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    require(leftOn.nonEmpty && leftOn.length == rightOn.length,
      "leftOn/rightOn must be non-empty and of equal length")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin sides must have disjoint column names; rename: $overlap")

    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    }

    val lPlan = left.queryExecution.analyzed
    val rAliases = right.queryExecution.analyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    val rOut = rAliases.map(_.toAttribute)

    def resolve(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in [${out.map(_.name).mkString(", ")}]"))

    val lk = leftOn.map(resolve(lPlan.output, _))
    val rk = rightOn.map(resolve(rOut, _))
    val lt = resolve(lPlan.output, timeCol)
    val rs = resolve(rOut, startCol)
    val re = resolve(rOut, endCol)
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}")
    }
    require(lt.dataType == rs.dataType && rs.dataType == re.dataType,
      s"time/bound type mismatch: ${lt.dataType} / ${rs.dataType} / ${re.dataType}")
    require(RowOrdering.isOrderable(lt.dataType),
      s"time type ${lt.dataType} is not orderable")

    GraftSqlShim.ofRows(spark,
      IntervalJoinPlan(lPlan, rPlan, lk, rk, lt, rs, re))
  }
}
