package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `size(array_intersect(a, b))` without materializing the intersection:
  * the verification step of every bucketed dedup join (ngram-Jaccard,
  * MinHash-LSH) computes ONLY the intersection cardinality, but
  * `array_intersect` allocates the deduplicated intersection array per pair
  * first. This native expression counts directly — one hash set build per
  * pair, zero output allocation — with semantics IDENTICAL to the composed
  * form: count of DISTINCT elements of `a` also present in `b`, a null
  * element counted once when both sides contain null, null result if either
  * input is null.
  *
  * Installed two ways: explicitly via [[GraftFunctions.graft_intersect_count]],
  * and transparently by [[RewriteIntersectCount]] — an optimizer
  * `Rule[LogicalPlan]` (injected through [[GraftExtensions]]) that rewrites
  * the composed pattern for non-floating atomic element types (int, long,
  * string — floats excluded so NaN/-0.0 equality corners stay with the
  * built-in), so ANY user query written the composable way gets the
  * allocation-free plan.
  */
case class IntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_count"

  @transient private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val et = ctx.addReferenceObj("etIc", elemType, classOf[DataType].getName)
      s"${ev.value} = graft.functions.IntersectCount.count($a, $b, $et);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object IntersectCount {
  /** Distinct-intersection cardinality; boxed set membership (Long/Integer/
    * UTF8String all hash/equal correctly boxed). Called from generated code.
    */
  def count(l: ArrayData, r: ArrayData, et: DataType): Int = {
    val rset = new java.util.HashSet[Any]()
    var rHasNull = false
    var i = 0
    val nr = r.numElements()
    while (i < nr) {
      if (r.isNullAt(i)) rHasNull = true else rset.add(r.get(i, et))
      i += 1
    }
    val counted = new java.util.HashSet[Any]()
    var cnt = 0
    var nullCounted = false
    val nl = l.numElements()
    i = 0
    while (i < nl) {
      if (l.isNullAt(i)) {
        if (rHasNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else {
        val v = l.get(i, et)
        if (rset.contains(v) && counted.add(v)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  /** Element types where the rewrite is provably result-identical. */
  def rewriteSafe(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType | LongType | StringType, _) => true
    case _ => false
  }
}

/** Intersection cardinality of two SORTED-DISTINCT ARRAY<BIGINT> columns by
  * primitive merge-scan: no hash set, no boxing, no allocation per pair —
  * the hot verify kernel for every shingle-hash dedup join, whose inputs
  * ([[ShingleHashes]] / `shingleTable`) are sorted distinct by
  * construction.
  *
  * PRECONDITION (caller-guaranteed, like [[DotProduct]]'s equal-dims
  * contract): both arrays ascending-sorted with distinct non-null
  * elements. Under that contract the result is IDENTICAL to
  * `size(array_intersect(a, b))`; on unsorted input the merge undercounts,
  * so this is an explicit library call site kernel, never installed by the
  * [[RewriteIntersectCount]] rule (the rule can't prove sortedness).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  /** Linear merge over primitive longs; called from generated code. */
  def count(l: ArrayData, r: ArrayData): Int = {
    val nl = l.numElements()
    val nr = r.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < nl && j < nr) {
      val a = l.getLong(i)
      val b = r.getLong(j)
      if (a == b) { cnt += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    cnt
  }
}

/** Optimizer rule: `Size(ArrayIntersect(a, b), legacySizeOfNull = false)` →
  * [[IntersectCount]] for int/long/string element arrays. Strictly
  * semantics-preserving (same distinct/null contract, same null-out
  * behavior); the legacy `size(null) = -1` mode is left untouched.
  */
object RewriteIntersectCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), false) if IntersectCount.rewriteSafe(a.dataType) =>
      IntersectCount(a, b)
  }
}
