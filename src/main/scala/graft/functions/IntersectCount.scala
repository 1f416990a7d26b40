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

/** Clipped character-n-gram match count of two STRINGS — the chrF /
  * ROUGE-char numerator Σ_g min(count_l(g), count_r(g)) computed
  * directly on the code-point windows in ONE native pass: no gram
  * arrays, no sorts, no higher-order functions. The first r10 chrF cut
  * exploded grams through a grouped-count join (10 s at sf0.1); the
  * second built per-row gram arrays with interpreted HOF lambdas
  * (8 s — HOF evaluation cost, not data); this kernel makes the metric
  * scan-priced. Windows count CODE POINTS (Spark `substring` / DuckDB
  * `substr` semantics), so the oracle's explode-and-join formulation
  * derives the same integers independently.
  */
case class CharGramClipped(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_chargram_clipped"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING inputs and n >= 1, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}, n=$n")

  override def nullSafeEval(a: Any, b: Any): Any =
    CharGramClipped.count(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CharGramClipped.count($a, $b, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CharGramClipped {
  /** Shared by interpreted eval and generated code. */
  def count(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String, n: Int): Int = {
    val s = a.toString
    val t = b.toString
    // code-point index maps (surrogate-aware window boundaries)
    def cpStarts(x: String): Array[Int] = {
      val out = new Array[Int](x.codePointCount(0, x.length) + 1)
      var i = 0; var j = 0
      while (i < x.length) {
        out(j) = i; j += 1; i = x.offsetByCodePoints(i, 1)
      }
      out(j) = x.length
      out
    }
    val ps = cpStarts(s)
    val pt = cpStarts(t)
    val ns = ps.length - 1 - (n - 1)
    val nt = pt.length - 1 - (n - 1)
    if (ns <= 0 || nt <= 0) return 0
    val m = new java.util.HashMap[String, Integer](ns * 2)
    var i = 0
    while (i < ns) {
      val g = s.substring(ps(i), ps(i + n))
      val c = m.get(g)
      m.put(g, if (c == null) 1 else c + 1)
      i += 1
    }
    var cnt = 0
    i = 0
    while (i < nt) {
      val g = t.substring(pt(i), pt(i + n))
      val c = m.get(g)
      if (c != null && c > 0) { cnt += 1; m.put(g, c - 1) }
      i += 1
    }
    cnt
  }
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
