package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Memory contract of the triangle-blocked exact pair join
  * (`DedupOps.embeddingNearDup`): the scaladoc claims per-task build
  * memory is n/B vectors and that results are invariant in B. This suite
  * pins both under a deliberately SMALL execution-memory budget
  * (`spark.testing.memory`, the hook Spark's own tests use): with the
  * whole corpus far larger than one task's budget the job must still
  * complete — block-bounded build sides plus spillable join machinery —
  * and every choice of B must produce the identical pair set (each
  * unordered pair lands in exactly one ordered block pair).
  *
  * Runs in its own suite because the constrained memory config is
  * per-SparkContext.
  */
class BlockJoinMemorySpec extends AnyFunSuite with BeforeAndAfterAll {

  // spark.testing drops the 300 MB reserved floor (Spark's own test
  // hook), so 128 MB "system" memory → usable execution+storage =
  // 0.6·128 ≈ 77 MB shared across 4 cores, ~19 MB per task.
  private val TestingMemory = (128L * 1024 * 1024).toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.testing", "true")
    .config("spark.testing.memory", TestingMemory)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // 3,000 deterministic pseudo-random int vectors (dim 8) + planted
  // exact duplicates so the expected output is non-empty at θ close to 1
  private def vecs = {
    import spark.implicits._
    spark.range(0, 3000).toDF("vec_id")
      .withColumn("embedding", expr(
        """transform(sequence(0, 7), i ->
           CAST(pmod(vec_id * 31 + i * 7 + pmod(vec_id * i, 13), 17) - 8 AS DOUBLE))"""))
      .withColumn("embedding", when(col("vec_id") === 2100L,
          expr("transform(sequence(0, 7), i -> CAST(pmod(100 * 31 + i * 7 + pmod(100 * i, 13), 17) - 8 AS DOUBLE))"))
        .otherwise(col("embedding")))
  }

  test("constrained-memory run completes and results are invariant in B") {
    // sanity: the constrained-memory config actually took (a leaked
    // session from another suite would silently reuse a roomy context)
    assert(spark.sparkContext.getConf.get("spark.testing.memory") == TestingMemory,
      "SparkContext was reused without the constrained-memory config")
    val v = vecs.cache()
    def run(b: Int): Seq[(Long, Long)] =
      DedupOps.embeddingNearDup(v, threshold = 0.995, blocks = b)
        .select(col("v1"), col("v2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // B = 1 is the trivially-exhaustive baseline (one block pair, every
    // pair compared under vec_id order exactly once)
    val baseline = run(1)
    assert(baseline.contains((100L, 2100L)),
      s"planted duplicate pair missing from baseline: ${baseline.take(20)}")
    // invariance: coarse, prime, and fine blockings all reproduce it
    for (b <- Seq(5, 16, 97))
      assert(run(b) == baseline, s"pair set changed at B=$b")
  }

  test("the pair plan is block-bucketed hash/merge joins, never cartesian") {
    val plan = DedupOps.embeddingNearDup(vecs, threshold = 0.995, blocks = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), s"BNLJ in plan:\n$plan")
  }
}
