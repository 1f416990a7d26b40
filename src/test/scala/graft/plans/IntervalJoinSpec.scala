package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native point-in-interval join: semantics (vs the equivalent
  * join+filter composition and hand-computed fixtures incl. closed
  * bounds, nested/overlapping intervals, multi-match fan-out),
  * null handling, randomized equivalence, and the physical plan shape
  * (IntervalJoin exec + one exchange per side, no BNL).
  */
class IntervalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hand-computed semantics: closed bounds, nested intervals, multi-match, no-match") {
    import spark.implicits._
    val points = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L), // == start of w1 (closed)
      ("A", ts("2024-01-01 10:00:05"), 2L), // inside w1 AND nested w2
      ("A", ts("2024-01-01 10:00:10"), 3L), // == end of w1, outside w2
      ("A", ts("2024-01-01 10:00:20"), 4L), // outside everything
      ("B", ts("2024-01-01 10:00:05"), 5L)  // key with no intervals
    ).toDF("k", "t", "pid")
    val intervals = Seq(
      ("A", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:10"), 10L), // w1
      ("A", ts("2024-01-01 10:00:04"), ts("2024-01-01 10:00:06"), 20L)  // w2 nested
    ).toDF("wk", "ws", "we", "wid")

    val got = IntervalOps.intervalJoin(points, intervals,
        Seq("k"), Seq("wk"), "t", "ws", "we")
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 10L)))
  }

  test("agrees with the join+filter composition on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 400).map { i =>
      (s"k${rnd.nextInt(5)}", ts(f"2024-01-01 10:00:${rnd.nextInt(60)}%02d"), i.toLong)
    }.toDF("k", "t", "pid")
    val intervals = (1 to 120).map { i =>
      val s0 = rnd.nextInt(55)
      (s"k${rnd.nextInt(5)}", ts(f"2024-01-01 10:00:$s0%02d"),
        ts(f"2024-01-01 10:00:${math.min(59, s0 + rnd.nextInt(10))}%02d"), i.toLong)
    }.toDF("wk", "ws", "we", "wid")
    val native = IntervalOps.intervalJoin(points, intervals,
        Seq("k"), Seq("wk"), "t", "ws", "we")
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val composed = points.join(intervals,
        $"k" === $"wk" && $"t" >= $"ws" && $"t" <= $"we")
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === composed,
      s"native minus composed: ${native -- composed}; composed minus native: ${composed -- native}")
  }

  test("null keys, times, and bounds never match") {
    import spark.implicits._
    val points = Seq(
      (Some("A"), Some(ts("2024-01-01 10:00:05")), 1L),
      (None: Option[String], Some(ts("2024-01-01 10:00:05")), 2L),
      (Some("A"), None: Option[Timestamp], 3L)
    ).toDF("k", "t", "pid")
    val intervals = Seq(
      (Some("A"), Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 10:00:10")), 10L),
      (Some("A"), None: Option[Timestamp], Some(ts("2024-01-01 10:00:10")), 20L),
      (None: Option[String], Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 10:00:10")), 30L)
    ).toDF("wk", "ws", "we", "wid")
    val got = IntervalOps.intervalJoin(points, intervals,
        Seq("k"), Seq("wk"), "t", "ws", "we")
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("plan is the native exec: no BNL, one shuffle per side") {
    import spark.implicits._
    val points = Seq(("A", ts("2024-01-01 10:00:05"), 1L)).toDF("k", "t", "pid")
    val intervals = Seq(("A", ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:00:10"), 10L)).toDF("wk", "ws", "we", "wid")
    val plan = IntervalOps.intervalJoin(points, intervals,
        Seq("k"), Seq("wk"), "t", "ws", "we")
      .queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fell back to all-pairs:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2,
      s"expected exactly one exchange per side:\n$plan")
  }

  test("disjoint-name and arity contracts are enforced") {
    import spark.implicits._
    val a = Seq(("A", 1L)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      IntervalOps.intervalJoin(a, a, Seq("k"), Seq("k"), "x", "x", "x")
    }
  }
}
