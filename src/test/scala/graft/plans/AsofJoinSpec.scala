package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native as-of join operator: semantics (vs the composable
  * union-window shape and hand-computed fixtures), null-key/time handling,
  * multi-key support, and the physical plan shape (AsofJoin exec + one
  * exchange per side, no window, no BNL).
  */
class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("matches hand-computed backward as-of semantics incl. ties and no-match") {
    import spark.implicits._
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:05"), 1L),
      ("A", ts("2024-01-01 10:00:10"), 2L),
      ("B", ts("2024-01-01 10:00:01"), 3L), // before any B quote -> null
      ("C", ts("2024-01-01 10:00:30"), 4L)  // key with no quotes at all
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:05"), 2.0), // equal time counts (<=)
      ("A", ts("2024-01-01 10:00:07"), 3.0),
      ("B", ts("2024-01-01 10:00:02"), 4.0)
    ).toDF("q_sym", "q_t", "px")

    val got = AsofOps.asofJoin(trades, quotes, Seq("sym"), Seq("q_sym"), "t", "q_t")
      .select($"trade_id", $"px")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(1L -> Some(2.0), 2L -> Some(3.0), 3L -> None, 4L -> None))
  }

  test("agrees with the union-window composition on the events table") {
    import spark.implicits._
    val ev = graft.analytics.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))

    val native = AsofOps.asofJoin(
        purchases, clicks, Seq("user_id"), Seq("c_user"), "ts", "c_ts")
      .select($"user_id", $"event_id", $"ts", $"c_ts".as("click_ts"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = ev
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("click_ts", max(when($"event_type" === "click", $"ts")).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"click_ts")

    assert(native.count() === purchases.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("null keys and null times never match") {
    import spark.implicits._
    val l = Seq(
      (Option("k"), Option(10L), 1),
      (Option.empty[String], Option(10L), 2),  // null key
      (Option("k"), Option.empty[Long], 3)     // null time
    ).toDF("k", "t", "id")
    val r = Seq(
      (Option("k"), Option(5L), "hit"),
      (Option.empty[String], Option(1L), "null-key-right"),
      (Option("k"), Option.empty[Long], "null-time-right")
    ).toDF("rk", "rt", "tag")
    val got = AsofOps.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"id", $"tag").collect()
      .map(x => (x.getInt(0), Option(x.getString(1)))).toMap
    assert(got === Map(1 -> Some("hit"), 2 -> None, 3 -> None))
  }

  test("multi-column keys join on the full key") {
    import spark.implicits._
    val l = Seq(("a", 1, 10L, "L1"), ("a", 2, 10L, "L2")).toDF("k1", "k2", "t", "lid")
    val r = Seq(("a", 1, 5L, "R11"), ("a", 2, 7L, "R21"), ("b", 1, 1L, "RX"))
      .toDF("rk1", "rk2", "rt", "rid")
    val got = AsofOps.asofJoin(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select($"lid", $"rid").as[(String, String)].collect().toMap
    assert(got === Map("L1" -> "R11", "L2" -> "R21"))
  }

  test("plan is the native exec: no Window, no BNL, shuffle per side") {
    import spark.implicits._
    val ev = graft.analytics.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
    val plan = AsofOps.asofJoin(
        purchases, clicks, Seq("user_id"), Seq("c_user"), "ts", "c_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected the native exec in:\n$plan")
    assert(!plan.contains("Window"), "native as-of must not plan a window")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Exchange hashpartitioning"),
      "expected hash exchanges from the declared ClusteredDistribution")
    assert(plan.contains("Sort ["), "expected (key, time) sorts on both sides")
    // EXACTLY one exchange + one sort per child: the declared
    // requiredChildDistribution/Ordering must not double-plan under AQE
    // or future Spark upgrades — the operator's scale shape IS this count
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    val nSort = "Sort \\[".r.findAllIn(plan).size
    assert(nEx == 2, s"expected exactly 2 exchanges (one per side), got $nEx:\n$plan")
    assert(nSort == 2, s"expected exactly 2 sorts (one per side), got $nSort:\n$plan")
  }

  test("disjoint-name and key-arity contracts are enforced") {
    import spark.implicits._
    val l = Seq((1, 2L)).toDF("k", "t")
    val r = Seq((1, 2L)).toDF("k", "rt")
    intercept[IllegalArgumentException] {
      AsofOps.asofJoin(l, r, Seq("k"), Seq("k"), "t", "rt")
    }
    val r2 = Seq((1, 2L)).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      AsofOps.asofJoin(l, r2, Seq.empty, Seq.empty, "t", "rt")
    }
  }
}
