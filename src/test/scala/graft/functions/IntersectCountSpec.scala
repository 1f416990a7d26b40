package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** IntersectCount must be RESULT-IDENTICAL to size(array_intersect(a, b))
  * — including distinct semantics, null elements, and null inputs — and
  * the injected optimizer rule must fire on the composed pattern.
  */
class IntersectCountSpec extends AnyFunSuite with BeforeAndAfterAll {

  // built WITH the extensions, like a deployed session
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("IntersectCount == size(array_intersect) on random long arrays with dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      (Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong),
        Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      GraftFunctions.graft_intersect_count(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("slow")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("IntersectCount handles null elements and null inputs like the composed form") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, null, 2L, null), Seq[java.lang.Long](null, 3L, 1L)),
      (Seq[java.lang.Long](null), Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](), Seq[java.lang.Long](1L, null)),
      (null, Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](1L), null)
    ).toDF("a", "b")
    val got = df.select(
      GraftFunctions.graft_intersect_count(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("slow")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r)
      if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1), r)
    }
  }

  test("string arrays: distinct-count semantics match") {
    import spark.implicits._
    val df = Seq(
      (Seq("x", "y", "x", "z"), Seq("x", "x", "q", "z")),
      (Seq("a"), Seq("b"))
    ).toDF("a", "b")
    val got = df.select(
      GraftFunctions.graft_intersect_count(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("slow")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("SortedIntersectCount == size(array_intersect) on sorted-distinct long arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { _ =>
      (Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted,
        Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(5L), Seq(5L)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      GraftFunctions.graft_sorted_intersect_count(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("slow")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("optimizer rule rewrites composed size(array_intersect(...)) to the native count") {
    // parquet-backed input so constant folding can't collapse the plan
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("ic_docs")
    val q = spark.sql(
      """SELECT size(array_intersect(split(text, ' '), split(lang, ' '))) AS n
        FROM ic_docs""")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_intersect_count"), opt)
    assert(q.count() > 0)
    // float arrays are NOT rewritten (NaN/-0.0 corners stay built-in)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("ic_emb")
    val fq = spark.sql(
      "SELECT size(array_intersect(embedding, embedding)) AS n FROM ic_emb")
    assert(!fq.queryExecution.optimizedPlan.toString.contains("graft_intersect_count"))
  }
}
