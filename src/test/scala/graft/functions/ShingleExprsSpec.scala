package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Nlp._

/** The native shingle kernel and prefix Generator must agree EXACTLY with
  * the SQL-composed forms they replace — that equivalence is what keeps the
  * DuckDB oracle matching for qd_ngram_jaccard / qd_minhash_lsh.
  */
class ShingleExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // the composed chain ShingleHashes replaces (text → toks → 3-gram
  // shingles → h60 → distinct → sort)
  private val composedHs =
    s"sort_array(array_distinct(transform(${shingles(toksExpr)}, t -> ${h60("t")})))"

  private def sampleDf = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",                       // < 3 tokens → empty-shingle sentinel
      "",                          // empty text
      "   leading and trailing   ",
      "tab\tand\nnewline separated tokens here",
      "rep rep rep rep rep",       // duplicate shingles collapse
      "unicode héllo wörld ünïcode tokens",
      "x y z",                     // exactly 3 tokens → one shingle
      "one two three four five six seven eight nine ten"
    ).toDF("text")
  }

  test("ShingleHashes == composed tokenize/shingle/h60/distinct/sort chain") {
    val got = sampleDf.select(
      GraftFunctions.graft_shingle_hashes(col("text"), 3).as("fast"),
      expr(composedHs).as("slow")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch on row $r")
    }
  }

  test("ShingleHashes matches composed chain on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        GraftFunctions.graft_shingle_hashes(col("text"), 3).as("fast"),
        expr(composedHs).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.isEmpty)
  }

  test("ShinglePrefixGen == explode(slice(...)) prefix postings") {
    val hs = sampleDf.select(
      monotonically_increasing_id().as("id"),
      GraftFunctions.graft_shingle_hashes(col("text"), 3).as("hs"))
    val t = 0.8
    val viaGen = hs.select(col("id"),
        GraftFunctions.graft_prefix_explode(col("hs"), t).as("ph"))
      .groupBy(col("id")).agg(sort_array(collect_list(col("ph"))).as("phs"))
    val viaExplode = hs.select(col("id"),
        explode(expr(s"slice(hs, 1, size(hs) - cast(floor($t * size(hs)) as int) + 1)")).as("ph"))
      .groupBy(col("id")).agg(sort_array(collect_list(col("ph"))).as("phs"))
    val joined = viaGen.as("g").join(viaExplode.as("e"), "id")
      .filter(col("g.phs") =!= col("e.phs"))
    assert(joined.isEmpty)
    // generator emits in array order (prefix order), not just as a set
    val ordered = hs.select(col("hs"),
        GraftFunctions.graft_prefix_explode(col("hs"), t).as("ph")).collect()
    assert(ordered.nonEmpty)
  }

  test("SpanHashGen == composed slide/hash chain; stride and short-doc contract") {
    import spark.implicits._
    val df = Seq(
      "a b c d e f g",       // 7 tokens
      "a b",                 // < w tokens → no spans
      "  x  y   z  w  ",     // whitespace runs
      "a b c d e f g"        // duplicate doc → duplicate spans
    ).toDF("text").withColumn("id", monotonically_increasing_id())
    val w = 3
    // composed equivalent: positions 0..n-w, hash of space-joined slice
    val composed = df.select(col("id"),
        expr(s"filter(split(text, '\\\\s+'), x -> x != '')").as("toks"))
      .select(col("id"), explode(expr(
        s"CASE WHEN size(toks) >= $w THEN transform(sequence(0, size(toks) - $w), " +
          s"i -> struct(i as pos, ${graft.analytics.Nlp.h60(s"array_join(slice(toks, i + 1, $w), ' ')")} as h)) " +
          "ELSE array() END")).as("s"))
      .select(col("id"), col("s.pos"), col("s.h"))
    val viaGen = df.select(col("id"),
      GraftFunctions.graft_span_hashes(col("text"), w, 1).as(Seq("pos", "h")))
    assert(viaGen.except(composed).isEmpty && composed.except(viaGen).isEmpty,
      s"gen=${viaGen.collect().toSeq} composed=${composed.collect().toSeq}")
    // stride 2 keeps positions 0, 2, 4...
    val strided = df.filter(col("id") === 0)
      .select(GraftFunctions.graft_span_hashes(col("text"), w, 2).as(Seq("pos", "h")))
      .select("pos").as[Int].collect().sorted
    assert(strided.toSeq == Seq(0, 2, 4))
    // short doc emits nothing
    val short = df.filter(col("id") === 1)
      .select(GraftFunctions.graft_span_hashes(col("text"), w, 1).as(Seq("pos", "h")))
    assert(short.isEmpty)
  }

  test("SQL surface: both functions registered and usable from spark.sql") {
    GraftFunctions.register(spark)
    sampleDf.createOrReplaceTempView("shingle_docs")
    val viaSql = spark.sql(
      """SELECT ph, count(*) AS c
        FROM (SELECT graft_prefix_explode(graft_shingle_hashes(text, 3), 0.8) AS ph
              FROM shingle_docs)
        GROUP BY ph ORDER BY ph""").collect()
    assert(viaSql.nonEmpty)
    // int literal threshold also folds
    val one = spark.sql(
      "SELECT graft_prefix_explode(graft_shingle_hashes('a b c d', 3), 1) AS ph").collect()
    assert(one.length == 1) // size 2, t=1 → prefix length 2-2+1 = 1
    // span generator: two output columns straight from SQL
    val spans = spark.sql("SELECT graft_span_hashes('a b c d', 3, 1)").collect()
    assert(spans.length == 2 && spans.map(_.getInt(0)).toSeq == Seq(0, 1))
  }

  test("plan: ShingleHashes projection stays inside whole-stage codegen; Generate node present") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(col("doc_id"),
        GraftFunctions.graft_prefix_explode(
          GraftFunctions.graft_shingle_hashes(col("text"), 3), 0.8).as("ph"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Generate graft_prefix_explode"), plan)
    // the hash-array projection compiles (no codegen fallback for
    // ShingleHashes): a WholeStageCodegen span exists and contains the call
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val proj = docs.select(GraftFunctions.graft_shingle_hashes(col("text"), 3).as("hs"))
    val spans = proj.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w }
    assert(spans.exists(_.toString.contains("graft_shingle_hashes")),
      proj.queryExecution.executedPlan.toString)
  }
}
