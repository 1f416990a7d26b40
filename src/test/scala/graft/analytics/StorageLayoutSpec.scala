package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout features the 100 TB design leans on: partitioned
  * layouts with partition pruning, bucketed tables giving co-located
  * (shuffle-free) joins, and the CSV/JSON source formats. Driven against
  * the sf0.001 test tables.
  */
class StorageLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("partitioned parquet layout prunes partitions at scan time") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pushed to the scan:\n$plan")
    // pruned scan reads only the lang=en directory
    val full = spark.read.parquet(dir).count()
    val en = filtered.count()
    assert(en > 0 && en < full)
  }

  test("bucketed tables join without a shuffle on the bucketed key") {
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.customer(spark, sf)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    // disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("CSV and JSON sources round-trip the documents table") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val csvDir = Files.createTempDirectory("graft-csv").toString
    val jsonDir = Files.createTempDirectory("graft-json").toString
    base.write.mode("overwrite").option("header", "true").csv(csvDir)
    base.write.mode("overwrite").json(jsonDir)

    val fromCsv = spark.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, n_chars INT").csv(csvDir)
    val fromJson = spark.read.schema("doc_id LONG, lang STRING, n_chars INT").json(jsonDir)
    assert(fromCsv.count() == base.count())
    assert(fromJson.count() == base.count())
    // exact content equality, not just counts
    assert(fromCsv.exceptAll(base).isEmpty && base.exceptAll(fromCsv).isEmpty)
    assert(fromJson.exceptAll(base).isEmpty && base.exceptAll(fromJson).isEmpty)
  }

  test("ORC source round-trips with predicate pushdown and column pruning") {
    val base = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val orcDir = Files.createTempDirectory("graft-orc").toString
    base.write.mode("overwrite").orc(orcDir)

    val fromOrc = spark.read.orc(orcDir)
    assert(fromOrc.count() == base.count())
    assert(fromOrc.exceptAll(base).isEmpty && base.exceptAll(fromOrc).isEmpty)
    // filter reaches the ORC scan; projection prunes to the 2 used columns
    val q = fromOrc.filter(col("doc_id") < 100).select("doc_id", "lang")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      s"ORC scan did not push the filter:\n$scan")
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"ORC scan did not prune columns:\n$scan")
  }

  test("schema evolution: mergeSchema unifies files written with added columns") {
    import spark.implicits._
    // a 100 TB lake accretes columns over time; old files must stay readable
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("batch", "id", "v1", "v2"))
    val rows = merged.select("id", "v2").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // the pre-evolution file surfaces NULL for the later column
    assert(rows == Map(1L -> None, 2L -> Some(9.5)), s"got $rows")
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val dir = Files.createTempDirectory("graft-dyn").toString
      Seq((1L, "en"), (2L, "fr")).toDF("id", "lang")
        .write.partitionBy("lang").mode("overwrite").parquet(dir)
      // overwrite ONLY lang=en; the fr partition must survive (static mode
      // would wipe the whole table root)
      Seq((10L, "en")).toDF("id", "lang")
        .write.partitionBy("lang").mode("overwrite").parquet(dir)
      val rows = spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((10L, "en"), (2L, "fr")), s"got $rows")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("z-order layout bounds BOTH key columns' span per output file") {
    val dir = Files.createTempDirectory("graft-z").toString
    val li = Tables.lineitem(spark, sf).select(col("l_partkey"), col("l_suppkey"))
    LayoutOps.zorderLayout(li, "l_partkey", "l_suppkey", numFiles = 16)
      .write.mode("overwrite").parquet(dir)
    val global = li.agg(
      (max("l_partkey") - min("l_partkey")).as("ra"),
      (max("l_suppkey") - min("l_suppkey")).as("rb")).head()
    val (ra, rb) = (global.getLong(0).toDouble, global.getLong(1).toDouble)
    // Per-file min/max — what a parquet footer records and a reader prunes
    // on. A Z-laid-out file covers a bounded rectangle in BOTH dimensions,
    // where a single-column sort leaves the other dimension at ~full span.
    // The bound is statistical, not universal: a file straddling one of
    // the curve's diagonal jumps (e.g. Morton block 0111 → 1000) spans
    // nearly a full dimension, so assert that at least 3/4 of the files
    // are quarter-ish rectangles (≤ 0.6 of range after boundary-sampling
    // slack) on BOTH columns.
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("l_partkey") - min("l_partkey")).as("sa"),
        (max("l_suppkey") - min("l_suppkey")).as("sb"))
      .collect()
    assert(spans.length > 4, s"expected many files, got ${spans.length}")
    val bounded = spans.count(r => r.getLong(1) <= 0.6 * ra && r.getLong(2) <= 0.6 * rb)
    assert(bounded >= spans.length * 3 / 4,
      s"only $bounded/${spans.length} files are span-bounded: " +
        spans.map(r => (r.getLong(1), r.getLong(2))).mkString(", "))
  }

  test("ivfLayout: probe-set reads only the probed cells' partition files") {
    val dir = Files.createTempDirectory("graft-ivf").toString
    LayoutOps.ivfLayout(Tables.embeddings(spark, sf), dir)
    val back = spark.read.parquet(dir)
    val nCells = back.select("cell").distinct().count()
    assert(nCells > 2, s"expected several cells, got $nCells")
    val probed = back.filter(col("cell").isin(1, 2))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell filter not pushed as a partition filter:\n$plan")
    // the probe physically opens only the probed cells' files
    val filesRead = probed.select(input_file_name()).distinct().count()
    val filesTotal = back.select(input_file_name()).distinct().count()
    assert(filesRead < filesTotal,
      s"probe read all $filesTotal files — partition pruning inert")
    // and rows survive the round-trip: cell-partition sum equals corpus
    assert(back.count() == Tables.embeddings(spark, sf).count())
  }
}
