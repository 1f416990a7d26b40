package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md §B).
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical layouts across driver rounds:
    * parquet TIMESTAMP(NANOS) (which Spark's reader rejects — read nanos as
    * raw longs via the legacy conf and rebuild a µs timestamp) and plain
    * TIMESTAMP(MICROS) (isAdjustedToUTC=false → Spark reads TIMESTAMP_NTZ).
    * Adapt on the observed schema so both load to the same session-zone
    * TimestampType column; the session zone is pinned to UTC everywhere, so
    * the NTZ→LTZ cast preserves the wall clock DuckDB sees.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→LTZ ts cast below is wall-clock-preserving ONLY in UTC;
    // Verify/Bench/Explain pin it, but pin here too so every entry point
    // (tests, user code) reads the same instants DuckDB sees.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(s, d, "events")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000"))
      case _ =>
        org.apache.spark.sql.functions.col("ts").cast("timestamp")
    }
    raw.withColumn("ts", tsCol)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
