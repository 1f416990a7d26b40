package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's query surface.
  *
  * @param name    stable identifier (key in `SparkEntry.queries`)
  * @param run     (spark, sfDir) => result. `sfDir` holds the driver parquet
  *                tables (see TESTDATA.md).
  * @param oracle  equivalent ANSI SQL for DuckDB over the same tables; None
  *                for ops whose semantics aren't SQL-expressible (driver
  *                falls back to a rows-only check).
  * @param headline whether Bench times this query at sf0.1.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = true)
