package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.GraftQuery
import graft.analytics._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator claimed in SURVEY.md §2 / the analytics plane surfaces
  * here as a named query; `oracleSql` carries the DuckDB-equivalent SQL for
  * the hash-match correctness gate.
  */
object SparkEntry {

  /** Full registry; modules own their query definitions. */
  def registry: Seq[GraftQuery] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      Windows.queries ++ EventsQueries.queries ++
      TextOps.queries ++ CurationOps.queries ++ MixOps.queries ++
      VocabOps.queries ++
      DedupOps.queries ++
      SimilarityOps.queries ++ MultimodalOps.queries ++ ProfileOps.queries ++
      SkewOps.queries ++ GraphOps.queries ++ MatchOps.queries ++
      StatTests.queries ++ SketchOps.queries ++
      LayoutOps.queries ++
      CdcOps.queries ++ LearnOps.queries ++ EvalOps.queries ++
      PairOps.queries ++ RoutingQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
