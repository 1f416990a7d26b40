package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftQuery

/** Data-profiling operator — the QA pass a training-data pipeline runs
  * before spending GPU-hours: per-column null counts, cardinality, and
  * range, in ONE aggregation job regardless of column count (no per-column
  * scans, no driver loops; the single aggregated row is unpivoted with
  * `stack`, so everything stays in the plan).
  */
object ProfileOps {

  private def orderable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType | BooleanType => true
    case _ => false
  }

  /** Profile every column: (col_name, non_null, nulls, n_distinct, min_s,
    * max_s). `exact=false` (default) uses approx_count_distinct — the right
    * profiler at corpus scale; `exact=true` uses COUNT(DISTINCT) for
    * cross-engine-exact output. min/max surface as strings so
    * heterogeneous columns stack into one frame; non-orderable columns
    * (arrays, maps, binary) report null min/max.
    */
  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val distinct = if (exact) countDistinct(c) else approx_count_distinct(c)
      Seq(
        count(c).as(s"${f.name}__nn"),
        distinct.as(s"${f.name}__nd"),
        (if (orderable(f.dataType)) min(c).cast("string") else lit(null).cast("string"))
          .as(s"${f.name}__min"),
        (if (orderable(f.dataType)) max(c).cast("string") else lit(null).cast("string"))
          .as(s"${f.name}__max"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields.map { f =>
      s"'${f.name}', `${f.name}__nn`, __total - `${f.name}__nn`, " +
        s"`${f.name}__nd`, `${f.name}__min`, `${f.name}__max`"
    }.mkString(", ")
    row.selectExpr(
        s"stack(${fields.length}, $stackArgs) AS (col_name, non_null, nulls, n_distinct, min_s, max_s)")
      .orderBy(col("col_name"))
  }

  // Oracle binding: exact profile of `documents` (integer/string columns
  // only, so min/max string forms agree across engines).
  private val qProfile = GraftQuery(
    "qprof_documents",
    (s, dir) => profile(
      Tables.documents(s, dir).select("doc_id", "lang", "n_chars", "text"),
      exact = true),
    Some("""WITH p AS (
      SELECT 'doc_id' AS col_name, COUNT(doc_id) AS non_null,
        COUNT(*) - COUNT(doc_id) AS nulls, COUNT(DISTINCT doc_id) AS n_distinct,
        CAST(MIN(doc_id) AS VARCHAR) AS min_s, CAST(MAX(doc_id) AS VARCHAR) AS max_s
      FROM documents
      UNION ALL
      SELECT 'lang', COUNT(lang), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
        CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'n_chars', COUNT(n_chars), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
        CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'text', COUNT(text), COUNT(*) - COUNT(text), COUNT(DISTINCT text),
        CAST(MIN(text) AS VARCHAR), CAST(MAX(text) AS VARCHAR) FROM documents)
    SELECT col_name, non_null, nulls, n_distinct, min_s, max_s
    FROM p ORDER BY col_name"""))

  // Second binding on a different shape (events): bigint/varchar columns
  // only — double and timestamp min/max would compare via engine-specific
  // string formatting, which the profile's min_s/max_s casts can't make
  // deterministic.
  private val qProfileEvents = GraftQuery(
    "qprof_events",
    (s, dir) => profile(
      Tables.events(s, dir).select("event_id", "user_id", "event_type"),
      exact = true),
    Some("""WITH p AS (
      SELECT 'event_id' AS col_name, COUNT(event_id) AS non_null,
        COUNT(*) - COUNT(event_id) AS nulls, COUNT(DISTINCT event_id) AS n_distinct,
        CAST(MIN(event_id) AS VARCHAR) AS min_s, CAST(MAX(event_id) AS VARCHAR) AS max_s
      FROM events
      UNION ALL
      SELECT 'user_id', COUNT(user_id), COUNT(*) - COUNT(user_id),
        COUNT(DISTINCT user_id),
        CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR) FROM events
      UNION ALL
      SELECT 'event_type', COUNT(event_type), COUNT(*) - COUNT(event_type),
        COUNT(DISTINCT event_type),
        CAST(MIN(event_type) AS VARCHAR), CAST(MAX(event_type) AS VARCHAR) FROM events)
    SELECT col_name, non_null, nulls, n_distinct, min_s, max_s
    FROM p ORDER BY col_name"""))

  val queries: Seq[GraftQuery] = Seq(qProfile, qProfileEvents)
}
