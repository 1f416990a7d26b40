package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import Nlp._

/** Corpus-vocabulary operators: global token statistics and per-document
  * keyword extraction — the "what is in this corpus" pass before tokenizer
  * training / mixture design.
  *
  * Scale shapes: one explode + one hash aggregation on the token (uniform
  * key, partial-agg friendly: per-partition combine collapses each
  * partition to its distinct tokens before the shuffle). The global top-k
  * goes through `orderBy(...).limit(k)` = TakeOrderedAndProject — parallel
  * per-partition top-k, never a single-task global sort. Keyword ranking
  * windows partition by doc_id (uniform), never globally.
  */
object VocabOps {

  private def norm(docs: DataFrame, idCol: String, textCol: String) =
    Nlp.normDocs(docs, idCol, textCol)

  // ======================= public operator API =======================

  /** Global top-k vocabulary by total occurrence count (ties broken by
    * token). Output: (token, n_occurrences, n_docs).
    */
  def vocabulary(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 100): DataFrame =
    norm(docs, idCol, textCol)
      .select(col("doc_id"), explode(expr(toksExpr)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)

  /** Per-document keywords by log-free TF-IDF: score = tf / df (document
    * frequency), which orders identically to tf·(N/df) for a fixed corpus
    * and keeps the score an exact IEEE division both engines compute
    * bit-identically (ln() carries no cross-engine exactness guarantee —
    * deliberately avoided). Top `k` tokens per doc, ties by token.
    * Output: (doc_id, rank, token, tf, df, score).
    *
    * SKEW NOTE (100 TB): the tf⋈df join keys on the token, and a stopword
    * key carries one (doc, token) row per containing doc — a genuinely hot
    * key at web scale. The guard is the same df-cap pattern as
    * `DedupOps.ngramJaccard`: stopword-class tokens (df above a cap) can be
    * pre-dropped via a broadcast anti-join before the tf⋈df shuffle — they
    * can never be keywords, since their score tf/df is dominated by any
    * rarer token's. Not applied here because the gate corpus has a
    * 31-token vocabulary; apply the cap when wiring a real corpus.
    */
  def tfidfKeywords(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3): DataFrame = {
    val tf = norm(docs, idCol, textCol)
      .select(col("doc_id"), explode(expr(toksExpr)).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(df, "token")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
  }

  /** Shared Spark/DuckDB BM25 term-score expression: the Okapi BM25 form
    * with the log dropped from the IDF — `(N − df + 0.5)/(df + 0.5)` is a
    * strictly monotone transform of the standard `ln(1 + (N−df+0.5)/(df+0.5))`,
    * so document ranking is preserved while every operation stays an exact
    * IEEE double (ln() carries no cross-engine bit-exactness guarantee —
    * same policy as [[tfidfKeywords]]). Every operand is explicitly cast to
    * double so both engines evaluate the identical float expression tree.
    */
  private def bm25TermExpr(k1: Double, b: Double): String =
    s"((cast(n_docs as double) - cast(df as double) + 0.5) / (cast(df as double) + 0.5))" +
      s" * (cast(tf as double) * cast(${k1 + 1} as double))" +
      s" / (cast(tf as double) + cast($k1 as double) * (1 - cast($b as double)" +
      s" + cast($b as double) * cast(dl as double)" +
      s" / (cast(sum_dl as double) / cast(n_docs as double))))"

  /** BM25 document ranking for a fixed bag of query terms — the retrieval
    * scorer over a corpus (quality-filter / contamination-triage companion).
    *
    * Scale shape: NO corpus-sized shuffle anywhere. Non-matching tokens are
    * filtered BEFORE the tf aggregation, so the only token shuffle carries
    * query-term hits; doc length is `size(tokens)` (map-only, no shuffle —
    * identical to sum(tf) by definition); the corpus-stats frame partial-aggs
    * to one row per partition; df collapses to |terms| rows and both small
    * sides BROADCAST into the score map. Final top-k is
    * TakeOrderedAndProject (per-partition top-k), never a global sort.
    *
    * Determinism: the per-document score is a sum of per-term doubles, and
    * float addition does not commute — so terms are folded in SORTED token
    * order from init 0.0 (`aggregate(sort_array(...))`), which the oracle
    * mirrors with `list_reduce(list_prepend(0.0, list(ts ORDER BY token)))`.
    * Output: (doc_id, n_terms, score), score DESC, doc_id tiebreak, top k.
    */
  def bm25Rank(docs: DataFrame, terms: Seq[String], idCol: String = "doc_id",
      textCol: String = "text", k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "bm25Rank needs at least one query term")
    val dl = norm(docs, idCol, textCol)
      .select(col("doc_id"), size(expr(toksExpr)).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val qtf = norm(docs, idCol, textCol)
      .select(col("doc_id"), explode(expr(toksExpr)).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = qtf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    qtf.join(broadcast(dfreq), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("ts", expr(bm25TermExpr(k1, b)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sort_array(collect_list(struct(col("token"), col("ts")))).as("xs"))
      .withColumn("score",
        expr("aggregate(xs, cast(0 as double), (acc, x) -> acc + x.ts)"))
      .select(col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  // ==================== driver-checked bindings ======================

  private val VocabK = 50

  private val qVocab = GraftQuery(
    "qt_vocab",
    (s, dir) => vocabulary(Tables.documents(s, dir), k = VocabK),
    Some(s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents)
    SELECT token, COUNT(*) AS n_occurrences,
      COUNT(DISTINCT doc_id) AS n_docs
    FROM t GROUP BY token
    ORDER BY n_occurrences DESC, token LIMIT $VocabK"""))

  private val qKeywords = GraftQuery(
    "qt_keywords",
    (s, dir) => tfidfKeywords(Tables.documents(s, dir))
      .orderBy(col("doc_id"), col("rank")),
    Some(s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
      CAST(tf.tf AS DOUBLE) / df.df AS score,
      ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.token) AS rank
      FROM tf JOIN df ON tf.token = df.token)
    SELECT doc_id, rank, token, tf, df, score FROM sc WHERE rank <= 3
    ORDER BY doc_id, rank"""))

  // Edit distance between consecutive docs' 40-char prefixes: a bounded-
  // cost keyed 1:1 self-join (uniform doc_id+1 key) exercising levenshtein
  // — the string-similarity builtin the dedup tier's candidate verify
  // would use for short fields (never on full docs: O(len²) per pair).
  private val qEditDist = GraftQuery(
    "qt_edit_distance",
    (s, dir) => {
      val d = norm(Tables.documents(s, dir), "doc_id", "text")
      val a = d.select(col("doc_id"), substring(col("text"), 1, 40).as("s1"))
      val b = d.select((col("doc_id") - 1).as("doc_id"),
        substring(col("text"), 1, 40).as("s2"))
      a.join(b, "doc_id")
        .select(col("doc_id"), levenshtein(col("s1"), col("s2")).as("lev_prefix40"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT a.doc_id,
      levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS lev_prefix40
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ORDER BY a.doc_id"""))

  private val Bm25Terms = Seq("spark", "query", "dup")

  private val qBm25 = GraftQuery(
    "qt_bm25",
    (s, dir) => bm25Rank(Tables.documents(s, dir), Bm25Terms),
    Some(s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
    dlt AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl FROM documents),
    st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dlt),
    qt AS (SELECT doc_id, token, COUNT(*) AS tf FROM t
      WHERE token IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
      GROUP BY doc_id, token),
    dfx AS (SELECT token, COUNT(*) AS df FROM qt GROUP BY token),
    sc AS (SELECT qt.doc_id, qt.token, ${bm25TermExpr(1.2, 0.75)} AS ts
      FROM qt JOIN dfx USING (token) JOIN dlt USING (doc_id) CROSS JOIN st),
    ag AS (SELECT doc_id, COUNT(*) AS n_terms,
      list_reduce(list_prepend(CAST(0 AS DOUBLE), list(ts ORDER BY token)),
        (a, b) -> a + b) AS score
      FROM sc GROUP BY doc_id)
    SELECT doc_id, n_terms, score FROM ag ORDER BY score DESC, doc_id LIMIT 10"""))

  def queries: Seq[GraftQuery] = Seq(qVocab, qKeywords, qEditDist, qBm25)
}
