package graft.analytics

import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import Nlp._

/** Text-analysis operators — the language-ID / quality / token-statistics
  * / fingerprinting stages of an LLM training-data pipeline — exposed as a
  * column-parameterized public API (any DataFrame with an id + text
  * column) plus the driver-checked query bindings over `documents`. All
  * map-only (no shuffle, NO sort), codegen-friendly, each with a DuckDB
  * oracle — map-only means every function here also composes with
  * `readStream` (see StreamingExtrasSpec's streaming text-pipeline test).
  */
object TextOps {

  private val stopEn = "('the', 'a')"
  private val stopData = "('table', 'row', 'column', 'query')"

  /** Normalize any (idCol, textCol) frame to the internal doc_id/text. */
  private def norm(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String) =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

  // ======================= public operator API =======================

  /** Whitespace-token statistics per doc: count, char mass, avg length. */
  def tokenStats(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame =
    norm(docs, idCol, textCol)
      .withColumn("toks", expr(toksExpr))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        expr("aggregate(toks, 0, (acc, x) -> acc + length(x))").as("tok_chars"),
        (expr("cast(aggregate(toks, 0, (acc, x) -> acc + length(x)) as double)") /
          size(col("toks"))).as("avg_tok_len"))

  /** GPT-2-ish pre-tokenizer count + ceil(len/4) subword estimate. */
  def bpeTokenEstimate(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame =
    norm(docs, idCol, textCol)
      .withColumn("pt", expr(s"regexp_extract_all(text, '$bpePattern', 0)"))
      .select(
        col("doc_id"),
        size(col("pt")).as("n_pretokens"),
        expr("aggregate(pt, 0, (acc, t) -> acc + cast(ceil(length(t) / 4.0) as int))")
          .as("est_bpe_tokens"))

  /** Stopword-vote language heuristic → pred_lang ∈ {en, data}. */
  def langId(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame =
    norm(docs, idCol, textCol)
      .withColumn("toks", expr(toksExpr))
      .withColumn("en_hits", expr(s"size(filter(toks, x -> x IN $stopEn))"))
      .withColumn("data_hits", expr(s"size(filter(toks, x -> x IN $stopData))"))
      .select(
        col("doc_id"), col("en_hits"), col("data_hits"),
        when(col("en_hits") * 3 >= col("data_hits"), lit("en"))
          .otherwise(lit("data")).as("pred_lang"))

  /** Length/uniqueness/stopword-ratio quality composite ∈ [0, 1]. */
  def qualityScore(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame =
    norm(docs, idCol, textCol)
      .withColumn("toks", expr(toksExpr))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("uniq_tokens", expr("size(array_distinct(toks))"))
      .withColumn("stop_hits", expr(s"size(filter(toks, x -> x IN $stopEn))"))
      .withColumn("uniq_ratio", col("uniq_tokens").cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("len_score",
        when(col("n_tokens") >= 20 && col("n_tokens") <= 80, 1.0).otherwise(0.5))
      .withColumn("quality",
        col("len_score") * 0.5 + col("uniq_ratio") * 0.3 + col("stop_ratio") * 0.2)
      .select(col("doc_id"), col("n_tokens"), col("uniq_tokens"), col("uniq_ratio"),
        col("stop_ratio"), col("quality"))

  /** md5 + 60-bit numeric fingerprint of the normalized text. */
  def fingerprint(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame =
    norm(docs, idCol, textCol)
      .withColumn("nrm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .select(
        col("doc_id"),
        md5(col("nrm").cast("binary")).as("fp_md5"),
        expr(h60("nrm")).as("fp60"))

  /** Deterministic train/test split by CONTENT fingerprint, not row id:
    * identical documents always land in the same split, so exact
    * duplicates cannot leak from train into test. bucket ∈ [0, 100),
    * split = "train" iff bucket < trainPct. Map-only, reproducible across
    * runs and engines.
    */
  def trainTestSplit(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      trainPct: Int = 80): org.apache.spark.sql.DataFrame =
    norm(docs, idCol, textCol)
      .withColumn("nrm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("bucket", (expr(h60("nrm")) % 100).cast("int"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < trainPct, lit("train")).otherwise(lit("test")).as("split"))

  // ==================== driver-checked query bindings ====================

  // Token statistics: counts, char mass, deterministic avg token length.
  private val qTokens = GraftQuery(
    "qt_token_stats",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", expr(toksExpr))
        .select(
          col("doc_id"),
          col("n_chars"),
          size(col("toks")).as("n_tokens"),
          expr("aggregate(toks, 0, (acc, x) -> acc + length(x))").as("tok_chars"),
          (expr("cast(aggregate(toks, 0, (acc, x) -> acc + length(x)) as double)") /
            size(col("toks"))).as("avg_tok_len"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, n_chars, $toksSql AS toks FROM documents)
    SELECT doc_id, n_chars, len(toks) AS n_tokens,
      CAST(list_sum(list_transform(toks, x -> length(x))) AS INTEGER) AS tok_chars,
      CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS INTEGER) AS DOUBLE) / len(toks) AS avg_tok_len
    FROM t ORDER BY doc_id"""))

  // BPE-style token counting: a GPT-2-ish pre-tokenizer regex (word /
  // number / punctuation runs, each optionally space-prefixed) plus a
  // subword estimate of ceil(len/4) per pre-token — the standard cheap
  // stand-in for a real BPE vocab when budgeting training tokens. The
  // alternation is first-match-wins in both Java regex and RE2, so the
  // engines tokenize identically. Map-only, codegen'd regexp.
  private val bpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
  private val qBpeTokens = GraftQuery(
    "qt_bpe_tokens",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("pt", expr(s"regexp_extract_all(text, '$bpePattern', 0)"))
        .select(
          col("doc_id"),
          size(col("pt")).as("n_pretokens"),
          expr("aggregate(pt, 0, (acc, t) -> acc + cast(ceil(length(t) / 4.0) as int))")
            .as("est_bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, regexp_extract_all(text, '$bpePattern') AS pt FROM documents)
    SELECT doc_id, len(pt) AS n_pretokens,
      CAST(list_sum(list_transform(pt, t -> CAST(ceil(length(t) / 4.0) AS INTEGER))) AS INTEGER) AS est_bpe_tokens
    FROM t ORDER BY doc_id"""))

  // Heuristic language ID: stopword-count vote with deterministic tiebreak.
  // (The n-gram-profile approach from real lang-ID reduced to the two
  // classes this synthetic vocabulary can express: English function words
  // vs data-domain jargon.)
  private val qLangId = GraftQuery(
    "qt_lang_id",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", expr(toksExpr))
        .withColumn("en_hits", expr(s"size(filter(toks, x -> x IN $stopEn))"))
        .withColumn("data_hits", expr(s"size(filter(toks, x -> x IN $stopData))"))
        .select(
          col("doc_id"), col("lang").as("labeled_lang"),
          col("en_hits"), col("data_hits"),
          when(col("en_hits") * 3 >= col("data_hits"), lit("en"))
            .otherwise(lit("data")).as("pred_lang"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
    h AS (SELECT doc_id, lang,
      len(list_filter(toks, x -> x IN $stopEn)) AS en_hits,
      len(list_filter(toks, x -> x IN $stopData)) AS data_hits
    FROM t)
    SELECT doc_id, lang AS labeled_lang, en_hits, data_hits,
      CASE WHEN en_hits * 3 >= data_hits THEN 'en' ELSE 'data' END AS pred_lang
    FROM h ORDER BY doc_id"""))

  // Quality scoring: length/stopword/uniqueness ratios + a fixed-form
  // composite score. Every double comes from one IEEE division or a fixed
  // left-to-right expression, so it is bit-identical across engines.
  private val qQuality = GraftQuery(
    "qt_quality_score",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", expr(toksExpr))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("uniq_tokens", expr("size(array_distinct(toks))"))
        .withColumn("stop_hits", expr(s"size(filter(toks, x -> x IN $stopEn))"))
        .withColumn("uniq_ratio", col("uniq_tokens").cast("double") / col("n_tokens"))
        .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
        .withColumn("len_score",
          when(col("n_tokens") >= 20 && col("n_tokens") <= 80, 1.0).otherwise(0.5))
        .withColumn("quality",
          col("len_score") * 0.5 + col("uniq_ratio") * 0.3 + col("stop_ratio") * 0.2)
        .select(col("doc_id"), col("n_tokens"), col("uniq_tokens"), col("uniq_ratio"),
          col("stop_ratio"), col("quality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    m AS (SELECT doc_id, len(toks) AS n_tokens,
      len(list_distinct(toks)) AS uniq_tokens,
      len(list_filter(toks, x -> x IN $stopEn)) AS stop_hits FROM t),
    r AS (SELECT doc_id, n_tokens, uniq_tokens,
      CAST(uniq_tokens AS DOUBLE) / n_tokens AS uniq_ratio,
      CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
      CASE WHEN n_tokens >= 20 AND n_tokens <= 80 THEN 1.0 ELSE 0.5 END AS len_score
    FROM m)
    SELECT doc_id, n_tokens, uniq_tokens, uniq_ratio, stop_ratio,
      len_score * 0.5 + uniq_ratio * 0.3 + stop_ratio * 0.2 AS quality
    FROM r ORDER BY doc_id"""))

  // Document fingerprinting: md5 of the whitespace-normalized text plus a
  // 60-bit numeric fingerprint (the join-key form used by exact dedup).
  private val qFingerprint = GraftQuery(
    "qt_fingerprint",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .select(
          col("doc_id"),
          md5(col("norm").cast("binary")).as("fp_md5"),
          expr(h60("norm")).as("fp60"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id,
      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents)
    SELECT doc_id, md5(norm) AS fp_md5, ${h60Sql("norm")} AS fp60
    FROM t ORDER BY doc_id"""))

  /** Language rebalancing: deterministically downsample each language to
    * at most `cap` documents — the data-mix operation that keeps an
    * over-represented language from dominating a training corpus. The
    * kept subset is selected by content-fingerprint order (reproducible
    * across runs/engines, independent of ingestion order), not by random
    * sampling.
    */
  def rebalanceByLang(docs: org.apache.spark.sql.DataFrame, cap: Int,
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("fp60"), col("doc_id"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"), col(langCol).as("lang"))
      .withColumn("nrm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("fp60", expr(h60("nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("lang"), col("rn"))
  }

  private val qRebalance = GraftQuery(
    "qt_lang_rebalance",
    (s, dir) => rebalanceByLang(Tables.documents(s, dir), cap = 100)
      .orderBy(col("lang"), col("rn")),
    Some(s"""WITH t AS (SELECT doc_id, lang,
      ${h60Sql("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")} AS fp60 FROM documents),
    r AS (SELECT doc_id, lang,
      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY fp60, doc_id) AS rn FROM t)
    SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM r WHERE rn <= 100
    ORDER BY lang, rn"""))

  private val qSplit = GraftQuery(
    "qt_train_test_split",
    (s, dir) => trainTestSplit(Tables.documents(s, dir)).orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id,
      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nrm FROM documents)
    SELECT doc_id, CAST(${h60Sql("nrm")} % 100 AS INTEGER) AS bucket,
      CASE WHEN ${h60Sql("nrm")} % 100 < 80 THEN 'train' ELSE 'test' END AS split
    FROM t ORDER BY doc_id"""))

  val queries: Seq[GraftQuery] =
    Seq(qTokens, qBpeTokens, qLangId, qQuality, qFingerprint, qSplit, qRebalance)
}
