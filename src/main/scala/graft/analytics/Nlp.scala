package graft.analytics

/** Shared Spark-SQL / DuckDB expression pairs for the text/dedup operators.
  * Every helper has a `*Sql` twin that must stay semantically identical —
  * the correctness gate hash-compares the two engines' outputs.
  *
  * All of these are row-local (map-only, no shuffle), so they scale
  * linearly and stay inside whole-stage codegen.
  */
object Nlp {
  /** Normalize any (idCol, textCol) frame to the internal doc_id/text
    * shape — the one column contract every text operator module shares
    * (each module's private `norm` delegates here).
    */
  def normDocs(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(org.apache.spark.sql.functions.col(idCol).as("doc_id"),
      org.apache.spark.sql.functions.col(textCol).as("text"))

  /** Whitespace tokens, empties dropped. Spark lambdas index arrays 0-based,
    * DuckDB 1-based — mind the twins.
    */
  def toksExprOn(textCol: String): String =
    s"filter(split($textCol, '\\\\s+'), x -> x != '')"
  val toksExpr: String = toksExprOn("text")
  val toksSql = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"

  /** Word 3-gram shingles (distinct), guarded for <3-token docs.
    *
    * PERF: built with zip_with over slices, NOT `toks[i]` indexing inside a
    * lambda — indexed access to a *computed* array re-evaluates the whole
    * array expression per element (lambdas are interpreted, no CSE), which
    * turned tokenization O(tokens²) per row. zip_with receives its operand
    * arrays once per row and walks them natively.
    */
  def shingles(toks: String): String =
    s"CASE WHEN size($toks) >= 3 THEN array_distinct(" +
      s"zip_with(zip_with(slice($toks, 1, size($toks) - 2), slice($toks, 2, size($toks) - 2), " +
      s"(x, y) -> concat(x, ' ', y)), slice($toks, 3, size($toks) - 2), " +
      s"(xy, z) -> concat(xy, ' ', z))) ELSE array('') END"
  /** Adjacent word bigrams, occurrences KEPT (collocation counting needs
    * multiplicity, unlike the distinct dedup shingles). Same zip_with-
    * over-slices discipline as [[shingles]] — no indexed lambda.
    */
  def bigrams(toks: String): String =
    s"CASE WHEN size($toks) >= 2 THEN " +
      s"zip_with(slice($toks, 1, size($toks) - 1), slice($toks, 2, size($toks) - 1), " +
      s"(x, y) -> concat(x, ' ', y)) ELSE CAST(array() AS array<string>) END"

  /** Adjacent word trigrams, occurrences KEPT (frequency-spectrum ops
    * need multiplicity where [[shingles]]' dedup fingerprints must not).
    */
  def trigrams(toks: String): String =
    s"CASE WHEN size($toks) >= 3 THEN " +
      s"zip_with(zip_with(slice($toks, 1, size($toks) - 2), slice($toks, 2, size($toks) - 2), " +
      s"(x, y) -> concat(x, ' ', y)), slice($toks, 3, size($toks) - 2), " +
      s"(xy, z) -> concat(xy, ' ', z)) ELSE CAST(array() AS array<string>) END"

  def trigramsSql(toks: String): String =
    s"CASE WHEN len($toks) >= 3 THEN list_transform(generate_series(1, len($toks) - 2), " +
      s"i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]) ELSE []::VARCHAR[] END"

  def bigramsSql(toks: String): String =
    s"CASE WHEN len($toks) >= 2 THEN list_transform(generate_series(1, len($toks) - 1), " +
      s"i -> $toks[i] || ' ' || $toks[i+1]) ELSE []::VARCHAR[] END"

  def shinglesSql(toks: String): String =
    s"CASE WHEN len($toks) >= 3 THEN list_distinct(list_transform(generate_series(1, len($toks) - 2), " +
      s"i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2])) ELSE [''] END"

  /** Deterministic 60-bit hash of a string via md5 prefix — the one hash
    * function both engines can compute identically.
    */
  def h60(s: String): String = s"cast(conv(substring(md5($s), 1, 15), 16, 10) as bigint)"
  def h60Sql(s: String): String = s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"
}
