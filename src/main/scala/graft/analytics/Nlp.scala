package graft.analytics

/** Shared Spark-SQL / DuckDB expression pairs for the text/dedup operators.
  * Every helper has a `*Sql` twin that must stay semantically identical —
  * the correctness gate hash-compares the two engines' outputs.
  *
  * All of these are row-local (map-only, no shuffle), so they scale
  * linearly and stay inside whole-stage codegen.
  */
object Nlp {
  /** Whitespace tokens, empties dropped. Spark lambdas index arrays 0-based,
    * DuckDB 1-based — mind the twins.
    */
  val toksExpr = "filter(split(text, '\\\\s+'), x -> x != '')"
  val toksSql = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"

  /** Word 3-gram shingles (distinct), guarded for <3-token docs. */
  def shingles(toks: String): String =
    s"CASE WHEN size($toks) >= 3 THEN array_distinct(transform(sequence(0, size($toks) - 3), " +
      s"i -> concat($toks[i], ' ', $toks[i+1], ' ', $toks[i+2]))) ELSE array('') END"
  def shinglesSql(toks: String): String =
    s"CASE WHEN len($toks) >= 3 THEN list_distinct(list_transform(generate_series(1, len($toks) - 2), " +
      s"i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2])) ELSE [''] END"

  /** Deterministic 60-bit hash of a string via md5 prefix — the one hash
    * function both engines can compute identically.
    */
  def h60(s: String): String = s"cast(conv(substring(md5($s), 1, 15), 16, 10) as bigint)"
  def h60Sql(s: String): String = s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"
}
