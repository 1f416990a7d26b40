package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftQuery

/** Entity-resolution operators: approximate string matching over the
  * DISTINCT value domain of a column, the canonical "merge name variants
  * before joining two catalogs" pass.
  *
  * The scale stance is the classic blocking+verify split from the record-
  * linkage literature (token blocking, as in Papadakis et al.'s blocking
  * surveys): never compare all value pairs — generate candidates that
  * share at least one blocking key, then verify only those with the exact
  * (and per-pair expensive) edit-distance predicate. Everything runs on
  * the distinct-name domain, which is orders of magnitude smaller than
  * the row count at corpus scale (names repeat; 100 TB of rows over a
  * bounded entity vocabulary), so the quadratic danger is confined to
  * within-block fan-out — bounded by the `maxTokenDf` skew cap exactly
  * like the df-cap in [[DedupOps.ngramJaccardPairs]].
  */
object MatchOps {

  /** Fuzzy-match the distinct values of `nameCol`: emit every pair of
    * distinct names that (a) share ≥ 1 whitespace token whose name-level
    * document frequency is ≤ `maxTokenDf` (the blocking step — a hash
    * join keyed on token, skew-capped) and (b) verify with
    * `levenshtein ≤ maxDist` (exact integer, codegen'd builtin).
    *
    * Recall contract: a pair sharing NO token (or only capped tokens) is
    * not considered — the standard token-blocking tradeoff, stated
    * honestly (same family as the LSH tiers' probabilistic recall).
    * The `|len(a) − len(b)| ≤ maxDist` prefilter is a pure pruning of
    * the verify (levenshtein is bounded below by the length gap), so it
    * never changes the result, only skips guaranteed-fail pairs.
    *
    * Output: (name_a, name_b, dist, rows_a, rows_b) with name_a < name_b,
    * ordered by (dist, name_a, name_b); rows_* are the source row counts
    * behind each variant (the "which spelling is canonical" signal).
    */
  def fuzzyNameMatch(df: DataFrame, nameCol: String = "name",
      maxDist: Int = 3, maxTokenDf: Int = 1000): DataFrame = {
    require(maxDist >= 0 && maxTokenDf >= 1)
    // distinct-name domain + how many rows each variant backs
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val toks = names
      .select(col("name"), explode(split(col("name"), " ")).as("tok"))
      .distinct()
    // skew cap: a token shared by more than maxTokenDf distinct names is
    // too common to block on (it would create a quadratic bucket)
    val rare = toks.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
      .filter(col("tdf") <= maxTokenDf).select(col("tok"))
    val blocked = toks.join(rare, "tok")
    val cand = blocked.as("a")
      .join(blocked.as("b"),
        col("a.tok") === col("b.tok") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
    cand
      .join(names.select(col("name").as("name_a"), col("n_rows").as("rows_a")), "name_a")
      .join(names.select(col("name").as("name_b"), col("n_rows").as("rows_b")), "name_b")
      .select(col("name_a"), col("name_b"), col("dist"),
        col("rows_a"), col("rows_b"))
      .orderBy(col("dist"), col("name_a"), col("name_b"))
  }

  private val FuzzyMaxDist = 3
  private val FuzzyTokenDf = 1000

  /** The shared distinct-name-domain CTE (`n`). */
  private val nameDomainCte =
    """n AS (SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM part GROUP BY p_name)"""

  /** CTE chain ending in `fzp` — the token-blocked lev-verified pairs;
    * shared by the qj_fuzzy_name oracle and the multi-pass blocking
    * oracle.
    */
  private val fuzzyPairsCtes =
    s"""t AS (SELECT DISTINCT name, tok FROM
      (SELECT name, unnest(string_split(name, ' ')) AS tok FROM n)),
    rare AS (SELECT tok FROM t GROUP BY tok HAVING COUNT(*) <= $FuzzyTokenDf),
    bl AS (SELECT t.name, t.tok FROM t JOIN rare USING (tok)),
    c AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM bl a JOIN bl b ON a.tok = b.tok AND a.name < b.name),
    fzp AS (SELECT c.name_a, c.name_b,
      CAST(levenshtein(c.name_a, c.name_b) AS INT) AS dist,
      na.n_rows AS rows_a, nb.n_rows AS rows_b
    FROM c JOIN n na ON na.name = c.name_a JOIN n nb ON nb.name = c.name_b
    WHERE levenshtein(c.name_a, c.name_b) <= $FuzzyMaxDist)"""

  private val qFuzzy = GraftQuery(
    "qj_fuzzy_name",
    (s, dir) => fuzzyNameMatch(Tables.part(s, dir), nameCol = "p_name",
      maxDist = FuzzyMaxDist, maxTokenDf = FuzzyTokenDf),
    Some(s"""WITH $nameDomainCte,
    $fuzzyPairsCtes
    SELECT name_a, name_b, dist, rows_a, rows_b FROM fzp
    ORDER BY dist, name_a, name_b"""))

  /** Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995) —
    * the OTHER classic ER candidate generator: instead of hashing on a
    * shared token, sort the distinct-name domain by a normalized key and
    * compare only names within a sliding window of `window` positions.
    * Catches transposition-style variants that token blocking misses
    * (no token survives intact) and is the standard second pass in
    * multi-pass blocking systems.
    *
    * Scale shape: the global sort rank is computed WITHOUT a global
    * single-partition window — a two-level scheme ranks within first-
    * character buckets (per-bucket `row_number`, shuffle keyed by
    * bucket) and adds broadcast per-bucket offsets (the bucket-count
    * frame is alphabet-sized, so its cumulative window is a few dozen
    * rows on one partition — the same sanctioned tiny-frame window as
    * the bench loaders). Pair generation is an equi-join on the window
    * BLOCK id (each left row also probes the next block, so a window
    * spanning a block boundary is never missed; a pair lands in exactly
    * one of the two probes) — hash joins only, fan-out bounded by
    * `window`, never O(n²).
    *
    * Output: (name_a, name_b, rank_a, rank_b, dist, rows_a, rows_b) for
    * pairs within the window at `levenshtein <= maxDist`, ordered by
    * (rank_a, rank_b).
    */
  def sortedNeighborhoodPairs(df: DataFrame, nameCol: String = "name",
      window: Int = 4, maxDist: Int = 5): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val keyed = names.withColumn("key",
        trim(regexp_replace(lower(col("name")), "[^a-z0-9]+", " ")))
      .withColumn("bkt", substring(col("key"), 1, 1))
    // first-char buckets order-align with the key sort, so
    // rank = (rows in earlier buckets) + (rank within own bucket)
    val offs = keyed.groupBy(col("bkt")).agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("off"))
    val ranked = keyed.join(broadcast(offs), "bkt")
      .withColumn("rank", col("off") + row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("key"), col("name"))))
      .withColumn("blk", floor((col("rank") - 1) / window))
    val a = ranked.select(col("name").as("name_a"), col("rank").as("rank_a"),
      col("n_rows").as("rows_a"),
      explode(array(col("blk"), col("blk") + 1)).as("jblk"))
    val b = ranked.select(col("name").as("name_b"), col("rank").as("rank_b"),
      col("n_rows").as("rows_b"), col("blk").as("jblk"))
    a.join(b, "jblk")
      .filter(col("rank_b") > col("rank_a") &&
        col("rank_b") - col("rank_a") < window)
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("rank_a"), col("rank_b"),
        col("dist"), col("rows_a"), col("rows_b"))
      .orderBy(col("rank_a"), col("rank_b"))
  }

  private val SnWindow = 4
  private val SnMaxDist = 5

  /** CTE chain ending in `snp` — the sorted-neighborhood verified pairs
    * over part names; requires [[nameDomainCte]] in scope. Shared by the
    * qj_sorted_neighborhood, mutual-best, and multi-pass oracles.
    */
  private val snTailCtes =
    s"""k AS (SELECT name, n_rows,
      trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')) AS key FROM n),
    r AS (SELECT name, n_rows,
      ROW_NUMBER() OVER (ORDER BY key, name) AS rank FROM k),
    p AS (SELECT a.name AS name_a, b.name AS name_b,
        a.rank AS rank_a, b.rank AS rank_b,
        a.n_rows AS rows_a, b.n_rows AS rows_b
      FROM r a JOIN r b ON b.rank > a.rank AND b.rank - a.rank < $SnWindow),
    snp AS (SELECT name_a, name_b, rank_a, rank_b,
      CAST(levenshtein(name_a, name_b) AS INT) AS dist, rows_a, rows_b
    FROM p WHERE levenshtein(name_a, name_b) <= $SnMaxDist)"""

  private val qSortedNb = GraftQuery(
    "qj_sorted_neighborhood",
    (s, dir) => sortedNeighborhoodPairs(Tables.part(s, dir),
      nameCol = "p_name", window = SnWindow, maxDist = SnMaxDist),
    Some(s"""WITH $nameDomainCte,
    $snTailCtes
    SELECT name_a, name_b, rank_a, rank_b, dist, rows_a, rows_b
    FROM snp ORDER BY rank_a, rank_b"""))

  /** One-to-one entity linkage from scored candidate pairs by iterated
    * MUTUAL-best matching — the distributed greedy matching of Preis /
    * "local max" edge matching (also the coarsening matcher in multilevel
    * graph partitioners): each round, every unmatched name points at its
    * best-scoring available partner (lowest `scoreCol`, ties to the
    * lexicographically smaller partner), and a pair is matched when both
    * point at each other; matched names leave the pool. Each round is 2
    * windows + 1 self-join + 2 anti-joins — fully parallel, no
    * sequential greedy scan — and the classic result is that local-max
    * matching reaches a maximal matching in few rounds with at least
    * half the optimal weight.
    *
    * Output: (name_a, name_b, dist, round) with name_a < name_b, one row
    * per matched pair, each name in at most one row, ordered by name_a.
    */
  def mutualBestMatch(pairs: DataFrame, aCol: String = "name_a",
      bCol: String = "name_b", scoreCol: String = "dist",
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // the candidate-pair frame is blocking-bounded (|names|·window rows);
    // checkpoint it once, and re-checkpoint the survivors each round, so
    // round r never re-derives the upstream pair pipeline r times
    var edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"),
        col(scoreCol).as("sc"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v"),
        col(scoreCol).as("sc")))
      .localCheckpoint()
    val wU = Window.partitionBy(col("u")).orderBy(col("sc"), col("v"))
    val matched = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // One materialization per round — the survivor pool. Each round's
    // match frame is re-derivable from the PREVIOUS round's checkpointed
    // pool by one window + one self-join, so materializing it too would
    // double the per-round job count for no lineage benefit (r8: the job
    // constant, not data volume, dominated this loop at bench scale).
    // The final round's pool is dead after the loop and never built.
    for (r <- 1 to rounds) {
      val best = edges.withColumn("rk", row_number().over(wU))
        .filter(col("rk") === 1).select(col("u"), col("v"), col("sc"))
      val m = best.as("x").join(best.as("y"),
          col("x.u") === col("y.v") && col("x.v") === col("y.u"))
        .filter(col("x.u") < col("x.v"))
        .select(col("x.u").as("name_a"), col("x.v").as("name_b"),
          col("x.sc").as("dist"), lit(r).as("round"))
      matched += m
      if (r < rounds) {
        val nodes = m.select(col("name_a").as("nm"))
          .union(m.select(col("name_b").as("nm")))
        edges = edges
          .join(nodes.select(col("nm").as("u")), Seq("u"), "left_anti")
          .join(nodes.select(col("nm").as("v")), Seq("v"), "left_anti")
          .select(col("u"), col("v"), col("sc"))
          .localCheckpoint()
      }
    }
    matched.reduce(_ union _).orderBy(col("name_a"))
  }

  private val MbmRounds = 3

  private val mbmSql = {
    val roundCtes = (1 to MbmRounds).map { r =>
      s"""b$r AS (SELECT u, v, sc FROM (
        SELECT u, v, sc, ROW_NUMBER() OVER (PARTITION BY u ORDER BY sc, v) AS rk
        FROM eg${r - 1}) WHERE rk = 1),
    m$r AS (SELECT x.u AS name_a, x.v AS name_b, x.sc AS dist, $r AS round
      FROM b$r x JOIN b$r y ON x.u = y.v AND x.v = y.u WHERE x.u < x.v),
    mn$r AS (SELECT name_a AS nm FROM m$r UNION ALL SELECT name_b FROM m$r),
    eg$r AS (SELECT * FROM eg${r - 1}
      WHERE u NOT IN (SELECT nm FROM mn$r) AND v NOT IN (SELECT nm FROM mn$r))"""
    }
    val allM = (1 to MbmRounds)
      .map(r => s"SELECT name_a, name_b, dist, round FROM m$r")
      .mkString(" UNION ALL ")
    s"""WITH $nameDomainCte,
    $snTailCtes,
    eg0 AS (SELECT name_a AS u, name_b AS v, dist AS sc FROM snp
      UNION ALL SELECT name_b, name_a, dist FROM snp),
    ${roundCtes.mkString(",\n    ")}
    SELECT name_a, name_b, dist, CAST(round AS INT) AS round
    FROM ($allM) ORDER BY name_a"""
  }

  private val qMutualBest = GraftQuery(
    "qj_mutual_best_match",
    (s, dir) => mutualBestMatch(
      sortedNeighborhoodPairs(Tables.part(s, dir), nameCol = "p_name",
        window = SnWindow, maxDist = SnMaxDist),
      rounds = MbmRounds),
    Some(mbmSql))

  /** Multi-pass blocking — the standard ER methodology (run SEVERAL
    * cheap candidate generators and union them, since each blocking
    * scheme has a known blind spot): token blocking misses pairs where
    * no token survives intact, sorted-neighborhood misses pairs whose
    * normalized keys sort far apart. Emits the union of verified pairs
    * with per-pass provenance flags — the instrument for judging whether
    * another pass is still adding recall. Pairs are orientation-
    * normalized (name_a < name_b) before the full-outer merge so the
    * two generators' different emission orders can't split a pair.
    *
    * Output: (name_a, name_b, dist, in_token_block, in_sorted_nb),
    * ordered by (name_a, name_b).
    */
  def multiPassBlocking(df: DataFrame, nameCol: String = "name",
      window: Int = 4, snMaxDist: Int = 5,
      tokenMaxDist: Int = 3, maxTokenDf: Int = 1000): DataFrame = {
    def normalized(pairs: DataFrame) = pairs.select(
      least(col("name_a"), col("name_b")).as("name_a"),
      greatest(col("name_a"), col("name_b")).as("name_b"),
      col("dist"))
    val tok = normalized(fuzzyNameMatch(df, nameCol, tokenMaxDist, maxTokenDf))
      .withColumn("in_token_block", lit(true))
    val sn = normalized(sortedNeighborhoodPairs(df, nameCol, window, snMaxDist))
      .withColumn("in_sorted_nb", lit(true))
    tok.join(sn.withColumnRenamed("dist", "sn_dist"),
        Seq("name_a", "name_b"), "full_outer")
      .select(col("name_a"), col("name_b"),
        coalesce(col("dist"), col("sn_dist")).as("dist"),
        coalesce(col("in_token_block"), lit(false)).as("in_token_block"),
        coalesce(col("in_sorted_nb"), lit(false)).as("in_sorted_nb"))
      .orderBy(col("name_a"), col("name_b"))
  }

  private val qMultiPass = GraftQuery(
    "qj_multipass_blocking",
    (s, dir) => multiPassBlocking(Tables.part(s, dir), nameCol = "p_name",
      window = SnWindow, snMaxDist = SnMaxDist,
      tokenMaxDist = FuzzyMaxDist, maxTokenDf = FuzzyTokenDf),
    Some(s"""WITH $nameDomainCte,
    $fuzzyPairsCtes,
    $snTailCtes,
    tkn AS (SELECT LEAST(name_a, name_b) AS name_a,
        GREATEST(name_a, name_b) AS name_b, dist FROM fzp),
    snn AS (SELECT LEAST(name_a, name_b) AS name_a,
        GREATEST(name_a, name_b) AS name_b, dist AS sn_dist FROM snp)
    SELECT COALESCE(t.name_a, s2.name_a) AS name_a,
      COALESCE(t.name_b, s2.name_b) AS name_b,
      COALESCE(t.dist, s2.sn_dist) AS dist,
      t.name_a IS NOT NULL AS in_token_block,
      s2.name_a IS NOT NULL AS in_sorted_nb
    FROM tkn t FULL OUTER JOIN snn s2
      ON t.name_a = s2.name_a AND t.name_b = s2.name_b
    ORDER BY name_a, name_b"""))

  // ------------------------------------- phonetic blocking
  /** Phonetic-class blocking key — the third classic ER candidate
    * generator next to token blocking and sorted-neighborhood: names that
    * SOUND alike land in one bucket even when no token survives intact
    * and the sort order separates them (e.g. leading-vowel typos).
    * Deliberately a SIMPLIFIED soundex-family key, not Knuth's soundex:
    * first letter + first 3 consonant-class digits (b f p v→1,
    * c g j k q s x z→2, d t→3, l→4, m n→5, r→6; vowels and h w y
    * dropped BEFORE run-collapse) — Knuth's h/w-bridging and
    * vowel-separation rules are exactly the edge cases engines implement
    * differently, and a blocking key only needs consistency, not
    * dictionary fidelity. Run-collapse is per-digit replaces (RE2 in the
    * oracle has no backreferences). The key expression is generated from
    * ONE Scala builder for both engines.
    *
    * Same scale/skew contract as [[fuzzyNameMatch]]: distinct-name
    * domain, keys backing more than `maxKeyDf` names are dropped (the
    * quadratic-bucket guard, mirrored in-oracle), one equi-join on the
    * key, length-gap prefilter, exact levenshtein verify.
    * Output: (key, name_a, name_b, dist, rows_a, rows_b).
    */
  def phoneticBlocking(df: DataFrame, nameCol: String = "name",
      maxDist: Int = 4, maxKeyDf: Int = 500): DataFrame = {
    require(maxDist >= 0 && maxKeyDf >= 1)
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val keyed = names.withColumn("key", expr(phoneticKeyExpr("name", spark = true)))
    val keep = keyed.groupBy(col("key")).agg(count(lit(1)).as("kdf"))
      .filter(col("kdf") <= maxKeyDf).select(col("key"))
    val blocked = keyed.join(keep, "key")
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.key") === col("b.key") && col("a.name") < col("b.name"))
      .select(col("a.key").as("key"), col("a.name").as("name_a"),
        col("b.name").as("name_b"),
        col("a.n_rows").as("rows_a"), col("b.n_rows").as("rows_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("key"), col("name_a"), col("name_b"), col("dist"),
        col("rows_a"), col("rows_b"))
      .orderBy(col("key"), col("name_a"), col("name_b"))
  }

  /** One builder, two dialects: Spark's regexp_replace is global by
    * default, DuckDB needs the 'g' flag; everything else is shared text.
    */
  private def phoneticKeyExpr(c: String, spark: Boolean): String = {
    val g = if (spark) "" else ", 'g'"
    def rr(s: String, re: String, to: String) =
      s"regexp_replace($s, '$re', '$to'$g)"
    val letters = rr(s"lower($c)", "[^a-z]", "")
    val mapped = rr(
      s"translate(substring($letters, 2), 'bfpvcgjkqsxzdtlmnr', '111122222222334556')",
      "[aeiouhwy]", "")
    val collapsed = (1 to 6).foldLeft(mapped)((acc, d) => rr(acc, s"$d{2,}", s"$d"))
    s"concat(substring($letters, 1, 1), substring($collapsed, 1, 3))"
  }

  private val PhMaxDist = 4
  private val PhKeyDf = 500

  private val qPhonetic = GraftQuery(
    "qj_phonetic_blocking",
    (s, dir) => phoneticBlocking(Tables.part(s, dir), nameCol = "p_name",
      maxDist = PhMaxDist, maxKeyDf = PhKeyDf),
    Some(s"""WITH $nameDomainCte,
    k AS (SELECT name, n_rows, ${phoneticKeyExpr("name", spark = false)} AS key FROM n),
    keep AS (SELECT key FROM k GROUP BY key HAVING COUNT(*) <= $PhKeyDf),
    bl AS (SELECT k.* FROM k JOIN keep USING (key)),
    c AS (SELECT a.key, a.name AS name_a, b.name AS name_b,
        a.n_rows AS rows_a, b.n_rows AS rows_b
      FROM bl a JOIN bl b ON a.key = b.key AND a.name < b.name
      WHERE abs(length(a.name) - length(b.name)) <= $PhMaxDist)
    SELECT key, name_a, name_b,
      CAST(levenshtein(name_a, name_b) AS INT) AS dist, rows_a, rows_b
    FROM c WHERE levenshtein(name_a, name_b) <= $PhMaxDist
    ORDER BY key, name_a, name_b"""))

  // ------------------------------------- Damerau verify (typo metric)
  /** Token-blocked pairs verified with UNRESTRICTED Damerau–Levenshtein
    * (the [[graft.functions.DamerauLevenshtein]] native expression) next
    * to plain levenshtein — the typo-aware verify step: a transposition
    * ("the" → "teh") costs 1 under DL but 2 under levenshtein, so a DL
    * threshold admits transposition-heavy variants a levenshtein
    * threshold at the same budget rejects. `gain = lev − dl ≥ 0` is the
    * per-pair evidence (how much of the distance was transpositions).
    *
    * Same blocking/skew contract as [[fuzzyNameMatch]] (shared rare-token
    * equi-join, length-gap prefilter — valid for DL too: every DL edit
    * changes length by ≤ 1 and transpositions by 0). The verify is the
    * admission predicate `dl <= maxDist`, so pairs whose levenshtein
    * EXCEEDS maxDist still surface when transpositions close the gap.
    * Output: (name_a, name_b, dl, lev, gain, rows_a, rows_b) ordered by
    * (dl, name_a, name_b). Oracle twin: DuckDB `damerau_levenshtein`
    * (also the full Lowrance–Wagner variant — semantics pinned against
    * each other in StringExprsSpec).
    */
  def damerauNameMatch(df: DataFrame, nameCol: String = "name",
      maxDist: Int = 3, maxTokenDf: Int = 1000): DataFrame = {
    require(maxDist >= 0 && maxTokenDf >= 1)
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val toks = names
      .select(col("name"), explode(split(col("name"), " ")).as("tok"))
      .distinct()
    val rare = toks.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
      .filter(col("tdf") <= maxTokenDf).select(col("tok"))
    val blocked = toks.join(rare, "tok")
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.tok") === col("b.tok") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dl", graft.functions.GraftFunctions.graft_damerau(
        col("name_a"), col("name_b")))
      .filter(col("dl") <= maxDist)
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
      .withColumn("gain", col("lev") - col("dl"))
      .join(names.select(col("name").as("name_a"), col("n_rows").as("rows_a")), "name_a")
      .join(names.select(col("name").as("name_b"), col("n_rows").as("rows_b")), "name_b")
      .select(col("name_a"), col("name_b"), col("dl"), col("lev"),
        col("gain"), col("rows_a"), col("rows_b"))
      .orderBy(col("dl"), col("name_a"), col("name_b"))
  }

  private val qDamerau = GraftQuery(
    "qj_damerau_typo",
    (s, dir) => damerauNameMatch(Tables.part(s, dir), nameCol = "p_name",
      maxDist = FuzzyMaxDist, maxTokenDf = FuzzyTokenDf),
    Some(s"""WITH $nameDomainCte,
    t AS (SELECT DISTINCT name, tok FROM
      (SELECT name, unnest(string_split(name, ' ')) AS tok FROM n)),
    rare AS (SELECT tok FROM t GROUP BY tok HAVING COUNT(*) <= $FuzzyTokenDf),
    bl AS (SELECT t.name, t.tok FROM t JOIN rare USING (tok)),
    c AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM bl a JOIN bl b ON a.tok = b.tok AND a.name < b.name
      WHERE abs(length(a.name) - length(b.name)) <= $FuzzyMaxDist),
    v AS (SELECT name_a, name_b,
        CAST(damerau_levenshtein(name_a, name_b) AS INT) AS dl,
        CAST(levenshtein(name_a, name_b) AS INT) AS lev
      FROM c WHERE damerau_levenshtein(name_a, name_b) <= $FuzzyMaxDist)
    SELECT v.name_a, v.name_b, v.dl, v.lev, v.lev - v.dl AS gain,
      na.n_rows AS rows_a, nb.n_rows AS rows_b
    FROM v JOIN n na ON na.name = v.name_a JOIN n nb ON nb.name = v.name_b
    ORDER BY v.dl, v.name_a, v.name_b"""))

  // ------------------------------------- Fellegi–Sunter weights
  /** Fellegi–Sunter probabilistic record linkage (JASA 1969) — the
    * statistical scoring layer ABOVE the candidate generators: for each
    * blocked record pair, compare a vector of fields, and score the pair
    * by the likelihood ratio Π_f m_f/u_f (agreeing fields) ×
    * (1−m_f)/(1−u_f) (disagreeing), where m_f = P(agree | same entity)
    * is a per-field parameter and u_f = P(agree | random pair) is
    * ESTIMATED FROM THE DATA by the random-pairing identity
    * u_f = Σ_v c_v(c_v−1) / N(N−1) over the field's value frequencies
    * (plus the adjacent-value term for the ±1 size band) — exact integer
    * counts, the frequency-based u of Winkler's practice papers.
    *
    * Everything stays exact: m_f are fixed rationals (brand 19/20,
    * size 9/10, type 9/10), u_f exact count ratios, and the composite
    * ratio is accumulated in ppm by one floor-div per field with a 10⁹
    * saturation clamp after each step (ratio range [10⁻⁶, 10³] — beyond
    * the clamp every decision is already forced, so saturation never
    * changes a decision; the per-step clamp also keeps every product
    * within BIGINT in both engines). Decisions are the classic
    * three-way threshold rule: ratio ≥ 100 ⇒ match, ≥ 1 ⇒ possible,
    * else non-match.
    *
    * Output is the GAMMA-PATTERN TABLE, not the pair list — one row per
    * agreement pattern (2³ here), with the pair count, the pattern's
    * composite weight, and its decision: the object an FS clerical-review
    * pipeline actually consumes, and constant-sized however large the
    * corpus. Scale shape: u-estimation is three value-frequency
    * aggregates over the record table; pair generation is an equi-join
    * on the block key (value-frequency capped at `maxBlockDf` — the
    * quadratic-bucket guard, mirrored in-oracle); the pattern aggregate
    * collapses pairs before any weight arithmetic, which then runs on
    * ≤ 8 broadcast-joined rows.
    *
    * Output: (pattern, n_pairs, agree_brand, agree_size, agree_type,
    * r_ppm, decision) ordered by pattern desc (best evidence first).
    */
  def fellegiSunter(df: DataFrame, idCol: String, blockCol: String,
      brandCol: String, sizeCol: String, typeCol: String,
      maxBlockDf: Int = 5000): DataFrame = {
    require(maxBlockDf >= 1, s"maxBlockDf must be >= 1, got $maxBlockDf")
    val p = df.select(col(idCol).as("_rid"),
      col(blockCol).as("blk"), col(brandCol).as("brand"),
      col(sizeCol).as("size"), col(typeCol).as("ptype"))
    // u-probability numerators: agreeing ordered pairs over the FULL table
    val q1 = p.agg(count(lit(1)).as("n"))
      .select(col("n"), (col("n") * (col("n") - 1)).as("q"))
    val uB = p.groupBy(col("brand")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - 1)).as("pb"))
    val uT = p.groupBy(col("ptype")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - 1)).as("pt"))
    val sc = p.groupBy(col("size")).agg(count(lit(1)).as("c"))
    val uS = sc.as("x").join(sc.as("y"),
        col("x.size") === col("y.size") + 1, "left")
      .agg((sum(col("x.c") * (col("x.c") - 1)) +
        lit(2) * sum(col("x.c") * coalesce(col("y.c"), lit(0L)))).as("ps"))
    // per-field agree/disagree weights in ppm, saturated at 10^9:
    //   agree:    m/u       = (m_num·q) / (m_den·p_f)
    //   disagree: (1−m)/(1−u) = ((m_den−m_num)·q) / (m_den·(q−p_f))
    def w(num: Long, den: Long, pf: String, agree: Boolean): Column = {
      val (a, b) =
        if (agree) (s"${num}L * q", s"${den}L * greatest($pf, 1L)")
        else (s"${den - num}L * q", s"${den}L * greatest(q - $pf, 1L)")
      expr(s"least((1000000L * $a) div ($b), 1000000000L)")
    }
    val weights = q1.crossJoin(broadcast(uB)).crossJoin(broadcast(uT))
      .crossJoin(broadcast(uS))
      .select(
        w(19, 20, "pb", agree = true).as("wb1"),
        w(19, 20, "pb", agree = false).as("wb0"),
        w(9, 10, "ps", agree = true).as("ws1"),
        w(9, 10, "ps", agree = false).as("ws0"),
        w(9, 10, "pt", agree = true).as("wt1"),
        w(9, 10, "pt", agree = false).as("wt0"))
    // candidate pairs: equi-join on the block key, frequency-capped
    val keep = p.groupBy(col("blk")).agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") <= maxBlockDf).select(col("blk"))
    val blocked = p.join(keep, "blk")
    val patterns = blocked.as("a")
      .join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a._rid") < col("b._rid"))
      .select(
        (col("a.brand") === col("b.brand")).cast("int").as("gb"),
        (abs(col("a.size") - col("b.size")) <= 1).cast("int").as("gs"),
        (col("a.ptype") === col("b.ptype")).cast("int").as("gt"))
      .groupBy(col("gb"), col("gs"), col("gt"))
      .agg(count(lit(1)).as("n_pairs"))
    patterns.crossJoin(broadcast(weights))
      .withColumn("r1", expr("least(CASE WHEN gb = 1 THEN wb1 ELSE wb0 END, 1000000000L)"))
      .withColumn("r2", expr("least((r1 * CASE WHEN gs = 1 THEN ws1 ELSE ws0 END) div 1000000, 1000000000L)"))
      .withColumn("r_ppm", expr("least((r2 * CASE WHEN gt = 1 THEN wt1 ELSE wt0 END) div 1000000, 1000000000L)"))
      .select((col("gb") * 4 + col("gs") * 2 + col("gt")).cast("long").as("pattern"),
        col("n_pairs"), col("gb").cast("long").as("agree_brand"),
        col("gs").cast("long").as("agree_size"),
        col("gt").cast("long").as("agree_type"), col("r_ppm"),
        when(col("r_ppm") >= 100000000L, lit("match"))
          .when(col("r_ppm") >= 1000000L, lit("possible"))
          .otherwise(lit("non_match")).as("decision"))
      .orderBy(col("pattern").desc)
  }

  private val FsBlockDf = 5000

  private val qFellegiSunter = GraftQuery(
    "qj_fellegi_sunter",
    (s, dir) => fellegiSunter(Tables.part(s, dir), idCol = "p_partkey",
      blockCol = "p_name", brandCol = "p_brand", sizeCol = "p_size",
      typeCol = "p_type", maxBlockDf = FsBlockDf),
    Some(s"""WITH p AS (SELECT p_partkey AS rid, p_name AS blk, p_brand AS brand,
        p_size AS psize, p_type AS ptype FROM part),
    q1 AS (SELECT COUNT(*) AS n, COUNT(*) * (COUNT(*) - 1) AS q FROM p),
    ub AS (SELECT SUM(c * (c - 1)) AS pb FROM
      (SELECT COUNT(*) AS c FROM p GROUP BY brand)),
    ut AS (SELECT SUM(c * (c - 1)) AS pt FROM
      (SELECT COUNT(*) AS c FROM p GROUP BY ptype)),
    sc AS (SELECT psize, COUNT(*) AS c FROM p GROUP BY psize),
    us AS (SELECT SUM(x.c * (x.c - 1)) + 2 * SUM(x.c * COALESCE(y.c, 0)) AS ps
      FROM sc x LEFT JOIN sc y ON x.psize = y.psize + 1),
    wt AS (SELECT
        LEAST((1000000 * 19 * q) // (20 * GREATEST(pb, 1)), 1000000000) AS wb1,
        LEAST((1000000 * 1 * q) // (20 * GREATEST(q - pb, 1)), 1000000000) AS wb0,
        LEAST((1000000 * 9 * q) // (10 * GREATEST(ps, 1)), 1000000000) AS ws1,
        LEAST((1000000 * 1 * q) // (10 * GREATEST(q - ps, 1)), 1000000000) AS ws0,
        LEAST((1000000 * 9 * q) // (10 * GREATEST(pt, 1)), 1000000000) AS wt1,
        LEAST((1000000 * 1 * q) // (10 * GREATEST(q - pt, 1)), 1000000000) AS wt0
      FROM q1, ub, ut, us),
    keep AS (SELECT blk FROM p GROUP BY blk HAVING COUNT(*) <= $FsBlockDf),
    bl AS (SELECT p.* FROM p JOIN keep USING (blk)),
    pat AS (SELECT
        CASE WHEN a.brand = b.brand THEN 1 ELSE 0 END AS gb,
        CASE WHEN abs(a.psize - b.psize) <= 1 THEN 1 ELSE 0 END AS gs,
        CASE WHEN a.ptype = b.ptype THEN 1 ELSE 0 END AS gt,
        COUNT(*) AS n_pairs
      FROM bl a JOIN bl b ON a.blk = b.blk AND a.rid < b.rid
      GROUP BY 1, 2, 3),
    r AS (SELECT gb, gs, gt, n_pairs,
        LEAST((LEAST((LEAST(CASE WHEN gb = 1 THEN wb1 ELSE wb0 END, 1000000000)
          * CASE WHEN gs = 1 THEN ws1 ELSE ws0 END) // 1000000, 1000000000)
          * CASE WHEN gt = 1 THEN wt1 ELSE wt0 END) // 1000000, 1000000000) AS r_ppm
      FROM pat, wt)
    SELECT CAST(gb * 4 + gs * 2 + gt AS BIGINT) AS pattern,
      CAST(n_pairs AS BIGINT) AS n_pairs,
      CAST(gb AS BIGINT) AS agree_brand, CAST(gs AS BIGINT) AS agree_size,
      CAST(gt AS BIGINT) AS agree_type, CAST(r_ppm AS BIGINT) AS r_ppm,
      CASE WHEN r_ppm >= 100000000 THEN 'match'
           WHEN r_ppm >= 1000000 THEN 'possible'
           ELSE 'non_match' END AS decision
    FROM r ORDER BY pattern DESC"""))

  // ------------------------------------- Jaro–Winkler verify (names)
  /** Token-blocked pairs scored with Jaro–Winkler similarity (the
    * [[graft.functions.JaroWinkler]] native expression) — the
    * record-linkage field's standard name comparator, where the edit-
    * distance verifies ([[damerauNameMatch]]) count whole operations:
    * JW grades PARTIAL agreement (per-character matches, transposition
    * rate, common prefix), so "almondblush" vs "almond blush" scores
    * high where a lev-≤-k gate is all-or-nothing.
    *
    * Same blocking/skew contract as [[fuzzyNameMatch]] (shared rare-
    * token equi-join). No length-gap prefilter — JW degrades smoothly
    * with length difference instead of admitting a bound. The emitted
    * similarity is a raw double: the expression is pinned bit-exact to
    * DuckDB's `jaro_winkler_similarity` (StringExprsSpec: 30k-pair
    * fuzz + classics), so the hash gate needs no rounding column.
    *
    * Output: (name_a, name_b, jw, rows_a, rows_b) with jw ≥ `minSim`,
    * ordered by (jw desc, name_a, name_b).
    */
  def jaroWinklerNameMatch(df: DataFrame, nameCol: String = "name",
      minSim: Double = 0.90, maxTokenDf: Int = 1000): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0 && maxTokenDf >= 1)
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val toks = names
      .select(col("name"), explode(split(col("name"), " ")).as("tok"))
      .distinct()
    val rare = toks.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
      .filter(col("tdf") <= maxTokenDf).select(col("tok"))
    val blocked = toks.join(rare, "tok")
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.tok") === col("b.tok") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("jw", graft.functions.GraftFunctions.graft_jaro_winkler(
        col("name_a"), col("name_b")))
      .filter(col("jw") >= minSim)
      .join(names.select(col("name").as("name_a"), col("n_rows").as("rows_a")), "name_a")
      .join(names.select(col("name").as("name_b"), col("n_rows").as("rows_b")), "name_b")
      .select(col("name_a"), col("name_b"), col("jw"),
        col("rows_a"), col("rows_b"))
      .orderBy(col("jw").desc, col("name_a"), col("name_b"))
  }

  private val JwMinSim = 0.90

  private val qJaroWinkler = GraftQuery(
    "qj_jaro_winkler",
    (s, dir) => jaroWinklerNameMatch(Tables.part(s, dir), nameCol = "p_name",
      minSim = JwMinSim, maxTokenDf = FuzzyTokenDf),
    Some(s"""WITH $nameDomainCte,
    t AS (SELECT DISTINCT name, tok FROM
      (SELECT name, unnest(string_split(name, ' ')) AS tok FROM n)),
    rare AS (SELECT tok FROM t GROUP BY tok HAVING COUNT(*) <= $FuzzyTokenDf),
    bl AS (SELECT t.name, t.tok FROM t JOIN rare USING (tok)),
    c AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM bl a JOIN bl b ON a.tok = b.tok AND a.name < b.name),
    v AS (SELECT name_a, name_b,
        jaro_winkler_similarity(name_a, name_b) AS jw
      FROM c WHERE jaro_winkler_similarity(name_a, name_b) >= $JwMinSim)
    SELECT v.name_a, v.name_b, v.jw,
      na.n_rows AS rows_a, nb.n_rows AS rows_b
    FROM v JOIN n na ON na.name = v.name_a JOIN n nb ON nb.name = v.name_b
    ORDER BY v.jw DESC, v.name_a, v.name_b"""))

  val queries: Seq[GraftQuery] =
    Seq(qFuzzy, qSortedNb, qMutualBest, qMultiPass, qPhonetic, qDamerau,
      qFellegiSunter, qJaroWinkler)
}
