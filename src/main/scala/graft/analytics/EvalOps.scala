package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftQuery

/** Classifier/ranker EVALUATION metrics — the measurement half of the
  * learned-curation loop (LearnOps trains the filter; this file scores
  * it): exact ROC-AUC, a precision/recall/F1 operating curve, chance-
  * corrected inter-annotator agreement (Cohen's κ), and arena-style
  * pairwise-preference ranking (Bradley–Terry). These are the numbers a
  * training-data pipeline actually gates releases on ("did the new
  * quality filter beat the old one?"), so they get the same treatment as
  * every other operator: exact integer/decimal arithmetic end-to-end (no
  * float accumulation — bit-identical across engines and partitionings)
  * and a DuckDB oracle per query.
  *
  * Scale shapes: AUC is the Mann–Whitney rank statistic over the
  * distinct-SCORE domain (value-collapse then a distributed two-level
  * prefix scan — [[Scans.rangedCumSum]], never a single-partition global
  * window); the PR curve and κ are one aggregation each; Bradley–Terry
  * pairs inside an order-key equi-join (basket-bounded fan-out, the
  * [[EventsQueries]] copurchase shape) and then iterates MM on an
  * items×items frame that is vocabulary-sized, not corpus-sized.
  */
object EvalOps {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  // ------------------------------------------------------- exact ROC-AUC
  /** Exact ROC-AUC of a scored binary classifier, via the rank-statistic
    * identity AUC = U₁/(n₁·n₂) with the standard ½ credit for ties:
    *
    *   2·U₁ = Σ_v k₁(v) · (2·c₂(<v) + k₂(v))
    *
    * where k₁/k₂ count positives/negatives AT score v and c₂(<v) is the
    * running negative count strictly below v. Everything collapses to the
    * distinct-score domain first (KS/MWU-style); the running count is the
    * two-level range-partitioned scan ([[Scans.rangedCumSum]]) so no
    * global-order window ever runs, and the cross-products ride in
    * DECIMAL(38,0) (128-bit, like DuckDB's HUGEINT) so n₁·n₂ can pass
    * 9.2e18 without wrapping.
    *
    * Output (1 row): (n1, n2, auc_bp, gini_bp) — AUC in basis points and
    * the Gini/accuracy-ratio 2·AUC−1 (⌊·⌋ of the same numerator, so the
    * two columns are consistent under truncation).
    */
  def aucRoc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = scored
      .select(col(scoreCol).as("v"), col(labelCol).cast("int").as("one"))
      .filter(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(sum(col("one")).as("k1"), sum(lit(1) - col("one")).as("k2"))
    val cum = Scans.rangedCumSum(g, "v", col("k2"), "c2i")
      .withColumn("c2", col("c2i") - col("k2"))
    cum.agg(sum(col("k1")).as("n1"), sum(col("k2")).as("n2"),
        sum(dec(col("k1")) * (lit(2).cast("decimal(38,0)") * col("c2")
          + col("k2"))).as("num2"))
      .select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        expr("""CAST((10000 * num2)
            div (2 * CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)""").as("auc_bp"),
        expr("""CAST((10000 * num2)
            div (CAST(n1 AS DECIMAL(38,0)) * n2) - 10000 AS BIGINT)""").as("gini_bp"))
  }

  // ------------------------------------------- precision/recall operating curve
  /** Precision/recall/F1 at a sweep of score thresholds — the operating
    * curve behind "where do we set the keep-cutoff?". Thresholds are the
    * lower edges of `bins` equal-width score bins (the integer binning
    * trick from [[LearnOps.calibrationBins]] — a 1-row min/max broadcast,
    * no ntile global sort); predicting positive at bin b means keeping
    * every row in bins ≥ b, so TP/PP are SUFFIX sums over the bins-row
    * frame (a window over ≤ `bins` rows — constant-sized, not
    * corpus-sized). F1 needs no float: F1 = 2·TP/(PP+P) exactly.
    *
    * Output: one row per non-empty bin, ascending —
    * (bin, thresh = min score in bin, tp, pp, prec_bp, rec_bp, f1_bp).
    */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val st = scored.agg(min(col(scoreCol)).as("_mn"), max(col(scoreCol)).as("_mx"))
    val binned = scored.crossJoin(broadcast(st))
      .withColumn("bin", expr(s"(($scoreCol - _mn) * ${bins}L) DIV (_mx - _mn + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"),
        min(col(scoreCol)).as("thresh"))
    val wSuf = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = binned.agg(sum(col("n_pos")).as("p"))
    binned
      .withColumn("tp", sum(col("n_pos")).over(wSuf))
      .withColumn("pp", sum(col("n")).over(wSuf))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("thresh"), col("tp"), col("pp"),
        expr("10000 * tp div pp").as("prec_bp"),
        expr("10000 * tp div p").as("rec_bp"),
        expr("20000 * tp div (pp + p)").as("f1_bp"))
      .orderBy(col("bin"))
  }

  // ------------------------------------------- Cohen's kappa (agreement)
  /** Chance-corrected agreement between two binary annotators (Cohen's
    * κ) — the standard check that a distilled filter actually tracks its
    * teacher rule (or that two labelers/judge-models agree) beyond what
    * base rates alone would produce:
    *
    *   κ = (p_o − p_e)/(1 − p_e)
    *     = (N·A − r₁c₁ − r₀c₀) / (N² − r₁c₁ − r₀c₀)
    *
    * with A = agreements, r/c the annotators' positive/negative margins.
    * One corpus aggregation builds the 2×2 table; the κ division uses
    * the sign-split pattern (divide |numerator|, negate after). Both
    * Spark `div` and DuckDB `//` truncate integer division toward zero,
    * so the split is a no-op here — kept only as a defensive convention
    * against engines that floor — with margins in DECIMAL(38,0) so N²
    * can't wrap. Output (1 row): (n, agree, ra, rb, po_bp, pe_bp, kappa_bp);
    * kappa_bp is NULL when p_e = 1 (degenerate single-cell margins).
    */
  def cohenKappa(rows: DataFrame, a: Column, b: Column): DataFrame = {
    rows.select(a.cast("int").as("a"), b.cast("int").as("b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"),
        sum(col("a").cast("long")).as("ra"),
        sum(col("b").cast("long")).as("rb"))
      .select(col("n"), col("agree"), col("ra"), col("rb"),
        expr("10000 * agree div n").as("po_bp"),
        expr("""CAST((10000 * (CAST(ra AS DECIMAL(38,0)) * rb
            + CAST(n - ra AS DECIMAL(38,0)) * (n - rb)))
            div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""").as("pe_bp"),
        expr("""CAST(CASE
            WHEN CAST(n AS DECIMAL(38,0)) * n
               = CAST(ra AS DECIMAL(38,0)) * rb
               + CAST(n - ra AS DECIMAL(38,0)) * (n - rb) THEN NULL
            WHEN CAST(n AS DECIMAL(38,0)) * agree
               >= CAST(ra AS DECIMAL(38,0)) * rb
               + CAST(n - ra AS DECIMAL(38,0)) * (n - rb)
            THEN (10000 * (CAST(n AS DECIMAL(38,0)) * agree
                - CAST(ra AS DECIMAL(38,0)) * rb
                - CAST(n - ra AS DECIMAL(38,0)) * (n - rb)))
              div (CAST(n AS DECIMAL(38,0)) * n
                - CAST(ra AS DECIMAL(38,0)) * rb
                - CAST(n - ra AS DECIMAL(38,0)) * (n - rb))
            ELSE -((10000 * (CAST(ra AS DECIMAL(38,0)) * rb
                + CAST(n - ra AS DECIMAL(38,0)) * (n - rb)
                - CAST(n AS DECIMAL(38,0)) * agree))
              div (CAST(n AS DECIMAL(38,0)) * n
                - CAST(ra AS DECIMAL(38,0)) * rb
                - CAST(n - ra AS DECIMAL(38,0)) * (n - rb)))
            END AS BIGINT)""").as("kappa_bp"))
  }

  // ------------------------------------------- Bradley–Terry MM ranking
  /** Arena-style strength ranking from pairwise outcomes (Bradley–Terry,
    * two minorization-maximization steps) — the model behind chatbot-
    * arena leaderboards, run here on a deterministic battle corpus:
    * within each order, every pair of distinct part brands "battles" and
    * the brand with the larger in-order revenue wins (revenue ties are
    * discarded — no outcome). The MM update from Hunter (2004):
    *
    *   π'_i = W_i / Σ_{j≠i} n_ij/(π_i + π_j)
    *
    * is run twice from the uniform start in exact micro-unit integers:
    * with ratings m = ⌊10⁶π⌋, s_i = Σ_j ⌊10¹²·n_ij/(m_i+m_j)⌋ and
    * m'_i = ⌊10¹²·W_i/s_i⌋ — every division an explicit ⌊·⌋ both engines
    * compute identically (operands nonnegative), products in
    * DECIMAL(38,0).
    *
    * Scale: battles pair inside an ORDER-KEY equi-join (hash join,
    * basket-bounded fan-out — never a cartesian); the win/comparison
    * matrix and both MM steps live on an items×items frame bounded by the
    * brand vocabulary (≤ |brands|² rows), independent of corpus size.
    * Pairs where both ratings are 0 contribute no term (NULL div), which
    * both engines agree on via an explicit CASE.
    *
    * Output: (item, wins, n_comp, rating1_micro, rating2_micro) ordered
    * by final rating descending, item ascending.
    */
  def bradleyTerry2(battles: DataFrame, winnerCol: String,
      loserCol: String): DataFrame = {
    // the win matrix is items²-bounded and EVERY downstream frame (n_ij,
    // totals, both MM steps, the final rating joins) derives from it —
    // without the checkpoint the corpus-sized battle join would recompute
    // once per consumer (measured 5.8 s → ~1 s at sf0.1)
    val w1 = battles
      .groupBy(col(winnerCol).as("i"), col(loserCol).as("j"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    // directed comparison counts: n(i,j) = w(i→j) + w(j→i), materialized
    // in both orientations so each MM term reads one row
    val d = w1.select(col("i"), col("j"), col("w"))
      .unionByName(w1.select(col("j").as("i"), col("i").as("j"), col("w")))
      .groupBy(col("i"), col("j")).agg(sum(col("w")).as("n"))
    val wins = d.join(w1.groupBy(col("i")).agg(sum(col("w")).as("wins")),
        Seq("i"), "left")
      .groupBy(col("i")).agg(max(coalesce(col("wins"), lit(0L))).as("wins"),
        sum(col("n")).as("n_comp"))
    def mmStep(r: DataFrame): DataFrame = {
      val s = d
        .join(r.select(col("i"), col("m").as("mi")), Seq("i"))
        .join(r.select(col("i").as("j"), col("m").as("mj")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(expr("""CASE WHEN mi + mj = 0 THEN NULL
          ELSE (1000000000000 * CAST(n AS DECIMAL(38,0))) div (mi + mj)
          END""")).as("s"))
      wins.join(s, Seq("i"))
        .select(col("i"),
          expr("""CAST(CASE WHEN s IS NULL OR s = 0 THEN 0
            ELSE (1000000000000 * CAST(wins AS DECIMAL(38,0))) div s
            END AS BIGINT)""").as("m"))
    }
    val r0 = wins.select(col("i"), lit(1000000L).as("m"))
    val r1 = mmStep(r0)
    val r2 = mmStep(r1)
    wins
      .join(r1.select(col("i"), col("m").as("rating1_micro")), Seq("i"))
      .join(r2.select(col("i"), col("m").as("rating2_micro")), Seq("i"))
      .select(col("i").as("item"), col("wins"), col("n_comp"),
        col("rating1_micro"), col("rating2_micro"))
      .orderBy(col("rating2_micro").desc, col("item"))
  }

  // ==================== driver-checked query bindings ====================

  private val qAuc = GraftQuery(
    "qml_auc_roc",
    (s, dir) => aucRoc(LearnOps.scoredDocs(s, dir), "score", "label"),
    Some(s"""WITH ${LearnOps.scoredCte},
    g AS (SELECT score AS v, SUM(lab) AS k1, SUM(1 - lab) AS k2
      FROM cal GROUP BY score),
    c AS (SELECT v, k1, k2, COALESCE(SUM(k2) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c2
      FROM g),
    t AS (SELECT SUM(k1) AS n1, SUM(k2) AS n2,
        SUM(CAST(k1 AS HUGEINT) * (2 * c2 + k2)) AS num2 FROM c)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      CAST((10000 * num2) // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS auc_bp,
      CAST((10000 * num2) // (CAST(n1 AS HUGEINT) * n2) - 10000 AS BIGINT) AS gini_bp
    FROM t"""))

  private val PrBins = 10

  private val qPrCurve = GraftQuery(
    "qml_pr_curve",
    (s, dir) => prCurve(LearnOps.scoredDocs(s, dir), "score", "label", PrBins),
    Some(s"""WITH ${LearnOps.scoredCte},
    st2 AS (SELECT MIN(score) AS mn, MAX(score) AS mx FROM cal),
    bi AS (SELECT ((score - mn) * $PrBins) // (mx - mn + 1) AS bin, score, lab
      FROM cal, st2),
    g AS (SELECT bin, COUNT(*) AS n, SUM(lab) AS n_pos, MIN(score) AS thresh
      FROM bi GROUP BY bin),
    c AS (SELECT bin, thresh,
        SUM(n_pos) OVER (ORDER BY bin DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        SUM(n) OVER (ORDER BY bin DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
        (SELECT SUM(n_pos) FROM g) AS p
      FROM g)
    SELECT CAST(bin AS BIGINT) AS bin, thresh, CAST(tp AS BIGINT) AS tp,
      CAST(pp AS BIGINT) AS pp,
      CAST(10000 * tp // pp AS BIGINT) AS prec_bp,
      CAST(10000 * tp // p AS BIGINT) AS rec_bp,
      CAST(20000 * tp // (pp + p) AS BIGINT) AS f1_bp
    FROM c ORDER BY bin"""))

  private val qKappa = GraftQuery(
    "qml_kappa",
    (s, dir) => cohenKappa(LearnOps.scoredDocs(s, dir),
      col("label"), col("pred")),
    Some(s"""WITH ${LearnOps.scoredCte},
    t AS (SELECT COUNT(*) AS n,
        SUM(CASE WHEN lab = predi THEN 1 ELSE 0 END) AS agree,
        SUM(lab) AS ra, SUM(predi) AS rb
      FROM cal)
    SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
      CAST(ra AS BIGINT) AS ra, CAST(rb AS BIGINT) AS rb,
      CAST(10000 * agree // n AS BIGINT) AS po_bp,
      CAST((10000 * (CAST(ra AS HUGEINT) * rb + CAST(n - ra AS HUGEINT) * (n - rb)))
        // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_bp,
      CAST(CASE
        WHEN CAST(n AS HUGEINT) * n
           = CAST(ra AS HUGEINT) * rb + CAST(n - ra AS HUGEINT) * (n - rb) THEN NULL
        WHEN CAST(n AS HUGEINT) * agree
          >= CAST(ra AS HUGEINT) * rb + CAST(n - ra AS HUGEINT) * (n - rb)
        THEN (10000 * (CAST(n AS HUGEINT) * agree
            - CAST(ra AS HUGEINT) * rb - CAST(n - ra AS HUGEINT) * (n - rb)))
          // (CAST(n AS HUGEINT) * n
            - CAST(ra AS HUGEINT) * rb - CAST(n - ra AS HUGEINT) * (n - rb))
        ELSE -((10000 * (CAST(ra AS HUGEINT) * rb
            + CAST(n - ra AS HUGEINT) * (n - rb) - CAST(n AS HUGEINT) * agree))
          // (CAST(n AS HUGEINT) * n
            - CAST(ra AS HUGEINT) * rb - CAST(n - ra AS HUGEINT) * (n - rb)))
        END AS BIGINT) AS kappa_bp
    FROM t"""))

  /** Battle corpus: per-order brand revenues; larger revenue wins. */
  private def brandBattles(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    // materialized: the a/b pair sides would otherwise each recompute the
    // lineitem⋈part aggregation (exchange reuse is best-effort)
    val obr = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"), col("p_brand"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("r"))
      .localCheckpoint()
    val a = obr.select(col("l_orderkey"), col("p_brand").as("ba"), col("r").as("ra"))
    val b = obr.select(col("l_orderkey"), col("p_brand").as("bb"), col("r").as("rb"))
    a.join(b, Seq("l_orderkey")).filter(col("ba") < col("bb"))
      .filter(col("ra") =!= col("rb"))
      .select(when(col("ra") > col("rb"), col("ba")).otherwise(col("bb")).as("winner"),
        when(col("ra") > col("rb"), col("bb")).otherwise(col("ba")).as("loser"))
  }

  private val btBattlesSql = """obr AS (SELECT l_orderkey, p_brand,
      SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS r
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_orderkey, p_brand),
  bt AS (SELECT CASE WHEN a.r > b.r THEN a.p_brand ELSE b.p_brand END AS winner,
      CASE WHEN a.r > b.r THEN b.p_brand ELSE a.p_brand END AS loser
    FROM obr a JOIN obr b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    WHERE a.r <> b.r),
  w1 AS (SELECT winner AS i, loser AS j, COUNT(*) AS w FROM bt GROUP BY 1, 2),
  d AS (SELECT i, j, SUM(w) AS n FROM (
      SELECT i, j, w FROM w1 UNION ALL SELECT j AS i, i AS j, w FROM w1)
    GROUP BY i, j),
  wins AS (SELECT d.i, MAX(COALESCE(t.wins, 0)) AS wins, SUM(d.n) AS n_comp
    FROM d LEFT JOIN (SELECT i, SUM(w) AS wins FROM w1 GROUP BY i) t
      ON d.i = t.i
    GROUP BY d.i),
  r1 AS (SELECT wins.i,
      CAST(CASE WHEN s.s IS NULL OR s.s = 0 THEN 0
        ELSE (1000000000000 * CAST(wins.wins AS HUGEINT)) // s.s
        END AS BIGINT) AS m
    FROM wins JOIN (SELECT i, SUM((1000000000000 * CAST(n AS HUGEINT))
        // (1000000 + 1000000)) AS s
      FROM d GROUP BY i) s ON wins.i = s.i),
  r2 AS (SELECT wins.i,
      CAST(CASE WHEN s.s IS NULL OR s.s = 0 THEN 0
        ELSE (1000000000000 * CAST(wins.wins AS HUGEINT)) // s.s
        END AS BIGINT) AS m
    FROM wins JOIN (SELECT d.i,
        SUM(CASE WHEN ri.m + rj.m = 0 THEN NULL
          ELSE (1000000000000 * CAST(d.n AS HUGEINT)) // (ri.m + rj.m) END) AS s
      FROM d JOIN r1 ri ON d.i = ri.i JOIN r1 rj ON d.j = rj.i
      GROUP BY d.i) s ON wins.i = s.i)"""

  private val qBradleyTerry = GraftQuery(
    "qml_bradley_terry",
    (s, dir) => bradleyTerry2(brandBattles(s, dir), "winner", "loser"),
    Some(s"""WITH $btBattlesSql
    SELECT wins.i AS item, CAST(wins.wins AS BIGINT) AS wins,
      CAST(wins.n_comp AS BIGINT) AS n_comp,
      r1.m AS rating1_micro, r2.m AS rating2_micro
    FROM wins JOIN r1 ON wins.i = r1.i JOIN r2 ON wins.i = r2.i
    ORDER BY rating2_micro DESC, item"""))

  // ------------------------------------- McNemar's paired test
  /** McNemar's test (1947) — "is classifier A actually better than B on
    * the SAME rows", the paired comparison an unpaired accuracy delta
    * gets wrong (shared-row correlation): only the DISCORDANT pairs
    * matter — b = A right & B wrong, c = A wrong & B right — and under
    * H₀ (equal error rates) b ~ Binomial(b+c, ½). The continuity-
    * corrected statistic χ² = (max(|b−c|−1, 0))²/(b+c), df = 1, in
    * exact micro-units (one floor-div), reject at χ²_{1,0.05} =
    * 3.841459. b + c = 0 (never-discordant) yields null χ² and null
    * decision. One map + one 1-row aggregate — scale-free.
    *
    * Output: one row (n, b, c, chi2_micro, reject_05).
    */
  def mcNemar(rows: DataFrame, label: Column, predA: Column,
      predB: Column): DataFrame = {
    rows.select((predA === label).cast("long").as("ra"),
        (predB === label).cast("long").as("rb"))
      .agg(count(lit(1)).as("n"),
        sum(col("ra") * (lit(1) - col("rb"))).as("b"),
        sum((lit(1) - col("ra")) * col("rb")).as("c"))
      .select(col("n"), col("b"), col("c"),
        expr("""CASE WHEN b + c > 0 THEN
            (1000000 * greatest(abs(b - c) - 1, 0L) * greatest(abs(b - c) - 1, 0L))
              div (b + c) END""").as("chi2_micro"))
      .withColumn("reject_05", col("chi2_micro") > 3841459L)
  }

  /** Distilled model vs the crude n_chars ≥ 250 length rule, on the
    * distillation label — does hashed-feature training beat the one-line
    * heuristic it could be replaced with.
    */
  private val qMcNemar = GraftQuery(
    "qml_mcnemar",
    (s, dir) => mcNemar(
      LearnOps.scoredDocs(s, dir).join(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id"),
      col("label").cast("int"), col("pred").cast("int"),
      (col("n_chars") >= 250).cast("int")),
    Some(s"""WITH ${LearnOps.scoredCte},
    j AS (SELECT cal.lab, cal.predi,
        CASE WHEN d.n_chars >= 250 THEN 1 ELSE 0 END AS predb
      FROM cal JOIN documents d USING (doc_id)),
    t AS (SELECT COUNT(*) AS n,
        SUM(CASE WHEN predi = lab AND predb <> lab THEN 1 ELSE 0 END) AS b,
        SUM(CASE WHEN predi <> lab AND predb = lab THEN 1 ELSE 0 END) AS c
      FROM j)
    SELECT CAST(n AS BIGINT) AS n, CAST(b AS BIGINT) AS b,
      CAST(c AS BIGINT) AS c,
      CAST(CASE WHEN b + c > 0 THEN
          (1000000 * GREATEST(abs(b - c) - 1, 0) * GREATEST(abs(b - c) - 1, 0))
            // (b + c) END AS BIGINT) AS chi2_micro,
      CASE WHEN b + c > 0 THEN
          (1000000 * GREATEST(abs(b - c) - 1, 0) * GREATEST(abs(b - c) - 1, 0))
            // (b + c) > 3841459 END AS reject_05
    FROM t"""))

  /** Corpus-level BLEU-style modified n-gram precision (Papineni et al.,
    * ACL 2002) over (candidate, reference) text pairs: for n ∈ {1, 2},
    * clipped matches Σ_g min(cnt_cand(g), cnt_ref(g)) summed per pair,
    * precision as exact basis points (truncating integer division, both
    * engines), plus the length ratio the brevity penalty is a function of
    * — everything up to the final transcendental exp, kept exact-integer
    * so the gate hash-compares (the κ/McNemar convention).
    *
    * Plan shape: ONE tokenize+explode scan per side — uni- and bigrams
    * ride the same explode as (n, gram)-tagged structs, so the corpus is
    * tokenized exactly twice (a naive per-n/per-side layout costs 4
    * scans, +1 for totals; measured 2.5 s → 1.1 s at sf0.1). The tagged
    * per-(pair, n, gram) counts materialize once (they are gram-domain-
    * sized, tiny next to the corpus) and feed the clipped equi-join AND
    * the token totals. At 100 TB every shuffle key is (pair, n, gram) —
    * fine-grained and skew-free (a gram's worldwide frequency never
    * concentrates one key: the pair id is in the key). The three 1-row
    * aggregates meet in broadcast cross joins.
    */
  def bleuNgramPrecision(pairs: DataFrame, pairCol: String = "pair",
      candCol: String = "cand_text", refCol: String = "ref_text"): DataFrame = {
    val base = pairs.select(col(pairCol).as("pair"),
        expr(Nlp.toksExprOn(candCol)).as("ct"),
        expr(Nlp.toksExprOn(refCol)).as("rt"))
      .withColumn("cg2", expr(Nlp.bigrams("ct")))
      .withColumn("rg2", expr(Nlp.bigrams("rt")))
    def gramCounts(tokCol: String, bigCol: String, cntCol: String) = base
      .select(col("pair"), explode(concat(
          expr(s"transform($tokCol, x -> struct(1 AS n, x AS gram))"),
          expr(s"transform($bigCol, x -> struct(2 AS n, x AS gram))"))).as("t"))
      .select(col("pair"), col("t.n").as("n"), col("t.gram").as("gram"))
      .groupBy(col("pair"), col("n"), col("gram")).agg(count(lit(1)).as(cntCol))
      .localCheckpoint()
    val cc = gramCounts("ct", "cg2", "cc")
    val rc = gramCounts("rt", "rg2", "rc")
    val clipped = cc.join(rc, Seq("pair", "n", "gram"))
      .agg(
        coalesce(sum(when(col("n") === 1, least(col("cc"), col("rc")))), lit(0L))
          .as("m1"),
        coalesce(sum(when(col("n") === 2, least(col("cc"), col("rc")))), lit(0L))
          .as("m2"))
    val candTot = cc.agg(
      sum(when(col("n") === 1, col("cc"))).as("cand_tokens"),
      sum(when(col("n") === 2, col("cc"))).as("t2"))
    val refTot = rc.agg(
      sum(when(col("n") === 1, col("rc"))).as("ref_tokens"))
    candTot
      .crossJoin(broadcast(refTot))
      .crossJoin(broadcast(clipped))
      .select(col("cand_tokens"), col("ref_tokens"),
        expr("10000 * cand_tokens div ref_tokens").as("len_ratio_bp"),
        col("m1"), expr("10000 * m1 div cand_tokens").as("p1_bp"),
        col("t2"), col("m2"), expr("10000 * m2 div t2").as("p2_bp"))
  }

  // Pairing is harness-side arithmetic, not a window: candidate = even
  // doc_id, reference = the next odd doc_id — one equi-join, scalable.
  private val qBleu = GraftQuery(
    "qml_bleu",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val cand = d.filter(col("doc_id") % 2 === 0)
        .select(expr("doc_id div 2").as("pair"), col("text").as("cand_text"))
      val ref = d.filter(col("doc_id") % 2 === 1)
        .select(expr("doc_id div 2").as("pair"), col("text").as("ref_text"))
      bleuNgramPrecision(cand.join(ref, "pair"))
    },
    Some(s"""WITH cd AS (${pairedSideSql(s"${Nlp.toksSql} AS toks", 0)}),
      rd AS (${pairedSideSql(s"${Nlp.toksSql} AS toks", 1)}),
      cb AS (SELECT pair, toks, ${Nlp.bigramsSql("toks")} AS g2 FROM cd),
      rb AS (SELECT pair, toks, ${Nlp.bigramsSql("toks")} AS g2 FROM rd),
      tot AS (SELECT (SELECT SUM(len(toks)) FROM cd) AS cand_tokens,
        (SELECT SUM(len(toks)) FROM rd) AS ref_tokens,
        (SELECT SUM(len(g2)) FROM cb) AS t2),
      c1 AS (SELECT pair, tok, COUNT(*) AS cc
        FROM (SELECT pair, unnest(toks) AS tok FROM cd) GROUP BY pair, tok),
      r1 AS (SELECT pair, tok, COUNT(*) AS rc
        FROM (SELECT pair, unnest(toks) AS tok FROM rd) GROUP BY pair, tok),
      m1t AS (SELECT COALESCE(SUM(LEAST(cc, rc)), 0) AS m1
        FROM c1 JOIN r1 USING (pair, tok)),
      c2 AS (SELECT pair, g, COUNT(*) AS cc
        FROM (SELECT pair, unnest(g2) AS g FROM cb) GROUP BY pair, g),
      r2 AS (SELECT pair, g, COUNT(*) AS rc
        FROM (SELECT pair, unnest(g2) AS g FROM rb) GROUP BY pair, g),
      m2t AS (SELECT COALESCE(SUM(LEAST(cc, rc)), 0) AS m2
        FROM c2 JOIN r2 USING (pair, g))
      SELECT CAST(cand_tokens AS BIGINT) AS cand_tokens,
        CAST(ref_tokens AS BIGINT) AS ref_tokens,
        CAST(10000 * cand_tokens // ref_tokens AS BIGINT) AS len_ratio_bp,
        CAST(m1 AS BIGINT) AS m1,
        CAST(10000 * m1 // cand_tokens AS BIGINT) AS p1_bp,
        CAST(t2 AS BIGINT) AS t2, CAST(m2 AS BIGINT) AS m2,
        CAST(10000 * m2 // t2 AS BIGINT) AS p2_bp
      FROM tot, m1t, m2t"""))

  // --------------------------------------- Cronbach's alpha (reliability)
  /** Cronbach's α — internal-consistency reliability of k parallel
    * measurements per subject (k judge scores per sample, k rubric
    * items per annotation, k probe dimensions per embedding): α =
    * k/(k−1) · (1 − Σᵢσ²ᵢ / σ²_T) where T is the per-subject item sum.
    * α near 1 means the items measure one construct; near 0, noise.
    *
    * Exactness: items are ×2²⁴-quantized (the [[ProfileOps]] embedding
    * convention — exact for float inputs), every variance numerator is
    * the integer form n·ΣX² − (ΣX)² in DECIMAL(38,0), and α itself is
    * one floored integer division — the quantization scale cancels in
    * the ratio. Two narrow scans (one per-row for T, one exploded for
    * per-item sums), each collapsing into ≤ k+1-row aggregates; no
    * window, no driver loop.
    *
    * Output (1 row): (n_subjects, k_items, alpha_milli); NULL α when
    * the total variance is 0.
    */
  def cronbachAlpha(vecs: DataFrame, vecCol: String = "embedding",
      items: Int = 8): DataFrame = {
    require(items >= 2, s"items must be >= 2, got $items")
    val q = 1L << 24
    val rows = vecs.select(expr(
      s"transform(slice(cast($vecCol as array<double>), 1, $items), " +
        s"x -> cast(round(x * $q) as bigint))").as("qvs"))
      .filter(size(col("qvs")) === items)
      .withColumn("t", expr(
        "aggregate(qvs, CAST(0 AS BIGINT), (a, x) -> a + x)"))
    val tot = rows.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(dec(col("t"))).as("st"), sum(dec(col("t")) * col("t")).as("qt"))
    val item = rows.select(posexplode(col("qvs")).as(Seq("i", "qv")))
      .groupBy(col("i"))
      .agg(sum(dec(col("qv"))).as("s"), sum(dec(col("qv")) * col("qv")).as("qq"))
    item.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), count(lit(1)).cast("decimal(38,0)").as("k"),
        sum(col("n") * col("qq") - col("s") * col("s")).as("sv"),
        max(col("n") * col("qt") - col("st") * col("st")).as("vt"))
      .select(col("n").cast("long").as("n_subjects"),
        col("k").cast("long").as("k_items"),
        expr("""CAST((1000 * k * (vt - sv))
          div nullif((k - 1) * vt, CAST(0 AS DECIMAL(38,0))) AS BIGINT)""")
          .as("alpha_milli"))
  }

  /** Leading 8 embedding dimensions as the k items — the "do these
    * probe dims move together" reliability read; the real pipeline
    * binding is k judge scores per sample through the same API.
    */
  private val qCronbach = GraftQuery(
    "qml_cronbach_alpha",
    (s, dir) => cronbachAlpha(Tables.embeddings(s, dir)),
    Some("""WITH r AS (SELECT list_transform((embedding::DOUBLE[])[1:8],
        x -> CAST(round(x * 16777216) AS BIGINT)) AS qvs
      FROM embeddings WHERE len(embedding) >= 8),
    rt AS (SELECT qvs, list_aggregate(qvs, 'sum') AS t FROM r),
    tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        CAST(SUM(t) AS HUGEINT) AS st,
        CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS qt FROM rt),
    x AS (SELECT i, qvs[i] AS qv FROM rt,
      LATERAL (SELECT unnest(generate_series(1, 8)) AS i) g),
    it AS (SELECT i, CAST(SUM(qv) AS HUGEINT) AS s,
        CAST(SUM(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS qq
      FROM x GROUP BY i),
    f AS (SELECT tot.n, CAST(COUNT(*) AS HUGEINT) AS k,
        SUM(tot.n * it.qq - it.s * it.s) AS sv,
        MAX(tot.n * tot.qt - tot.st * tot.st) AS vt
      FROM it, tot GROUP BY tot.n)
    SELECT CAST(n AS BIGINT) AS n_subjects, CAST(k AS BIGINT) AS k_items,
      CAST((1000 * k * (vt - sv)) // NULLIF((k - 1) * vt, 0) AS BIGINT)
        AS alpha_milli
    FROM f"""))

  // ------------------------------ Krippendorff's alpha (nominal data)
  /** Krippendorff's α for NOMINAL data with ragged units — the
    * inter-annotator agreement measure that, unlike Cohen's κ, handles
    * any number of raters per unit and missing ratings: α = 1 − D_o/D_e
    * over the coincidence matrix, which reduces to
    *
    *   α = 1 − (n−1)·Σᵤ[(m²ᵤ − Σ_c o²ᵤ_c)/(mᵤ−1)] / (n² − Σ_c n²_c)
    *
    * with mᵤ ratings in unit u, o counts per (unit, category), n the
    * total pairable ratings (units with mᵤ ≥ 2 only).
    *
    * Exactness: the per-unit disagreement weight 1/(mᵤ−1) is the one
    * non-integer — it rides as a per-unit ppm floor (identical in both
    * engines); everything downstream is DECIMAL(38,0) (the α numerator
    * is ~10⁶·n·m̄·n, past BIGINT at ~10⁵ ratings). Plan: one
    * (unit, category) aggregation, one unit-key rollup, one
    * category-domain rollup — two shuffles on the natural keys, no
    * window, no pair explosion (the o²-identity counts pairs in place).
    *
    * Output (1 row): (n_ratings, n_units, n_cats, alpha_ppm); NULL α
    * when every rating is one category (D_e = 0).
    */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
      categoryCol: String): DataFrame = {
    val uc = ratings
      .select(col(unitCol).as("u"), col(categoryCol).as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("u"), col("c")).agg(count(lit(1)).as("o"))
    val um = uc.groupBy(col("u"))
      .agg(sum(col("o")).as("m"), sum(col("o") * col("o")).as("so"))
      .filter(col("m") >= 2)
      .select(col("u"), col("m"),
        expr("CAST((1000000 * (m * m - so)) div (m - 1) AS BIGINT)")
          .as("t_ppm"))
    val cats = uc.join(um.select(col("u")), "u")
      .groupBy(col("c")).agg(sum(col("o")).as("nc"))
    val ctot = cats.agg(count(lit(1)).as("n_cats"),
      sum(dec(col("nc")) * col("nc")).as("snc2"))
    um.agg(sum(dec(col("m"))).as("n"), count(lit(1)).as("n_units"),
        sum(dec(col("t_ppm"))).as("s_ppm"))
      .crossJoin(broadcast(ctot))
      .select(col("n").cast("long").as("n_ratings"),
        col("n_units").cast("long").as("n_units"),
        col("n_cats").cast("long").as("n_cats"),
        expr("""CAST(1000000 - (s_ppm * (n - 1))
          div nullif(n * n - snc2, CAST(0 AS DECIMAL(38,0))) AS BIGINT)""")
          .as("alpha_ppm"))
  }

  /** Units = orders, "raters" = their line items, category = return
    * flag — do an order's lines agree on return status beyond chance?
    */
  private val qKrippendorff = GraftQuery(
    "qml_krippendorff",
    (s, dir) => krippendorffAlpha(Tables.lineitem(s, dir),
      "l_orderkey", "l_returnflag"),
    Some("""WITH uc AS (SELECT l_orderkey AS u, l_returnflag AS c,
        COUNT(*) AS o FROM lineitem WHERE l_returnflag IS NOT NULL
      GROUP BY 1, 2),
    um AS (SELECT u, SUM(o) AS m, SUM(o * o) AS so FROM uc GROUP BY u
      HAVING SUM(o) >= 2),
    um2 AS (SELECT u, m,
        CAST((1000000 * (m * m - so)) // (m - 1) AS BIGINT) AS t_ppm FROM um),
    cats AS (SELECT c, SUM(o) AS nc FROM uc
      WHERE u IN (SELECT u FROM um2) GROUP BY c),
    ct AS (SELECT COUNT(*) AS n_cats,
        SUM(CAST(nc AS HUGEINT) * nc) AS snc2 FROM cats),
    ut AS (SELECT CAST(SUM(m) AS HUGEINT) AS n, COUNT(*) AS n_units,
        CAST(SUM(t_ppm) AS HUGEINT) AS s_ppm FROM um2)
    SELECT CAST(ut.n AS BIGINT) AS n_ratings,
      CAST(ut.n_units AS BIGINT) AS n_units,
      CAST(ct.n_cats AS BIGINT) AS n_cats,
      CAST(1000000 - (ut.s_ppm * (ut.n - 1))
        // NULLIF(ut.n * ut.n - ct.snc2, 0) AS BIGINT) AS alpha_ppm
    FROM ut, ct"""))

  // ------------------------------- Kendall's W (multi-judge concordance)
  /** Kendall's coefficient of concordance W ∈ [0, 1] — "do the n judges
    * rank the k items consistently at all?", the multi-rater upgrade
    * over pairwise agreement ([[cohenKappa]]: two raters, nominal;
    * [[krippendorffAlpha]]: ragged nominal; W: n complete rankings) and
    * the standard agreement read for LLM judge panels. Computed through
    * the tie-corrected identity W = Q/(n(k−1)) over
    * [[StatTests.friedman]]'s exact doubled-rank machinery — one more
    * floored integer division on the same 1-row frame, so the
    * concordance and the significance test (Q ~ χ²_{k−1}) come from one
    * plan.
    *
    * Output (1 row): (n_judges, k_items, q_micro, w_milli).
    */
  def kendallW(obs: DataFrame, judgeCol: String, itemCol: String,
      score: Column): DataFrame =
    StatTests.friedman(obs, judgeCol, itemCol, score)
      .select(col("n_blocks").as("n_judges"), col("k").as("k_items"),
        col("q_micro"),
        expr("CAST(q_micro div (1000 * n_blocks * (k - 1)) AS BIGINT)")
          .as("w_milli"))

  private val qKendallW = GraftQuery(
    "qml_kendall_w",
    (s, dir) => kendallW(Tables.events(s, dir), "user_id", "event_type",
      expr("CAST(round(value * 100) AS BIGINT)")),
    Some("""WITH c AS (SELECT user_id, event_type,
        SUM(CAST(round(value * 100) AS BIGINT)) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    kk AS (SELECT COUNT(DISTINCT event_type) AS k FROM c),
    fu AS (SELECT user_id FROM c, kk GROUP BY user_id, kk.k
      HAVING COUNT(*) = kk.k),
    b AS (SELECT c.* FROM c JOIN fu USING (user_id)),
    r AS (SELECT user_id, event_type, v,
        2 * (RANK() OVER (PARTITION BY user_id ORDER BY v) - 1)
          + COUNT(*) OVER (PARTITION BY user_id, v) + 1 AS r2
      FROM b),
    rj AS (SELECT event_type, CAST(SUM(r2) AS HUGEINT) AS r2j,
        CAST(COUNT(*) AS HUGEINT) AS n FROM r GROUP BY event_type),
    a AS (SELECT SUM(CAST(r2 AS HUGEINT) * r2) AS a2 FROM r),
    s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS kd, MAX(rj.n) AS n,
        SUM((r2j - rj.n * (kk.k + 1)) * (r2j - rj.n * (kk.k + 1))) AS num
      FROM rj, kk GROUP BY kk.k),
    f AS (SELECT s.n, s.kd, a.a2, s.num,
        s.n * s.kd * (s.kd + 1) * (s.kd + 1) AS c2 FROM s, a),
    q AS (SELECT n, kd,
        (1000000 * (kd - 1) * num) // NULLIF(a2 - c2, 0) AS qm FROM f)
    SELECT CAST(n AS BIGINT) AS n_judges, CAST(kd AS BIGINT) AS k_items,
      CAST(qm AS BIGINT) AS q_micro,
      CAST(qm // (1000 * n * (kd - 1)) AS BIGINT) AS w_milli
    FROM q"""))

  // ------------------------------------------- ROUGE-N (recall-oriented)
  /** Macro-averaged ROUGE-N (Lin, ACL 2004 wksp) for n ∈ {1, 2} over
    * (candidate, reference) pairs — the RECALL-oriented companion to
    * [[bleuNgramPrecision]]'s corpus-level clipped precision, and
    * per-pair-then-averaged where BLEU is micro (the two disagree
    * exactly when quality varies with length — having both is the
    * point). Per pair: clipped matches m = Σ_g min(cnt_c, cnt_r),
    * recall = m/|ref grams|, precision = m/|cand grams|, and F1 =
    * 2m/(|cand| + |ref|) (the harmonic identity — exact, no float
    * mean). All three floored to bp per pair, then macro-averaged by
    * one more floored division — composed-floors convention.
    *
    * Plan: the BLEU layout — ONE tokenize+explode per side carrying
    * (n, gram)-tagged structs, per-(pair, n, gram) counts materialized
    * once, the clipped equi-join keyed (pair, n, gram) (pair id in the
    * key — skew-free), totals as (pair, n) aggregates of the SAME
    * count frames. Pairs with zero grams on either side at a given n
    * (sub-n-token docs) drop from that n's average, mirrored in-oracle.
    *
    * Output: one row per n — (n, pairs, recall_bp, precision_bp,
    * f1_bp), ordered by n.
    */
  def rougeNgram(pairs: DataFrame, pairCol: String = "pair",
      candCol: String = "cand_text", refCol: String = "ref_text"): DataFrame = {
    val base = pairs.select(col(pairCol).as("pair"),
        expr(Nlp.toksExprOn(candCol)).as("ct"),
        expr(Nlp.toksExprOn(refCol)).as("rt"))
      .withColumn("cg2", expr(Nlp.bigrams("ct")))
      .withColumn("rg2", expr(Nlp.bigrams("rt")))
    def gramCounts(tokCol: String, bigCol: String, cntCol: String) = base
      .select(col("pair"), explode(concat(
          expr(s"transform($tokCol, x -> struct(1 AS n, x AS gram))"),
          expr(s"transform($bigCol, x -> struct(2 AS n, x AS gram))"))).as("t"))
      .select(col("pair"), col("t.n").as("n"), col("t.gram").as("gram"))
      .groupBy(col("pair"), col("n"), col("gram")).agg(count(lit(1)).as(cntCol))
      .localCheckpoint()
    val cc = gramCounts("ct", "cg2", "cc")
    val rc = gramCounts("rt", "rg2", "rc")
    val m = cc.join(rc, Seq("pair", "n", "gram"))
      .groupBy(col("pair"), col("n"))
      .agg(sum(least(col("cc"), col("rc"))).as("m"))
    val ctot = cc.groupBy(col("pair"), col("n")).agg(sum(col("cc")).as("ctot"))
    val rtot = rc.groupBy(col("pair"), col("n")).agg(sum(col("rc")).as("rtot"))
    rtot.join(ctot, Seq("pair", "n"))
      .join(m, Seq("pair", "n"), "left")
      .select(col("n"), coalesce(col("m"), lit(0L)).as("m"),
        col("ctot"), col("rtot"))
      .withColumn("r_bp", expr("10000 * m div rtot"))
      .withColumn("p_bp", expr("10000 * m div ctot"))
      .withColumn("f_bp", expr("20000 * m div (ctot + rtot)"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("pairs"),
        expr("sum(r_bp) div count(1)").as("recall_bp"),
        expr("sum(p_bp) div count(1)").as("precision_bp"),
        expr("sum(f_bp) div count(1)").as("f1_bp"))
      .orderBy(col("n"))
  }

  /** Even/odd document pairing — doc 2i is the CANDIDATE, 2i+1 its
    * REFERENCE — shared by every text-metric binding (ROUGE, chrF, WER)
    * so the pairing convention has one Spark source and one SQL source.
    */
  private def pairedDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.filter(col("doc_id") % 2 === 0)
      .select(expr("doc_id div 2").as("pair"), col("text").as("cand_text"))
      .join(d.filter(col("doc_id") % 2 === 1)
        .select(expr("doc_id div 2").as("pair"), col("text").as("ref_text")),
        "pair")
  }

  /** One side of the pairing as SQL: parity 0 = candidate, 1 = reference. */
  private def pairedSideSql(sel: String, parity: Int): String =
    s"SELECT doc_id // 2 AS pair, $sel FROM documents WHERE doc_id % 2 = $parity"

  private val qRouge = GraftQuery(
    "qml_rouge",
    (s, dir) => rougeNgram(pairedDocs(s, dir)),
    Some(s"""WITH cd AS (${pairedSideSql(s"${Nlp.toksSql} AS toks", 0)}),
      rd AS (${pairedSideSql(s"${Nlp.toksSql} AS toks", 1)}),
      cb AS (SELECT pair, toks, ${Nlp.bigramsSql("toks")} AS g2 FROM cd),
      rb AS (SELECT pair, toks, ${Nlp.bigramsSql("toks")} AS g2 FROM rd),
      c1 AS (SELECT pair, tok, COUNT(*) AS cc
        FROM (SELECT pair, unnest(toks) AS tok FROM cd) GROUP BY pair, tok),
      r1 AS (SELECT pair, tok, COUNT(*) AS rc
        FROM (SELECT pair, unnest(toks) AS tok FROM rd) GROUP BY pair, tok),
      m1 AS (SELECT pair, SUM(LEAST(cc, rc)) AS m
        FROM c1 JOIN r1 USING (pair, tok) GROUP BY pair),
      c2 AS (SELECT pair, g, COUNT(*) AS cc
        FROM (SELECT pair, unnest(g2) AS g FROM cb) GROUP BY pair, g),
      r2 AS (SELECT pair, g, COUNT(*) AS rc
        FROM (SELECT pair, unnest(g2) AS g FROM rb) GROUP BY pair, g),
      m2 AS (SELECT pair, SUM(LEAST(cc, rc)) AS m
        FROM c2 JOIN r2 USING (pair, g) GROUP BY pair),
      j1 AS (SELECT 1 AS n, COALESCE(m1.m, 0) AS m, len(cd.toks) AS ctot,
          len(rd.toks) AS rtot
        FROM rd JOIN cd USING (pair) LEFT JOIN m1 USING (pair)
        WHERE len(rd.toks) > 0 AND len(cd.toks) > 0),
      j2 AS (SELECT 2 AS n, COALESCE(m2.m, 0) AS m, len(cb.g2) AS ctot,
          len(rb.g2) AS rtot
        FROM rb JOIN cb USING (pair) LEFT JOIN m2 USING (pair)
        WHERE len(rb.g2) > 0 AND len(cb.g2) > 0),
      u AS (SELECT * FROM j1 UNION ALL SELECT * FROM j2),
      b AS (SELECT n, 10000 * m // rtot AS r_bp, 10000 * m // ctot AS p_bp,
          20000 * m // (ctot + rtot) AS f_bp FROM u)
      SELECT n, CAST(COUNT(*) AS BIGINT) AS pairs,
        CAST(SUM(r_bp) // COUNT(*) AS BIGINT) AS recall_bp,
        CAST(SUM(p_bp) // COUNT(*) AS BIGINT) AS precision_bp,
        CAST(SUM(f_bp) // COUNT(*) AS BIGINT) AS f1_bp
      FROM b GROUP BY n ORDER BY n"""))

  // ------------------------------------- split-conformal coverage audit
  /** Split-conformal prediction for a scored binary classifier (Vovk et
    * al.; Angelopoulos & Bates 2021 tutorial form): on a calibration
    * split, nonconformity of the TRUE class is a = −score for positives
    * and a = +score for negatives; q̂ is the ⌈(n+1)(1−α)⌉-th smallest
    * calibration nonconformity (if that rank exceeds n, every set is
    * the full label set — q̂ = NULL here); a test point's prediction
    * SET contains class y iff a_y ≤ q̂. The guarantee P(true ∈ set) ≥
    * 1 − α holds distribution-free — this op is the audit that it does,
    * plus the efficiency readout (set sizes) that tells whether the
    * scores are actually informative.
    *
    * Exactness: scores are integer, so q̂ is an exact order statistic —
    * computed distributed as min{a : cum(a) ≥ k} over the value-
    * collapsed nonconformity domain via [[Scans.rangedCumSum]] (never a
    * global sort); k comes from a 1-row broadcast count. Everything
    * downstream is one test-split scan against the broadcast q̂.
    *
    * Output (1 row): (n_cal, n_test, qhat, coverage_bp, avg_set_bp,
    * n_both, n_empty).
    */
  def conformalCoverage(scored: DataFrame, alphaBp: Int = 1000,
      idCol: String = "doc_id", scoreCol: String = "score",
      labelCol: String = "label"): DataFrame = {
    require(alphaBp > 0 && alphaBp < 10000, s"alphaBp in (0,10000): $alphaBp")
    val s0 = scored.select(col(idCol).cast("long").as("id"),
      col(scoreCol).cast("long").as("s"), col(labelCol).cast("boolean").as("y"))
    val cal = s0.filter(col("id") % 2 === 0)
    val tst = s0.filter(col("id") % 2 =!= 0)
    val gc = cal.select(when(col("y"), -col("s")).otherwise(col("s")).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("k"))
    val tot = gc.agg(sum(col("k")).as("n_cal")).localCheckpoint()
    val qhat = Scans.rangedCumSum(gc, "a", col("k"), "cw")
      .crossJoin(broadcast(tot))
      .withColumn("kk",
        expr(s"((n_cal + 1) * ${10000 - alphaBp} + 9999) div 10000"))
      .agg(min(when(col("cw") >= col("kk"), col("a"))).as("qhat"),
        max(col("n_cal")).as("n_cal"))
      .localCheckpoint()
    tst.crossJoin(broadcast(qhat))
      .withColumn("pos_in", col("qhat").isNull || (-col("s") <= col("qhat")))
      .withColumn("neg_in", col("qhat").isNull || (col("s") <= col("qhat")))
      .withColumn("covered", when(col("y"), col("pos_in")).otherwise(col("neg_in")))
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        max(col("qhat")).as("qhat"),
        expr("10000 * sum(case when covered then 1 else 0 end) div count(1)")
          .as("coverage_bp"),
        expr("""10000 * sum((case when pos_in then 1 else 0 end)
            + (case when neg_in then 1 else 0 end)) div count(1)""")
          .as("avg_set_bp"),
        sum(when(col("pos_in") && col("neg_in"), 1L).otherwise(0L)).as("n_both"),
        sum(when(!col("pos_in") && !col("neg_in"), 1L).otherwise(0L))
          .as("n_empty"))
  }

  /** Conformal audit of the distilled quality filter at α = 10 %:
    * even doc_ids calibrate, odd doc_ids test (the id-parity split —
    * the same randomized-assignment shape as qe_logrank's arms).
    * Coverage ≥ ~9000 bp is the distribution-free guarantee showing
    * up in the data; avg_set_bp near 10⁴ (sets of one) is the
    * efficiency read.
    */
  private val qConformal = GraftQuery(
    "qml_conformal",
    (s, dir) => conformalCoverage(LearnOps.scoredDocs(s, dir)),
    Some(s"""WITH ${LearnOps.scoredCte},
      cset AS (SELECT CASE WHEN lab = 1 THEN -score ELSE score END AS a
        FROM cal WHERE doc_id % 2 = 0),
      nct AS (SELECT COUNT(*) AS n_cal FROM cset),
      kk AS (SELECT ((n_cal + 1) * 9000 + 9999) // 10000 AS k FROM nct),
      rk AS (SELECT a, ROW_NUMBER() OVER (ORDER BY a) AS rn FROM cset),
      qh AS (SELECT (SELECT a FROM rk, kk WHERE rn = kk.k) AS qhat),
      tst AS (SELECT score AS s, lab FROM cal WHERE doc_id % 2 <> 0),
      mm AS (SELECT s, lab,
          (qhat IS NULL OR -s <= qhat) AS pos_in,
          (qhat IS NULL OR s <= qhat) AS neg_in
        FROM tst, qh)
      SELECT (SELECT CAST(n_cal AS BIGINT) FROM nct) AS n_cal,
        CAST(COUNT(*) AS BIGINT) AS n_test,
        (SELECT CAST(qhat AS BIGINT) FROM qh) AS qhat,
        CAST(10000 * SUM(CASE WHEN (CASE WHEN lab = 1 THEN pos_in
            ELSE neg_in END) THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
          AS coverage_bp,
        CAST(10000 * SUM((CASE WHEN pos_in THEN 1 ELSE 0 END)
            + (CASE WHEN neg_in THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
          AS avg_set_bp,
        CAST(SUM(CASE WHEN pos_in AND neg_in THEN 1 ELSE 0 END) AS BIGINT)
          AS n_both,
        CAST(SUM(CASE WHEN NOT pos_in AND NOT neg_in THEN 1 ELSE 0 END)
          AS BIGINT) AS n_empty
      FROM mm"""))

  // ------------------------------------------------ pass@k estimator
  /** The ∏-form factors of the unbiased pass@k estimator (Chen et al.
    * 2021, "Evaluating Large Language Models Trained on Code", eq. 1):
    *
    *   pass@k = 1 − C(n−c, k)/C(n, k) = 1 − ∏_{i=0..k−1} (n−c−i)/(n−i)
    *
    * emitted as one UNROLLED product expression so both engines compute
    * the identical exact integer rational (no floating C(n,k), which the
    * naive binomial form overflows/rounds — the paper's own numpy note).
    * GREATEST(·,0) zeroes the numerator when fewer than k failures
    * exist (pass@k = 1 exactly). 128-bit products (DECIMAL(38,0) here,
    * HUGEINT in the oracle) hold only while n^kmax < 10³⁴ — ~2,500
    * samples per task at k = 10 — and a loud bounds require below
    * refuses beyond that rather than letting non-ANSI decimal NULLs
    * silently deflate the macro mean.
    */
  private def passProd(base: String, k: Int, duck: Boolean): String = {
    val cast = if (duck) "HUGEINT" else "decimal(38,0)"
    (0 until k).map(i =>
      s"greatest(cast(($base - $i) as $cast), cast(0 as $cast))")
      .mkString(" * ")
  }

  /** Unbiased pass@k over repeated samples per task: n = samples drawn,
    * c = samples passing, estimator macro-averaged over tasks (the
    * paper's protocol). Tasks with n < max(ks) are excluded — the
    * estimator is undefined below k draws. Output (1 row): n_tasks and
    * one macro-mean basis-point column per k.
    */
  def passAtK(samples: DataFrame, taskCol: String, okCol: Column,
      ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val kmax = ks.max
    val perTask = samples
      .groupBy(col(taskCol).as("task"))
      .agg(count(lit(1)).as("n"),
        sum(okCol.cast("int")).as("c"))
      .filter(col("n") >= kmax)
      .localCheckpoint()
    // Loud overflow bound: 10^4 · ∏_{i<kmax}(n−i) must fit DECIMAL(38,0).
    // Past it Spark's non-ANSI decimal multiply returns NULL, sum() skips
    // the task but count() still divides by it, and the macro mean
    // deflates SILENTLY (the oracle's HUGEINT at least errors) — so the
    // operator refuses instead: n^kmax < 10^34 ⇒ n < 10^(34/kmax).
    val nCap = math.pow(10, 34.0 / kmax).toLong
    val mx = perTask.agg(max(col("n"))).head()
    if (!mx.isNullAt(0)) require(mx.getLong(0) < nCap,
      s"passAtK: a task has n=${mx.getLong(0)} samples; the unrolled " +
        s"exact product overflows 128-bit past n=$nCap at k=$kmax — " +
        "subsample tasks or lower max(ks)")
    val passCols = ks.map { k =>
      expr(s"""cast(10000 * ((${passProd("n", k, duck = false)})
        - (${passProd("n - c", k, duck = false)}))
        div (${passProd("n", k, duck = false)}) as bigint)""")
        .as(s"p$k")
    }
    val aggCols = ks.map(k => expr(s"sum(p$k) div count(1)")
      .cast("long").as(s"pass_at_${k}_bp"))
    perTask.select(col("task") +: passCols: _*)
      .agg(count(lit(1)).as("n_tasks"), aggCols: _*)
  }

  /** pass@{1,5,10} with events as the eval harness: each user is a
    * "task", each of their events a sample, a purchase a pass — the
    * estimator exercised end-to-end on corpus-scaled grouping (one
    * exchange on the task key, then a 1-row rollup).
    */
  private val qPassAtK = GraftQuery(
    "qml_pass_at_k",
    (s, dir) => passAtK(Tables.events(s, dir), "user_id",
      col("event_type") === "purchase"),
    Some(s"""WITH t AS (SELECT user_id, COUNT(*) AS n,
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      FROM events GROUP BY 1 HAVING COUNT(*) >= 10),
    p AS (SELECT
        10000 * ((${passProd("n", 1, duck = true)})
          - (${passProd("n - c", 1, duck = true)}))
          // (${passProd("n", 1, duck = true)}) AS p1,
        10000 * ((${passProd("n", 5, duck = true)})
          - (${passProd("n - c", 5, duck = true)}))
          // (${passProd("n", 5, duck = true)}) AS p5,
        10000 * ((${passProd("n", 10, duck = true)})
          - (${passProd("n - c", 10, duck = true)}))
          // (${passProd("n", 10, duck = true)}) AS p10
      FROM t)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tasks,
      CAST(SUM(p1) // COUNT(*) AS BIGINT) AS pass_at_1_bp,
      CAST(SUM(p5) // COUNT(*) AS BIGINT) AS pass_at_5_bp,
      CAST(SUM(p10) // COUNT(*) AS BIGINT) AS pass_at_10_bp
    FROM p"""))

  // ----------------------------------------------------- chrF (chrF2)
  /** chrF (Popović 2015, WMT's character n-gram F-score): whitespace
    * is stripped, character n-grams n = 1..6 counted WITH multiplicity,
    * per-order precision/recall from clipped matches, means over orders,
    * then F_β with β = 2 (chrF2, the sacrebleu default). All integer:
    * per-order ratios in micro-units (10⁶·m div total), order-mean by
    * integer division over the order count (orders with an empty side
    * are skipped on BOTH sides — same convention both engines), final
    *
    *   chrF2 = 5·P·R div (4·P + R)   (micro-units)
    *
    * Scale: ZERO SHUFFLE — the clipped-match count per order runs
    * directly on the two strings in the native codegen'd
    * [[graft.functions.CharGramClipped]] kernel (one hash-count pass
    * per order, no gram arrays, no sorts, no interpreted lambdas), so
    * the whole metric is scan-priced. Two slower shapes were measured
    * on the way here and are documented on the kernel: explode +
    * grouped-count + join (10 s at sf0.1 — every gram occurrence
    * through an exchange), and in-row HOF gram arrays (8 s — the
    * interpreted-lambda evaluator, not the data). The oracle keeps the
    * explode-and-join formulation: two independent derivations of the
    * same integers is the stronger gate.
    * Output: (pair, n_orders, p_micro, r_micro, chrf_micro) per pair.
    */
  def chrF(pairs: DataFrame, maxN: Int = 6,
      candCol: String = "cand_text", refCol: String = "ref_text"): DataFrame = {
    def strip(c: String) = regexp_replace(col(c), "\\s+", "")
    val base = pairs.select(col("pair"), strip(candCol).as("ct"),
      strip(refCol).as("rt"))
    val withM = (1 to maxN).foldLeft(base) { (d, n) =>
      d.withColumn(s"m$n", graft.functions.GraftFunctions
          .graft_chargram_clipped(col("ct"), col("rt"), n).cast("long"))
        .withColumn(s"ct$n",
          greatest(length(col("ct")) - (n - 1), lit(0)).cast("long"))
        .withColumn(s"rt$n",
          greatest(length(col("rt")) - (n - 1), lit(0)).cast("long"))
    }
    // Barrier before the combine: p/r/chrf reference every m_n several
    // times and CollapseProject would re-evaluate the kernel per
    // reference without it.
    val scored = withM.drop("ct", "rt").localCheckpoint()
    def valid(n: Int) = s"ct$n > 0 and rt$n > 0"
    val nOrders = (1 to maxN)
      .map(n => s"(case when ${valid(n)} then 1 else 0 end)").mkString(" + ")
    def meanOf(tot: String) = (1 to maxN)
      .map(n => s"(case when ${valid(n)} then 1000000 * m$n div $tot$n else 0 end)")
      .mkString("(", " + ", s") div n_orders")
    scored
      .withColumn("n_orders", expr(s"cast($nOrders as bigint)"))
      .filter(col("n_orders") > 0)
      .withColumn("p_micro", expr(meanOf("ct")))
      .withColumn("r_micro", expr(meanOf("rt")))
      .withColumn("chrf_micro",
        when(col("p_micro") * 4 + col("r_micro") > 0,
          expr("5 * p_micro * r_micro div (4 * p_micro + r_micro)"))
          .otherwise(lit(0L)))
      .select(col("pair"), col("n_orders"), col("p_micro"), col("r_micro"),
        col("chrf_micro"))
      .orderBy(col("pair"))
  }

  private val qChrf = GraftQuery(
    "qml_chrf",
    (s, dir) => chrF(pairedDocs(s, dir)),
    Some {
      val gramsN = (1 to 6).map(n =>
        s"""SELECT pair, $n AS n, unnest(list_transform(
            generate_series(1, GREATEST(length(t) - ${n - 1}, 0)),
            i -> substr(t, i, $n))) AS g FROM src""").mkString("\n      UNION ALL ")
      val totsN = (1 to 6).map(n =>
        s"""SELECT pair, $n AS n,
            GREATEST(length(ct) - ${n - 1}, 0) AS ctot,
            GREATEST(length(rt) - ${n - 1}, 0) AS rtot FROM b""")
        .mkString("\n      UNION ALL ")
      s"""WITH b AS MATERIALIZED (SELECT c.pair,
          regexp_replace(c.text, '\\s+', '', 'g') AS ct,
          regexp_replace(r.text, '\\s+', '', 'g') AS rt
        FROM (${pairedSideSql("text", 0)}) c
        JOIN (${pairedSideSql("text", 1)}) r USING (pair)),
      cgr AS (WITH src AS (SELECT pair, ct AS t FROM b) $gramsN),
      rgr AS (WITH src AS (SELECT pair, rt AS t FROM b) $gramsN),
      cc AS (SELECT pair, n, g, COUNT(*) AS cc FROM cgr GROUP BY 1, 2, 3),
      rc AS (SELECT pair, n, g, COUNT(*) AS rc FROM rgr GROUP BY 1, 2, 3),
      m AS (SELECT pair, n, SUM(LEAST(cc, rc)) AS m
        FROM cc JOIN rc USING (pair, n, g) GROUP BY 1, 2),
      tt AS ($totsN),
      pn AS (SELECT pair,
          1000000 * COALESCE(m, 0) // ctot AS p_n,
          1000000 * COALESCE(m, 0) // rtot AS r_n
        FROM tt LEFT JOIN m USING (pair, n)
        WHERE ctot > 0 AND rtot > 0),
      agg AS (SELECT pair, COUNT(*) AS n_orders,
          SUM(p_n) // COUNT(*) AS p_micro, SUM(r_n) // COUNT(*) AS r_micro
        FROM pn GROUP BY pair)
      SELECT CAST(pair AS BIGINT) AS pair, CAST(n_orders AS BIGINT) AS n_orders,
        CAST(p_micro AS BIGINT) AS p_micro, CAST(r_micro AS BIGINT) AS r_micro,
        CAST(CASE WHEN 4 * p_micro + r_micro > 0
          THEN 5 * p_micro * r_micro // (4 * p_micro + r_micro)
          ELSE 0 END AS BIGINT) AS chrf_micro
      FROM agg ORDER BY pair"""
    })

  // ------------------------------------------------- word error rate
  /** Word error rate: token-level Levenshtein distance over whitespace
    * tokens, normalized by reference length — THE speech/translation
    * transcript metric (NIST scoring convention; edits counted over
    * words, not characters). The distance runs in the native codegen'd
    * [[graft.functions.TokenLevenshtein]] kernel (one O(|c|·|r|) DP per
    * pair on interned token ids — no UDF boxing, no character remap);
    * the oracle remaps each pair's token vocabulary to single ASCII
    * BYTES and uses DuckDB's `levenshtein` (byte-based — measured:
    * chr(4000) vs 'ab' scores 3, so multi-byte codepoints are out),
    * which is the same distance by construction while the pair
    * vocabulary fits printable ASCII; a loud in-oracle guard fails the
    * ORACLE (not the engine) if a pair ever exceeds that budget.
    * wer_bp can exceed 10⁴ (a
    * hypothesis much longer than its reference — standard).
    * Output: (pair, n_edits, ref_len, wer_bp) per pair with a
    * non-empty reference.
    */
  def wordErrorRate(pairs: DataFrame, candCol: String = "cand_text",
      refCol: String = "ref_text"): DataFrame =
    pairs.select(col("pair"),
        expr(Nlp.toksExprOn(candCol)).as("ctoks"),
        expr(Nlp.toksExprOn(refCol)).as("rtoks"))
      .filter(size(col("rtoks")) > 0)
      .select(col("pair"),
        graft.functions.GraftFunctions
          .graft_token_levenshtein(col("ctoks"), col("rtoks"))
          .cast("long").as("n_edits"),
        size(col("rtoks")).cast("long").as("ref_len"))
      .withColumn("wer_bp", expr("10000 * n_edits div ref_len"))
      .orderBy(col("pair"))

  private val qWer = GraftQuery(
    "qml_wer",
    (s, dir) => wordErrorRate(pairedDocs(s, dir)),
    Some(s"""WITH b AS MATERIALIZED (SELECT c.pair, c.toks AS ctoks,
          r.toks AS rtoks
        FROM (${pairedSideSql(s"${Nlp.toksSql} AS toks", 0)}) c
        JOIN (${pairedSideSql(s"${Nlp.toksSql} AS toks", 1)}) r USING (pair)
        WHERE len(r.toks) > 0),
      -- per-pair token vocabulary -> one printable-ASCII BYTE per token
      -- (DuckDB levenshtein counts bytes, so codepoints > 127 are out)
      vocab AS MATERIALIZED (SELECT pair, tok,
          32 + ROW_NUMBER() OVER (PARTITION BY pair ORDER BY tok) AS cp
        FROM (SELECT DISTINCT pair, unnest(ctoks) AS tok FROM b
          UNION SELECT DISTINCT pair, unnest(rtoks) AS tok FROM b)),
      cposs AS (SELECT pair, generate_subscripts(ctoks, 1) AS i,
        unnest(ctoks) AS tok FROM b),
      rposs AS (SELECT pair, generate_subscripts(rtoks, 1) AS i,
        unnest(rtoks) AS tok FROM b),
      cstr AS (SELECT pair,
          COALESCE(string_agg(chr(CAST(cp AS INT)), '' ORDER BY i), '') AS s
        FROM cposs JOIN vocab USING (pair, tok) GROUP BY pair),
      rstr AS (SELECT pair, string_agg(chr(CAST(cp AS INT)), '' ORDER BY i)
          AS s
        FROM rposs JOIN vocab USING (pair, tok) GROUP BY pair)
      SELECT CAST(b.pair AS BIGINT) AS pair,
        CAST(CASE WHEN (SELECT MAX(cp) FROM vocab) <= 126
          THEN levenshtein(COALESCE(c.s, ''), r.s)
          ELSE CAST('wer-oracle-vocab-exceeds-ascii' AS BIGINT) END
          AS BIGINT) AS n_edits,
        CAST(len(b.rtoks) AS BIGINT) AS ref_len,
        CAST(10000 * levenshtein(COALESCE(c.s, ''), r.s)
          // len(b.rtoks) AS BIGINT) AS wer_bp
      FROM b LEFT JOIN cstr c USING (pair) JOIN rstr r USING (pair)
      ORDER BY pair"""))

  // ------------------------------------------------- ROUGE-L (LCS-based)
  /** Macro-averaged ROUGE-L (Lin, ACL 2004 wksp §3.1) — the LCS member
    * of the ROUGE family: credits matches that are IN ORDER but not
    * necessarily contiguous, sitting between [[rougeNgram]]'s exact
    * n-gram hits and [[wordErrorRate]]'s alignment cost. Per pair:
    * recall = LCS/|ref|, precision = LCS/|cand|, F = 2·LCS/(|c|+|r|)
    * (the harmonic identity — exact), floored to bp and macro-averaged
    * (composed-floors convention, same as ROUGE-N).
    *
    * The LCS runs in the native codegen'd [[graft.functions.TokenLcs]]
    * kernel (one O(|c|·|r|) two-row max DP per pair over interned token
    * ids — map-only, no UDF boxing, no join). The oracle computes the
    * same DP as a bounded recursive CTE: one row per (pair, prefix i),
    * each step deriving DP row i+1 from row i with the running-max
    * identity d[i][j] = max_{k≤j} max(d[i−1][k], d[i−1][k−1] + eq_k) —
    * the column-prefix dependency unrolled so a single nested
    * list_transform expresses the row.
    *
    * Output: ONE row — (pairs, recall_bp, precision_bp, f1_bp) over all
    * pairs with both sides non-empty.
    */
  def rougeL(pairs: DataFrame, candCol: String = "cand_text",
      refCol: String = "ref_text"): DataFrame =
    pairs.select(col("pair"),
        expr(Nlp.toksExprOn(candCol)).as("ctoks"),
        expr(Nlp.toksExprOn(refCol)).as("rtoks"))
      .filter(size(col("ctoks")) > 0 && size(col("rtoks")) > 0)
      .select(col("pair"),
        graft.functions.GraftFunctions
          .graft_token_lcs(col("ctoks"), col("rtoks"))
          .cast("long").as("lcs"),
        size(col("ctoks")).cast("long").as("ctot"),
        size(col("rtoks")).cast("long").as("rtot"))
      .withColumn("r_bp", expr("10000 * lcs div rtot"))
      .withColumn("p_bp", expr("10000 * lcs div ctot"))
      .withColumn("f_bp", expr("20000 * lcs div (ctot + rtot)"))
      .agg(count(lit(1)).as("pairs"),
        expr("sum(r_bp) div count(1)").as("recall_bp"),
        expr("sum(p_bp) div count(1)").as("precision_bp"),
        expr("sum(f_bp) div count(1)").as("f1_bp"))

  private val qRougeL = GraftQuery(
    "qml_rouge_l",
    (s, dir) => rougeL(pairedDocs(s, dir)),
    Some(s"""WITH RECURSIVE
      cd AS (${pairedSideSql(s"${Nlp.toksSql} AS ctoks", 0)}),
      rd AS (${pairedSideSql(s"${Nlp.toksSql} AS rtoks", 1)}),
      b AS MATERIALIZED (SELECT pair, ctoks, rtoks FROM cd JOIN rd USING (pair)
        WHERE len(ctoks) > 0 AND len(rtoks) > 0),
      dp AS (
        SELECT pair, 0 AS i, ctoks, rtoks,
          list_transform(generate_series(0, len(rtoks)), x -> 0) AS row
        FROM b
        UNION ALL
        SELECT pair, i + 1, ctoks, rtoks,
          list_prepend(0, list_transform(generate_series(1, len(rtoks)), j ->
            list_max(list_transform(generate_series(1, j), k ->
              greatest(row[k + 1], row[k] + CASE WHEN rtoks[k] = ctoks[i + 1]
                THEN 1 ELSE 0 END)))))
        FROM dp WHERE i < len(ctoks)),
      fin AS (SELECT pair, row[len(rtoks) + 1] AS lcs,
          len(ctoks) AS ctot, len(rtoks) AS rtot
        FROM dp WHERE i = len(ctoks))
      SELECT CAST(COUNT(*) AS BIGINT) AS pairs,
        CAST(SUM(10000 * lcs // rtot) // COUNT(*) AS BIGINT) AS recall_bp,
        CAST(SUM(10000 * lcs // ctot) // COUNT(*) AS BIGINT) AS precision_bp,
        CAST(SUM(20000 * lcs // (ctot + rtot)) // COUNT(*) AS BIGINT) AS f1_bp
      FROM fin"""))

  val queries: Seq[GraftQuery] = Seq(qAuc, qPrCurve, qKappa, qBradleyTerry,
    qMcNemar, qBleu, qCronbach, qKrippendorff, qKendallW, qRouge, qRougeL,
    qConformal, qPassAtK, qChrf, qWer)
}
