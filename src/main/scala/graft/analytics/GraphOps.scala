package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.GraftQuery

/** Graph operators over edge-list DataFrames — the iterative-linear-algebra
  * class (complementing [[DedupOps.nearDupClusters]]' connected
  * components): PageRank with EXACT integer fixed-point arithmetic.
  *
  * Floating-point PageRank is not reproducible on a cluster (per-target
  * contribution sums depend on shuffle order), so ranks are carried as
  * BIGINT fixed-point units (`scale` = 10¹²): contributions use integer
  * division, per-target sums are exact, and the damping update is pure
  * integer arithmetic — bit-identical across engines, partitionings, and
  * retries, and hash-comparable by the gate with no float concerns.
  *
  * Scale shape per iteration: one hash join of the edge list with the
  * rank/degree frames (all keyed by node id — uniform after the
  * symmetrize-or-handle-dangling contract below) + one uniform-key
  * aggregation; rank state is 16 bytes/node. The classic
  * power-iteration-on-MapReduce shape.
  *
  * Contract: every node must have out-degree ≥ 1 (no dangling mass) —
  * symmetrize the edge list (as the binding does) or add self-loops
  * before calling. Zero IN-degree is fine: such nodes hold the base
  * (teleport) mass and keep contributing.
  */
object GraphOps {

  /** `iters` exact fixed-point PageRank rounds (damping 0.85) over a
    * directed edge list. Output: (node, rank_int) where rank ≈
    * rank_int / scale.
    */
  def pageRank(edgesIn: DataFrame, iters: Int = 3,
      srcCol: String = "src", dstCol: String = "dst",
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    // Truncate lineage like nearDupClusters: without the checkpoints,
    // iteration k's plan re-derives edges/deg/ranks k times over and the
    // 3-round binding measured 9.4 s at sf0.1; with them, each round costs
    // one join + one aggregation over materialized inputs (~3×  less).
    val edges = edgesIn.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    // ONE scalar to the driver (node count), like the centroid literals —
    // not a driver-side loop over data.
    val n = deg.count()
    require(n > 0, "empty edge list")
    val r0 = scale / n
    val base = (15L * r0) / 100L
    val nodes = deg.select(col("src").as("node")).localCheckpoint()
    var ranks = nodes.withColumn("r", lit(r0))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      // left join back to the FULL node set: a zero-in-degree node gets
      // the base (teleport) mass and keeps contributing — dropping it
      // (an inner shape) would silently delete its rank AND its outgoing
      // mass from iteration 2 on
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank_int"))
  }

  // ==================== driver-checked binding =======================

  // Customer↔supplier trade graph: an edge per distinct (customer,
  // supplier) pair that shares an order, symmetrized so no node dangles.
  // Node ids are parity-disambiguated (customers even, suppliers odd).
  private val Iters = 3
  private val Scale = 1000000000000L

  private def tradeEdges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val e0 = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  // Mirrors the Scala iteration shape exactly: LEFT JOIN back to the full
  // node set (zero-in-degree nodes keep their teleport mass), and every
  // round's rank is CAST to BIGINT — DuckDB's SUM(BIGINT) widens to
  // HUGEINT, which the gate's pandas conversion turns into float64 and
  // hash-mismatches against Spark's int64 even on identical values.
  private def itSql(prev: String, out: String) =
    s"""$out AS (SELECT nodes.node,
      CAST(bs + (85 * COALESCE(t.s, 0)) // 100 AS BIGINT) AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, SUM($prev.r // deg.d) AS s FROM e
          JOIN $prev ON e.src = $prev.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) t ON nodes.node = t.node CROSS JOIN b)"""

  private val prSql = s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
      l_suppkey * 2 + 1 AS dst FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM deg),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    b AS (SELECT (15 * (${Scale} // n)) // 100 AS bs FROM nn),
    r0 AS (SELECT src AS node, CAST(${Scale} // n AS BIGINT) AS r FROM deg, nn),
    ${itSql("r0", "r1")},
    ${itSql("r1", "r2")},
    ${itSql("r2", "r3")}
    SELECT node, r AS rank_int FROM r3 ORDER BY rank_int DESC, node LIMIT 20"""

  private val qPageRank = GraftQuery(
    "qg_pagerank",
    (s, dir) => pageRank(tradeEdges(s, dir), Iters)
      .orderBy(col("rank_int").desc, col("node"))
      .limit(20),
    Some(prSql))

  def queries: Seq[GraftQuery] = Seq(qPageRank)
}
