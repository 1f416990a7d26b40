package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import DedupOps.{dotFold, dotFoldSql, normFold, normFoldSql}
import Nlp.{h60, h60Sql}

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two tiers:
  *  - `qs_topk_bruteforce`: exact cosine top-k for a small query set. The
  *    query side is tiny → broadcast; the corpus is scanned once, never
  *    collected. Correctness baseline for the ANN tier.
  *  - `qs_ann_lsh`: random-hyperplane LSH. Hyperplanes are derived
  *    deterministically from md5 (so both engines — and every executor —
  *    agree without shipping a matrix). Each vector gets a 4-bit bucket
  *    (map-only); candidates co-located by a shuffle on bucket; exact
  *    rerank inside the bucket. At 100 TB the bucket join replaces the
  *    O(n·q) brute-force scan; recall tunes with planes/bands.
  */
object SimilarityOps {

  private val NQ = 20   // query vectors: vec_id < NQ
  private val K = 5

  private val cosineCol =
    expr(dotFold) / (sqrt(expr(normFold("va"))) * sqrt(expr(normFold("vb"))))
  private val cosineSql =
    s"$dotFoldSql / (sqrt(${normFoldSql("va")}) * sqrt(${normFoldSql("vb")}))"

  private val qBrute = GraftQuery(
    "qs_topk_bruteforce",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("v").as("va"))
      val pairs = e.select(col("vec_id").as("cand_id"), col("v").as("vb"))
        .crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cosine", cosineCol)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM e q JOIN e c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    sc AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""))

  // 4 md5-derived hyperplanes; weight(p, i) ∈ [-1000, 1000]/1000.
  private val planeW =
    s"transform(sequence(0, 3), p -> transform(sequence(0, 63), i -> " +
      s"cast(${h60("concat('plane', cast(p as string), '_', cast(i as string))")} % 2001 - 1000 as double) / 1000.0))"
  private val bucketExpr =
    s"aggregate(sequence(0, 3), 0, (acc, p) -> acc + CASE WHEN " +
      s"aggregate(zip_with(w[p], v, (x, y) -> x * y), cast(0 as double), (a, t) -> a + t) >= 0 " +
      s"THEN shiftleft(1, p) ELSE 0 END)"

  private val planeWSql =
    s"list_transform(generate_series(0, 3), p -> list_transform(generate_series(0, 63), i -> " +
      s"CAST(${h60Sql("'plane' || p || '_' || i")} % 2001 - 1000 AS DOUBLE) / 1000.0))"
  private val bucketSql =
    s"CAST(list_sum(list_transform(generate_series(1, 4), p -> CASE WHEN " +
      s"list_reduce(list_transform(generate_series(1, 64), i -> w[p][i] * v[i]), (a, b) -> a + b) >= 0 " +
      s"THEN (1 << (p - 1)) ELSE 0 END)) AS INTEGER)"

  private val qAnnLsh = GraftQuery(
    "qs_ann_lsh",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("w", expr(planeW))
        .withColumn("bucket", expr(bucketExpr))
        .select(col("vec_id"), col("v"), col("bucket"))
      val q = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("v").as("va"), col("bucket"))
      val cands = e.select(col("vec_id").as("cand_id"), col("v").as("vb"), col("bucket"))
      val pairs = cands.join(broadcast(q), Seq("bucket"))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cosine", cosineCol)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pw AS (SELECT $planeWSql AS w),
    e AS (SELECT vec_id, v, $bucketSql AS bucket FROM e0, pw),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    sc AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""))

  val queries: Seq[GraftQuery] = Seq(qBrute, qAnnLsh)
}
