package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.SketchOps

/** Contract pins for the two mergeable-summary TypedImperativeAggregates:
  * Misra–Gries (FreqItemsMG) and t-digest (TDigestQuantiles). Inputs are
  * spread over many partitions so map-side partials + the merge path are
  * genuinely exercised; every assertion is an order/merge-tree-independent
  * guarantee (the engine is free to reshape execution).
  */
class SketchAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // Zipf-ish stream: item i appears ~N/(i+1) times, i in 0..49
  private def skewed = {
    import spark.implicits._
    (0 until 50).flatMap(i => Seq.fill(1000 / (i + 1))(s"item_$i"))
      .toDF("item").repartition(8)
  }

  test("Misra-Gries: est <= true, deficit <= N/(k+1), size <= k, heavy retained") {
    import spark.implicits._
    val k = 10
    val df = skewed
    val n = df.count()
    val exact = df.groupBy("item").count().as[(String, Long)].collect().toMap
    val mg = df.agg(FreqItemsAgg.graft_freq_items(col("item"), k).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(mg.size <= k, s"summary exceeded k: ${mg.size}")
    mg.foreach { case (item, est) =>
      val t = exact(item)
      assert(est <= t, s"$item est $est above true $t")
      assert(t - est <= n / (k + 1) + 1, s"$item deficit ${t - est} > N/(k+1)")
    }
    // guaranteed retention: true count > N/(k+1)
    exact.filter(_._2 * (k + 1) > n).keys.foreach { hot =>
      assert(mg.contains(hot), s"guaranteed heavy hitter $hot missing from $mg")
    }
  }

  test("heavyHitters op: contract flags all true on custom columns") {
    import spark.implicits._
    val df = skewed.withColumnRenamed("item", "sku")
    val out = SketchOps.heavyHitters(df, col("sku"), k = 10)
      .as[(String, Long, Boolean, Boolean, Boolean)].collect()
    assert(out.nonEmpty, "no heavy hitters surfaced on a zipf stream")
    out.foreach { case (item, _, inSum, le, bound) =>
      assert(inSum && le && bound, s"contract violated for $item: $inSum $le $bound")
    }
  }

  test("t-digest: rank brackets hold on a shuffled uniform domain") {
    import spark.implicits._
    val n = 20000
    // deterministic shuffle of 1..n via multiplicative hash ordering
    val df = (1 to n).sortBy(i => (i * 2654435761L) & 0xffffffffL)
      .toDF("x").repartition(16).select(col("x").cast("double").as("x"))
    val est = df.agg(TDigestAgg.graft_tdigest(col("x"), 200,
        Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)).as("q"))
      .select(explode(col("q"))).as[Double].collect()
    val want = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    want.zip(est).foreach { case (q, e) =>
      // rank error under 1 percentile point on uniform data at delta=200
      val lo = (q - 0.01) * n
      val hi = (q + 0.01) * n + 1
      assert(e >= lo && e <= hi, s"q=$q est $e outside rank bracket [$lo,$hi]")
    }
  }

  test("t-digest: group state stays O(delta) — serialized digest is small") {
    val buf = new TDigestBuf(100)
    (1 to 100000).foreach(i => buf.add(i.toDouble, 1L))
    buf.compress()
    assert(buf.n < 300, s"digest centroid count ${buf.n} not O(delta)")
    // serialize round-trip preserves total weight and quantile estimates
    val w = (0 until buf.n).map(buf.weights(_)).sum
    assert(w == 100000L, s"total weight drifted: $w")
  }

  test("bitmap pages: exact card across boundaries, negatives, dup, any merge order") {
    import scala.jdk.CollectionConverters._
    // ids straddling page boundaries (4095/4096), negatives, duplicates
    val ids = Seq(0L, 1L, 63L, 64L, 4095L, 4096L, 4097L, -1L, -4096L,
      -4097L, 1L, 4095L, Long.MaxValue, Long.MinValue)
    val b = new java.util.HashMap[java.lang.Long, Array[Long]]()
    ids.foreach(BitmapPages.add(b, _))
    assert(BitmapPages.cardinality(b) == ids.distinct.size.toLong)
    // serialize round-trip is lossless (sparse pages stay sparse)
    val rt = BitmapPages.deserialize(BitmapPages.serialize(b))
    assert(BitmapPages.cardinality(rt) == ids.distinct.size.toLong)
    assert(rt.keySet().asScala == b.keySet().asScala)
    // merge = OR: idempotent, order-independent
    val left = new java.util.HashMap[java.lang.Long, Array[Long]]()
    val right = new java.util.HashMap[java.lang.Long, Array[Long]]()
    ids.take(7).foreach(BitmapPages.add(left, _))
    ids.drop(5).foreach(BitmapPages.add(right, _))
    val m1 = BitmapPages.deserialize(BitmapPages.serialize(left))
    BitmapPages.mergeInto(m1, right)
    val m2 = BitmapPages.deserialize(BitmapPages.serialize(right))
    BitmapPages.mergeInto(m2, left)
    assert(BitmapPages.cardinality(m1) == ids.distinct.size.toLong)
    assert(BitmapPages.cardinality(m2) == BitmapPages.cardinality(m1))
    BitmapPages.mergeInto(m1, m2)   // self-ish merge: idempotent
    assert(BitmapPages.cardinality(m1) == ids.distinct.size.toLong)
  }

  test("graft_bitmap_distinct == countDistinct through real shuffled merges") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // clustered ids (dense pages) + scattered outliers, with repeats
    val ids = (1 to 20000).map(_ => rnd.nextInt(5000).toLong) ++
      (1 to 500).map(_ => rnd.nextLong()) ++
      (1 to 20000).map(_ => rnd.nextInt(5000).toLong)
    val df = ids.zipWithIndex.map { case (id, i) => (i % 7, id) }
      .toDF("g", "id").repartition(8)
    val got = df.groupBy(col("g"))
      .agg(BitmapAgg.graft_bitmap_distinct(col("id")).as("bm"),
        org.apache.spark.sql.functions.countDistinct(col("id")).as("ex"))
      .collect()
    assert(got.length == 7)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }
}
