package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Host timing variance in this environment is 40-60% across a session
    // (established rounds 1-4), so a single-shot measurement can overstate a
    // query by >2x. Run each query REPS times and report the min: min is the
    // noise-robust estimator of the plan's actual cost (noise is strictly
    // additive here — GC pauses, host contention — never negative).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // wide-row codegen headroom (see Verify)
      .config("spark.sql.codegen.maxFields", "200")
      // same deployment hook as Verify: functions + optimizer rule
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JIT + codegen + parquet footer reads, so the first
    // timed query (alphabetically q01) doesn't absorb JVM startup cost
    locally {
      import graft.analytics.Tables
      Seq(Tables.lineitem _, Tables.orders _, Tables.documents _,
          Tables.embeddings _, Tables.events _).foreach { t =>
        t(spark, sfDir).groupBy().count().write.format("noop").mode("overwrite").save()
      }
    }
    // noop sink: materializes every output column (count() would let
    // Catalyst prune the projection and under-report expression cost)
    //
    // Rep policy (r6): reps are INTERLEAVED at the pass level — run the whole
    // suite once, then again — rather than back-to-back per query. Back-to-back
    // reps share one host-contention window, so min-of-N could not shave a
    // transient stall that covered both reps (r4/r5 artifacts overstated some
    // queries 10x that way). With pass-level interleaving the two samples of a
    // query are ~minutes apart, so a contention burst lands on at most one.
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "" }
    // local iteration aid: SPARK_GRAFT_ONLY=q1,q2 times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
    val samples = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    // Contention guard (r7): min-of-2 cannot shave a stall that covers
    // both samples, and this host idles at loadavg ~2. If any pass STARTS
    // under ambient load > 1.5, grant ONE extra pass so every query gets
    // at least one sample from a calmer window; queries whose samples
    // still disagree > 2x are flagged `noisy` in the artifact so a reader
    // knows the min may not be reproducible under load.
    val passLoads = scala.collection.mutable.ListBuffer.empty[String]
    var target = reps
    var pass = 0
    while (pass < target) {
      pass += 1
      graft.analytics.Memo.clear() // each pass pays shared-intermediate builds once
      val la0 = loadavg()
      val la0n = la0.split(" ").headOption
        .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(0.0)
      if (la0n > 1.5 && target == reps && reps > 1) {
        System.err.println(f"[bench] pass $pass starts at loadavg $la0n%.2f > 1.5 — adding one extra pass")
        target = reps + 1
      }
      names.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
        } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed (pass $pass): $e")
        }
      }
      passLoads += s"$la0 -> ${loadavg()}"
    }
    // a query that failed every pass reports 0.0 (its stderr line is the flag)
    val results = names.map { case (name, _) =>
      name -> (samples(name) match { case Nil => 0.0; case ts => ts.min })
    }
    val noisy = names.collect { case (name, _)
      if samples(name).size >= 2 && samples(name).max > 2 * samples(name).min =>
      "\"" + name + "\""
    }.mkString("[", ",", "]")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val loads = passLoads.map(s => "\"" + s + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$pass,"policy":"min-over-$pass-interleaved-passes","loadavg_per_pass":$loads,"noisy":$noisy,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Also persist the full JSON in-repo: the driver captures only the tail
    // of stdout, which truncated BENCH_r02.json mid-line. A committed file
    // keeps every per-query number auditable regardless of stdout capture.
    // Default is cwd-relative (the sbt project root), not an absolute path.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")).toAbsolutePath
    System.err.println(s"[bench] writing full results to $out")
    try {
      java.nio.file.Files.write(out,
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] FAILED to write $out: $e")
        e.printStackTrace()
    }
    spark.stop()
  }
}
