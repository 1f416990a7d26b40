package graft.exec

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

import graft.model.EventRequestReply

/** X1 parity: the reference records a Dropwizard `aws-latency` histogram
  * around every executor RPC (InvokeStatefulLambda.java:56-59, 91-94, 112).
  * Spark-native shape: driver-visible accumulators updated on executors —
  * count, total latency, and coarse log2 buckets (a mergeable histogram,
  * same role as the uniform-reservoir histogram). Read them from any
  * StreamingQueryListener / after each batch.
  */
final class MeteredExecutor private (
    inner: FunctionExecutor,
    val invocations: LongAccumulator,
    val totalNanos: LongAccumulator,
    /** log2(µs) buckets 0..19 (1 µs … ~0.5 s). */
    val buckets: IndexedSeq[LongAccumulator])
    extends FunctionExecutor {

  override def invoke(request: EventRequestReply): EventRequestReply = {
    val t0 = System.nanoTime()
    try inner.invoke(request)
    finally {
      val ns = System.nanoTime() - t0
      invocations.add(1L)
      totalNanos.add(ns)
      val us = ns / 1000
      val b = math.min(63 - java.lang.Long.numberOfLeadingZeros(math.max(us, 1L)), 19L).toInt
      buckets(b).add(1L)
    }
  }

  def meanMicros: Double =
    if (invocations.value == 0) 0.0 else totalNanos.value / 1000.0 / invocations.value

  /** Upper-bound p-quantile latency in µs from the log2 buckets (the
    * bucket's upper edge) — the mergeable analogue of the reference
    * histogram's reservoir percentiles (Dropwizard getSnapshot().getValue).
    */
  def percentileMicrosUpper(p: Double): Long = {
    require(p > 0.0 && p <= 1.0)
    val n = invocations.value
    if (n == 0) return 0L
    val target = math.ceil(p * n).toLong
    var acc = 0L
    var i = 0
    while (i < buckets.size) {
      acc += buckets(i).value
      if (acc >= target) return 1L << (i + 1)
      i += 1
    }
    1L << 20
  }
}

object MeteredExecutor {
  /** Built via a factory so the (non-serializable) SparkContext is never
    * captured by the executor instance shipped in task closures.
    */
  def apply(inner: FunctionExecutor, sc: SparkContext): MeteredExecutor =
    new MeteredExecutor(
      inner,
      sc.longAccumulator("graft.executor.invocations"),
      sc.longAccumulator("graft.executor.totalNanos"),
      (0 until 20).map(i => sc.longAccumulator(s"graft.executor.latency.le_2e${i}us")))
}
