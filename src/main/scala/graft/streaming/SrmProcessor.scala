package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-experiment sample-ratio-mismatch monitor backing
  * [[graft.analytics.StatTests.srmStream]] — the A/B member of the
  * constant-state monitor family (CUSUM drift, EWMA level, Holt trend,
  * bucket admission, now assignment health): TWO longs of state per
  * experiment key, updated per unit-assignment arrival, re-emitting the
  * current chi-square gate after each batch (latest emission wins).
  *
  * The statistic is the batch [[graft.analytics.StatTests.sampleRatioMismatch]]
  * form — chisq_micro = (a−b)²·10⁶ div (a+b) against χ²(0.001,1)·(a+b),
  * computed in BigInt exactly as the batch DECIMAL(38,0) route (the
  * LongType square wraps past ~3·10⁶ units of imbalance — same fix,
  * both surfaces). Output: (key, users_a, users_b, chisq_micro,
  * srm_detected).
  */
final class SrmProcessor(stateTtl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long, Boolean)] {

  private val CritMicro = BigInt(10827566L)   // χ²(0.001, df=1) · 10⁶

  @transient private var counts: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getValueState[(Long, Long)]("armCounts",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), stateTtl)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Boolean)] = {
    var (a, b) = if (counts.exists()) counts.get() else (0L, 0L)
    rows.foreach { case (_, v) => if (v == 0L) a += 1 else b += 1 }
    counts.update((a, b))
    val n = a + b
    val (chisq, detected) =
      if (n == 0L) (0L, false)
      else {
        val d = BigInt(a - b)
        val sq = d * d * 1000000
        ((sq / n).toLong, sq > CritMicro * n)
      }
    Iterator.single((key, a, b, chisq, detected))
  }
}
