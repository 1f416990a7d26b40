package graft.streaming

import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.exec.FunctionExecutor
import graft.model._
import graft.routing.Routing

/** The dataflow topology of the reference job
  * (StateFlowFlinkJob.java:27-150), re-expressed as one declarative
  * streaming transformation `Dataset[Event] → Dataset[Route]`:
  *
  * {{{
  * events ─ map(Routing.ingress) ─┬─ EGRESS routes ──────────────────────┐
  *                                ├─ "<op>-create" → stateless invoke    │
  *                                │    (bounded-concurrency mapPartitions,│
  *                                │     mirrors AsyncDataStream at       │
  *                                │     StateFlowFlinkJob.java:86-87)    │
  *                                │   → rekey (…:88-95) ─┐               │
  *                                └─ direct INTERNAL ────┴ union         │
  *                                      → groupByKey(key)               │
  *                                      → per-key ValueState invoke      │
  *                                        (InvokeStatefulLambda.java)    │
  *                                      → replies ───────────────────────┤
  *                                                 union → map(egress) ──┴→ Dataset[Route]
  * }}}
  *
  * Flink side outputs become filters on one routed stream; the Kafka
  * feedback cycle (topic `internal`, StateFlowFlinkJob.java:143-147) is the
  * sink's job — see [[graft.streaming.LoopHarness]] (tests) and the Kafka
  * wiring notes in `KafkaSupport`.
  */
object StateflowPipeline {

  /** Per-key stateful invoke on Spark 4's transformWithState — the direct
    * analogue of the reference's KeyedProcessFunction with
    * `ValueState<ByteString>` (InvokeStatefulLambda.java:35-116). State is
    * an opaque byte blob, initialized empty on first touch (:75-77) and
    * overwritten wholesale with each executor reply (:109).
    */
  final class StatefulInvokeProcessor(executor: FunctionExecutor)
      extends StatefulProcessor[String, (Route, Long), Event] {

    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("operatorState", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(Route, Long)],
        timerValues: TimerValues): Iterator[Event] = {
      // Per-key FIFO: the groupByKey shuffle loses arrival order, so rows
      // carry an ingress sequence (Kafka (partition,offset) analogue) and
      // are re-sorted inside the group — Flink's keyed-order guarantee
      // (the reference relies on it for read-modify-write state).
      val out = Vector.newBuilder[Event]
      rows.toVector.sortBy(_._2).foreach { case (route, _) =>
        val cur = if (state.exists()) state.get() else Array.emptyByteArray
        val reply = executor.invoke(EventRequestReply(route.eventValue, cur, route.routeName))
        state.update(reply.state)
        out += reply.event
      }
      out.result().iterator
    }
  }

  /** Same semantics on flatMapGroupsWithState (works against the default
    * HDFS-backed state store; transformWithState needs RocksDB).
    */
  private def statefulInvokeFMG(executor: FunctionExecutor)(
      key: String, rows: Iterator[(Route, Long)], state: GroupState[Array[Byte]]): Iterator[Event] = {
    var cur = state.getOption.getOrElse(Array.emptyByteArray)
    val out = rows.toVector.sortBy(_._2).map { case (route, _) =>
      val reply = executor.invoke(EventRequestReply(route.eventValue, cur, route.routeName))
      cur = reply.state
      reply.event
    }
    state.update(cur)
    out.iterator
  }

  /** Bounded-concurrency stateless invoke: the reference hides Lambda
    * latency with async unordered I/O, capacity 1000, timeout 2 s
    * (StateFlowFlinkJob.java:84-87). Spark has no async operator; a Future
    * pool inside mapPartitions gives the same in-flight bound per partition
    * and completes within the micro-batch.
    */
  private def invokeStateless(executor: FunctionExecutor, concurrency: Int, timeout: FiniteDuration)(
      routes: Iterator[Route]): Iterator[Event] = {
    implicit val ec: ExecutionContext = StatelessPool.ec
    routes.grouped(concurrency).flatMap { chunk =>
      val fs = chunk.map { r =>
        Future {
          val op = r.eventValue.funAddress.fullName
          executor.invoke(EventRequestReply(r.eventValue, Array.emptyByteArray, op)).event
        }
      }
      Await.result(Future.sequence(fs), timeout * chunk.size.toLong)
    }
  }

  /** Route names for the create path (StateFlowFlinkJob.java:57-66). */
  private def isCreate(r: Route): Boolean = r.routeName.endsWith("-create")

  /** Assemble the full topology. Works on both streaming and batch
    * Datasets; `useTws` selects transformWithState (RocksDB state store)
    * vs flatMapGroupsWithState.
    */
  def eventsToEgress(events: Dataset[Event], executor: FunctionExecutor,
      statelessConcurrency: Int = 128, useTws: Boolean = true): Dataset[Route] = {
    val spark = events.sparkSession
    import spark.implicits._

    val routed: Dataset[Route] = events.map(Routing.ingress)

    // EGRESS straight-throughs (Ping→Pong, flow RETURN): M1 passthrough
    val ingressEgress = routed.filter(_.direction == RouteDirection.EGRESS).map(_.eventValue)

    val internal = routed.filter(_.direction == RouteDirection.INTERNAL)

    // create path: A1 async stateless invoke + A2 rekey
    val created = internal.filter(isCreate _)
      .mapPartitions(invokeStateless(executor, statelessConcurrency, 2.seconds))
      .map(Routing.rekeyCreated)

    // U1 union + K1 keyBy + P1 stateful invoke. The ingress sequence is
    // attached BEFORE the keyBy shuffle (per source partition, monotonic in
    // arrival order — the (partition, offset) stand-in) so the processor
    // can restore per-key FIFO after the shuffle.
    val keyed = internal.filter((r: Route) => !isCreate(r)).union(created)
      .mapPartitions { it =>
        // partition-stamped arrival sequence (monotonically_increasing_id
        // is rejected in streaming plans; this is its exact construction)
        var seq = org.apache.spark.TaskContext.getPartitionId().toLong << 40
        it.map { r => seq += 1; (r, seq) }
      }
      .groupByKey(_._1.key)
    val replies =
      if (useTws)
        keyed.transformWithState(
          new StatefulInvokeProcessor(executor), TimeMode.None(), OutputMode.Append())
      else
        keyed.flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(
          statefulInvokeFMG(executor))(Encoders.BINARY, implicitly)

    // U2 union + R6 egress routing
    ingressEgress.union(replies).map(Routing.egress)
  }
}

/** Shared daemon thread pool for the stateless-invoke path. */
private object StatelessPool {
  lazy val ec: ExecutionContext = ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(64, r => {
      val t = new Thread(r, "graft-stateless-invoke")
      t.setDaemon(true)
      t
    }))
}
