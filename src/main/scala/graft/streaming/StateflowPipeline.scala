package graft.streaming

import java.util.concurrent.TimeUnit

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
  final class StatefulInvokeProcessor(executor: FunctionExecutor,
      stateTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, (Route, Long), Event] {

    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("operatorState", Encoders.BINARY, stateTtl)

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
    * latency with async unordered I/O, capacity 1000, per-request timeout
    * 2 s (AsyncDataStream.unorderedWait, StateFlowFlinkJob.java:84-87).
    * Spark has no async operator; this is a sliding-window completion loop
    * inside mapPartitions: up to `concurrency` requests in flight at once,
    * each with its OWN `timeout` deadline measured from submission, and
    * results emitted as they complete (unordered — matching unorderedWait).
    * One stuck request neither blocks the rest of the window nor inflates
    * anyone else's budget; it times out alone at ~`timeout` and yields a
    * FailedInvocation reply (the reference's AsyncDataStream would fail the
    * job on timeout — a clean per-request failure reply is the graceful
    * engine-level equivalent).
    */
  private def invokeStateless(executor: FunctionExecutor, concurrency: Int, timeout: FiniteDuration)(
      routes: Iterator[Route]): Iterator[Event] = {
    // concurrency <= 0 would make refill() never submit → routes silently dropped
    require(concurrency > 0, s"concurrency must be positive, got $concurrency")
    require(timeout > Duration.Zero, s"timeout must be positive, got $timeout")
    val timeoutNs = timeout.toNanos
    new Iterator[Event] {
      private val cs =
        new java.util.concurrent.ExecutorCompletionService[Event](StatelessPool.pool)
      // in-flight future → (route, absolute deadline)
      private val pending =
        new java.util.HashMap[java.util.concurrent.Future[Event], (Route, Long)]()
      private val ready = scala.collection.mutable.Queue.empty[Event]

      private def refill(): Unit =
        while (pending.size < concurrency && routes.hasNext) {
          val r = routes.next()
          val f = cs.submit(() => {
            val op = r.eventValue.funAddress.fullName
            executor.invoke(EventRequestReply(r.eventValue, Array.emptyByteArray, op)).event
          })
          pending.put(f, (r, System.nanoTime() + timeoutNs))
        }

      private def collectOne(): Unit =
        while (ready.isEmpty && !pending.isEmpty) {
          // earliest in-flight deadline bounds how long we may block
          var minF: java.util.concurrent.Future[Event] = null
          var minR: Route = null
          var minDl = Long.MaxValue
          val it = pending.entrySet().iterator()
          while (it.hasNext) {
            val en = it.next()
            if (en.getValue._2 < minDl) {
              minF = en.getKey; minR = en.getValue._1; minDl = en.getValue._2
            }
          }
          val waitNs = minDl - System.nanoTime()
          val f =
            if (waitNs > 0) cs.poll(waitNs, TimeUnit.NANOSECONDS) else cs.poll()
          if (f != null) {
            val entry = pending.remove(f)
            // null = late completion of an already-timed-out request: drop
            if (entry != null)
              ready += (try f.get() catch {
                case scala.util.control.NonFatal(_) =>
                  entry._1.eventValue.withReply(Reply.FailedInvocation)
              })
          } else if (System.nanoTime() >= minDl) {
            minF.cancel(true)
            pending.remove(minF)
            ready += minR.eventValue.withReply(Reply.FailedInvocation)
          }
        }

      override def hasNext: Boolean = {
        refill()
        if (ready.isEmpty) collectOne()
        ready.nonEmpty
      }

      override def next(): Event = {
        if (!hasNext) throw new NoSuchElementException("exhausted")
        val e = ready.dequeue()
        refill()
        e
      }
    }
  }

  /** Route names for the create path (StateFlowFlinkJob.java:57-66). */
  private def isCreate(r: Route): Boolean = r.routeName.endsWith("-create")

  /** Assemble the full topology. Works on both streaming and batch
    * Datasets; `useTws` selects transformWithState (RocksDB state store)
    * vs flatMapGroupsWithState. `statelessConcurrency`/`statelessTimeout`
    * mirror the reference's async capacity 1000 / timeout 2 s
    * (StateFlowFlinkJob.java:84-87).
    */
  def eventsToEgress(events: Dataset[Event], executor: FunctionExecutor,
      statelessConcurrency: Int = 128, useTws: Boolean = true,
      statelessTimeout: FiniteDuration = 2.seconds,
      knownOperators: Option[Set[String]] = None,
      // Bounds state volume for abandoned keys (idle entities never
      // cleaned up otherwise — at stream scale state grows with every key
      // ever seen). NONE = reference semantics (state lives forever).
      // TWS path only: flatMapGroupsWithState has no per-state TTL.
      stateTtl: TTLConfig = TTLConfig.NONE): Dataset[Route] = {
    // fail fast: the FMG fallback has no per-state TTL, and silently
    // dropping the setting would unbound exactly the state the caller
    // asked to bound
    require(stateTtl == TTLConfig.NONE || useTws,
      "stateTtl requires the transformWithState path (useTws = true)")
    val spark = events.sparkSession
    import spark.implicits._

    val routed: Dataset[Route] = events.map(Routing.ingress)

    val internalAll = routed.filter(_.direction == RouteDirection.INTERNAL)

    // The reference builds one side output per operator from the
    // `--operators` CLI list (StateFlowFlinkJob.java:56-66); an event for
    // an unlisted operator has no output tag and kills the job. With a
    // known-operator set configured, we keep the validation but degrade
    // gracefully: the event short-circuits to the client as a
    // FailedInvocation reply instead of crashing the stream.
    // EGRESS straight-throughs (Ping→Pong, flow RETURN): M1 passthrough
    val ingressEgressBase = routed.filter(_.direction == RouteDirection.EGRESS)
      .map(_.eventValue)

    val (internal, ingressEgress) = knownOperators match {
      case Some(ops) =>
        val known = (r: Route) => ops.contains(r.routeName.stripSuffix("-create"))
        (internalAll.filter(r => known(r)),
          ingressEgressBase.union(internalAll.filter(r => !known(r))
            .map(_.eventValue.withReply(Reply.FailedInvocation))))
      case None => (internalAll, ingressEgressBase)
    }

    // create path: A1 async stateless invoke + A2 rekey
    val created = internal.filter(isCreate _)
      .mapPartitions(invokeStateless(executor, statelessConcurrency, statelessTimeout))
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
      // state is namespaced per OPERATOR × key, like the reference (one
      // InvokeStatefulLambda instance — hence one ValueState namespace —
      // per operator name): two operators invoked with the same entity key
      // must not share a state blob. routeName is "ns/name" (no NUL),
      // so the composite is collision-free.
      .groupByKey(t => t._1.routeName + "\u0000" + t._1.key)
    val replies =
      if (useTws) {
        // TTL'd state needs the processing-time clock; without a TTL keep
        // the reference's time-agnostic mode
        val timeMode =
          if (stateTtl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
        keyed.transformWithState(
          new StatefulInvokeProcessor(executor, stateTtl), timeMode, OutputMode.Append())
      }
      else
        keyed.flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(
          statefulInvokeFMG(executor))(Encoders.BINARY, implicitly)

    // U2 union + R6 egress routing
    ingressEgress.union(replies).map(Routing.egress)
  }
}

/** Shared daemon thread pool for the stateless-invoke path. */
private object StatelessPool {
  lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(64, r => {
      val t = new Thread(r, "graft-stateless-invoke")
      t.setDaemon(true)
      t
    })
}
