package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.exec.FunctionExecutor
import graft.model._

/** Production Kafka wiring — the deployment shape of the reference job:
  * source topics `internal` + `client_request` (StateFlowFlinkJob.java:
  * 47-54), sinks `client_reply` (:134-142) and `internal` (:127-132,
  * 143-147, the feedback loop), protobuf values with the record key set to
  * `event_id` bytes (KafkaSerializeProto.java:24-30), at-least-once
  * end-to-end (checkpointed source offsets + Spark's at-least-once Kafka
  * sink ≙ CheckpointingMode.AT_LEAST_ONCE + Semantic.AT_LEAST_ONCE).
  *
  * Needs the `spark-sql-kafka` connector on the classpath at runtime (not
  * present in this offline container — exercised there only through
  * [[LoopHarness]], which swaps the broker for a MemoryStream; the
  * topology code is identical).
  */
/** Tuning surface of the reference job (StateFlowFlinkJob.java:34-40,
  * 84-87) as explicit parameters:
  *  - `trigger`: micro-batch pacing. `None` = as-fast-as-possible, the
  *    analogue of `execution.buffer-timeout=0` (:36); a
  *    `Trigger.ProcessingTime` adds deliberate batching latency.
  *  - `statelessConcurrency` / `statelessTimeout`: the AsyncDataStream
  *    capacity-1000 / 2 s settings for the create path (:84-87).
  *  - `useTws`: transformWithState on RocksDB (the reference's
  *    RocksDB-backed keyed state) vs flatMapGroupsWithState on the default
  *    HDFS-backed store.
  */
final case class JobConfig(
    trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
    statelessConcurrency: Int = 128,
    statelessTimeout: scala.concurrent.duration.FiniteDuration =
      scala.concurrent.duration.DurationInt(2).seconds,
    useTws: Boolean = true,
    /** The reference's `--operators` list (StateFlowFlinkJob.java:56):
      * when set, events for unlisted operators return FailedInvocation
      * instead of entering the stateful path.
      */
    knownOperators: Option[Set[String]] = None,
    /** Bounds per-entity state volume: entities idle longer than the TTL
      * are dropped from the store (TWS path only; rejected with useTws =
      * false). NONE = reference semantics (state lives forever).
      *
      * MIGRATION CLIFF: switching between NONE and a TTL flips the
      * operator's TimeMode (None ↔ ProcessingTime), which Spark validates
      * against the checkpoint's operator metadata — an existing
      * deployment cannot toggle this against its old checkpointLocation;
      * plan a state rebuild (fresh checkpoint) for the switch.
      */
    stateTtl: org.apache.spark.sql.streaming.TTLConfig =
      org.apache.spark.sql.streaming.TTLConfig.NONE)

object KafkaSupport {

  /** S1+S2: subscribe + protobuf-decode. */
  def readEvents(spark: SparkSession, bootstrap: String,
      topics: String = "internal,client_request"): Dataset[Event] = {
    import spark.implicits._
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .option("startingOffsets", "latest")
      .option("kafka.group.id", "graft-group-id")
      .load()
      .select(col("value").as[Array[Byte]])
      .map(ProtoCodec.decodeEvent)
  }

  /** S3: Event → (key = event_id bytes, value = proto bytes). */
  def toKafkaRecords(events: Dataset[Event]): DataFrame = {
    import events.sparkSession.implicits._
    events.map(e => (e.eventId.getBytes("UTF-8"), ProtoCodec.encode(e)))
      .toDF("key", "value")
  }

  /** Full job: one streaming query, single-pass fan-out to both topics in
    * foreachBatch (the Spark shape for the reference's side outputs; the
    * feedback loop closes through the `internal` topic re-entering the
    * source, exactly as StateFlowFlinkJob.java:143-147 + :50).
    */
  def start(spark: SparkSession, bootstrap: String, executor: FunctionExecutor,
      checkpoint: String,
      config: JobConfig = JobConfig()): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    if (config.useTws)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val writer = StateflowPipeline.eventsToEgress(readEvents(spark, bootstrap), executor,
        statelessConcurrency = config.statelessConcurrency, useTws = config.useTws,
        statelessTimeout = config.statelessTimeout,
        knownOperators = config.knownOperators, stateTtl = config.stateTtl)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    config.trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: Dataset[Route], _: Long) =>
        batch.persist()
        def sink(direction: Int, topic: String): Unit =
          toKafkaRecords(batch.filter(_.direction == direction).map(_.eventValue))
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .save()
        sink(RouteDirection.CLIENT, "client_reply")
        sink(RouteDirection.INTERNAL, "internal")
        batch.unpersist()
        ()
      }
      .start()
  }
}
