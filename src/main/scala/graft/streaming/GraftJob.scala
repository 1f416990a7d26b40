package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.exec.{FunctionExecutor, HttpFunctionExecutor, LocalCounterExecutor}

/** Deployable entry point — the analogue of the reference's
  * `StateFlowFlinkJob.main` (CLI with an `--operators` list +
  * hard-coded Kafka address, StateFlowFlinkJob.java:27-56):
  *
  * {{{
  * spark-submit --class graft.streaming.GraftJob <jar> \
  *   --bootstrap broker:9092 --checkpoint s3://ckpt/path \
  *   --operators global/Account,global/Cart \
  *   --endpoint https://fn.example/invoke --trigger-ms 0
  * }}}
  *
  * `--endpoint` selects the HTTP function backend (the Lambda deployment
  * shape); without it the in-JVM counter entity runs (smoke deployments).
  * `--operators` enables the reference's operator validation — events for
  * unlisted operators return FailedInvocation.
  */
object GraftJob {
  def main(args: Array[String]): Unit = {
    val opts = args.grouped(2).collect { case Array(k, v) => k -> v }.toMap
    val bootstrap = opts.getOrElse("--bootstrap", "localhost:9092")
    val checkpoint = opts.getOrElse("--checkpoint", "/tmp/graft-checkpoint")
    val executor: FunctionExecutor = opts.get("--endpoint")
      .map(new HttpFunctionExecutor(_))
      .getOrElse(new LocalCounterExecutor)
    val config = JobConfig(
      trigger = opts.get("--trigger-ms").map(ms => Trigger.ProcessingTime(ms.toLong)),
      knownOperators = opts.get("--operators").map(_.split(',').toSet))
    val spark = SparkSession.builder().appName("graft-stateflow").getOrCreate()
    KafkaSupport.start(spark, bootstrap, executor, checkpoint, config)
      .awaitTermination()
  }
}
