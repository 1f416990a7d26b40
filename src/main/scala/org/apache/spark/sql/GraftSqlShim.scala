package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction — the standard pattern for
  * Spark libraries that ship whole logical operators (Delta, Iceberg, and
  * Sedona all keep a small shim in `org.apache.spark.sql` for exactly this):
  * a custom `LogicalPlan` node has no public `DataFrame` constructor, so the
  * library needs one file inside the `sql` package to call
  * `classic.Dataset.ofRows`. Everything else in this repo lives under
  * `graft.*`; keep this file free of any logic beyond the bridge.
  */
object GraftSqlShim {
  /** Wrap an (already analyzed-attribute-consistent) logical plan as a
    * DataFrame on `spark`, running it through the session's full
    * analyzer/optimizer/planner pipeline.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
