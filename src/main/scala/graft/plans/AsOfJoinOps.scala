package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.Bridge

/** User-facing constructor for the native as-of join. Columns must be
  * resolved against the two input frames (`df.col("x")` / `df("x")`),
  * so the logical node is built fully resolved — no dependence on
  * name-based analyzer resolution, and duplicate names across sides
  * are the caller's choice to keep or rename.
  *
  * The planner strategy is registered through BOTH deployment paths:
  * `GraftExtensions` (cluster: `spark.sql.extensions`) and, here,
  * idempotently via `spark.experimental.extraStrategies` so any
  * session that reaches this API plans the node without extra setup.
  */
object AsOfJoinOps {

  def asof(left: DataFrame, right: DataFrame,
           leftKeys: Seq[Column], rightKeys: Seq[Column],
           leftTime: Column, rightTime: Column): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PruneAsOfJoinColumns))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneAsOfJoinColumns
    if (!spark.experimental.extraOptimizations.contains(PushLeftFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushLeftFilterThroughAsOfJoin
    val node = AsOfJoin(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      leftKeys.map(Bridge.expression),
      rightKeys.map(Bridge.expression),
      Bridge.expression(leftTime),
      Bridge.expression(rightTime))
    Bridge.ofRows(spark, node)
  }
}
