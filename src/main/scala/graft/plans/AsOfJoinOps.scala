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

  /** `tolerance`: maximum allowed (leftTime − matchTime) gap, pandas
    * merge_asof-style — a latest-at-or-before match older than the
    * bound yields nulls. Forward-direction as-of needs no extra code:
    * negate both time columns ("latest at-or-before −t" ≡ "earliest
    * at-or-after t"), as AsOfJoinSpec demonstrates.
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKeys: Seq[Column], rightKeys: Seq[Column],
           leftTime: Column, rightTime: Column,
           tolerance: Option[Long] = None): DataFrame = {
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
    // computed Columns (e.g. -df("t")) arrive from the Spark 4
    // column-node API as UnresolvedFunction stubs that no analyzer
    // rule will visit inside a custom node — reject them with a
    // usable message instead of a NullType failure at execution
    def typed(c: Column, what: String) = {
      val e = Bridge.expression(c)
      require(e.resolved &&
        e.dataType != org.apache.spark.sql.types.NullType,
        s"asof: $what must reference a materialized column " +
          s"(df(name), or withColumn the expression first); got: $e")
      e
    }
    val node = AsOfJoin(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      leftKeys.map(typed(_, "left key")),
      rightKeys.map(typed(_, "right key")),
      typed(leftTime, "left time"),
      typed(rightTime, "right time"),
      tolerance)
    Bridge.ofRows(spark, node)
  }
}
