package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the engine's entry points and tests.
  *
  * - `ansi.enabled=false`: the reference's cleaning semantics are
  *   pandas `errors='coerce'` — unparseable values degrade to NULL
  *   instead of erroring (SURVEY.md §2.2 P6, §2.9). Spark 4 defaults
  *   ANSI on, which would turn those data-quality paths into runtime
  *   failures.
  * - `shuffle.partitions` sized to the local core count, not 200 —
  *   on a real cluster this is AQE-coalesced anyway.
  * - AQE on: runtime re-planning (skew joins, partition coalescing)
  *   is part of the 100 TB story.
  */
object GraftSession {
  def build(appName: String, cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
