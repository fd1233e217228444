package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Reusable data-quality primitives (SURVEY.md §2.2/§2.8).
  *
  * Everything here is set-based: the reference's per-row `iterrows()`
  * loops (reference: extract-transform-data/et_produtos.py:164-180)
  * become one grouped aggregation + one join, which is the only
  * formulation that scales past a single node.
  */
object Cleaning {

  /** The reference's canonical "missing" test: NULL or empty string
    * (reference: extract-transform-data/et_produtos.py:131).
    */
  def isMissing(c: Column): Column = c.isNull || c === ""

  /** Attach a stable physical-row index. Needed only by the two
    * order-sensitive operators (keep-first dedup, sequential ID
    * backfill) — `zipWithIndex` assigns contiguous indexes per
    * partition in partition order, which for a file-based scan is the
    * file order at any scale.
    */
  def withRowIdx(df: DataFrame, col: String = "_row_idx"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(col, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Key-based dedup keeping the first physical row (SURVEY.md §2.8
    * D1; reference: extract-transform-data/et_produtos.py:66-85).
    * NULL keys group together, matching pandas `duplicated` NaN
    * semantics. One shuffle on the key; no driver-side state.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String],
                     keepIdx: Boolean = false): DataFrame = {
    val idx = "_row_idx"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(idx))
    val deduped = withRowIdx(df, idx)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    if (keepIdx) deduped else deduped.drop(idx)
  }

  /** Exact interpolated per-group median of `value` over its non-null
    * pool, as a two-column frame (key, median). Matches pandas
    * `.median()` (linear interpolation on even counts — SURVEY.md
    * §2.9.5); never `percentile_approx`.
    *
    * Scale note: `percentile` is a sort-based exact aggregate — fine
    * while groups fit an executor; the pool is aggregated once and
    * joined back (broadcast — group count is small by construction).
    */
  def groupMedian(df: DataFrame, key: String, value: String, out: String): DataFrame =
    df.filter(col(value).isNotNull)
      .groupBy(col(key))
      .agg(percentile(col(value), lit(0.5)).as(out))

  /** Exact global median of the non-null pool, as a 1-row frame. */
  def globalMedian(df: DataFrame, value: String, out: String): DataFrame =
    df.filter(col(value).isNotNull)
      .agg(percentile(col(value), lit(0.5)).as(out))

  /** Clamp a numeric column into [lo, hi] (SURVEY.md §2.7 F9). */
  def clamp(c: Column, lo: Column, hi: Column): Column =
    least(greatest(c, lo), hi)
}
