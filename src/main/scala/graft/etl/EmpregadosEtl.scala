package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Cleaning._

/** Cleaning stages for the employee dimension (reference:
  * extract-transform-data/et_empregados.py:349-385). Stage order:
  * dedup → backfill ids → fix blank names → fill cargos → impute ages
  * → clamp ages (SURVEY.md §2.8).
  */
object EmpregadosEtl {

  /** Blank ids continue the id sequence (max+1, max+2, …) in file row
    * order (reference: et_empregados.py:243-292; SURVEY.md §2.5 W5).
    * Row order comes from the physical row index attached at scan.
    * The numbering window runs ONLY over the filtered missing-id
    * subset (tiny by nature), so its single-partition sort is bounded
    * — a window over the whole frame would globally sort the entire
    * dimension just to discard the result for non-missing rows.
    */
  def fillMissingIds(df: DataFrame): DataFrame = {
    val missing = col("id_empregado").isNull
    val maxId = df.agg(coalesce(max("id_empregado"), lit(0)).as("_max_id"))
    val filled = df.filter(missing)
      .crossJoin(broadcast(maxId))
      .withColumn("id_empregado",
        (col("_max_id") + row_number().over(Window.orderBy(col("_row_idx")))).cast("int"))
      .drop("_max_id")
    df.filter(!missing).unionByName(filled)
  }

  /** Only blank/whitespace names are replaced with "Funcionário {id}"
    * (reference: et_empregados.py:101-108 — unlike ProdutosEtl, real
    * names are kept).
    */
  def fixMissingNames(df: DataFrame): DataFrame =
    df.withColumn("nome",
      when(trim(coalesce(col("nome"), lit(""))) === "",
        concat(lit("Funcionário "), col("id_empregado").cast("string")))
        .otherwise(col("nome")))

  /** NULL/'' cargo → 'Não Informado' (reference: et_empregados.py:120-139). */
  def fillCargos(df: DataFrame): DataFrame =
    df.withColumn("cargo",
      when(isMissing(col("cargo")), lit("Não Informado")).otherwise(col("cargo")))

  /** Missing idade → per-cargo exact median rounded HALF_EVEN to int
    * (Python `round` — reference: et_empregados.py:182), falling back
    * to the global median over the post-cargo-fill pool (reference:
    * et_empregados.py:188-195 computes the fallback pool after earlier
    * fills — reproduced by staging the two aggregations).
    */
  def fillAges(df: DataFrame): DataFrame = {
    val cargoMed = groupMedian(df, "cargo", "idade", "_cargo_med")
    val stage1 = df.join(broadcast(cargoMed), Seq("cargo"), "left")
      .withColumn("_fill_cargo", col("idade").isNull && col("_cargo_med").isNotNull)
      .withColumn("idade",
        when(col("_fill_cargo"), bround(col("_cargo_med"), 0)).otherwise(col("idade")))
      .drop("_cargo_med")
    val globMed = globalMedian(stage1, "idade", "_glob_med")
    stage1.crossJoin(broadcast(globMed))
      .withColumn("_fill_glob", col("idade").isNull && col("_glob_med").isNotNull)
      .withColumn("idade",
        when(col("_fill_glob"), bround(col("_glob_med"), 0)).otherwise(col("idade")))
      .withColumn("idade_imputada", col("_fill_cargo") || col("_fill_glob"))
      .withColumn("metodo_imputacao_idade",
        when(col("_fill_cargo"), "mediana_cargo")
          .when(col("_fill_glob"), "mediana_global").otherwise(lit("")))
      .drop("_glob_med", "_fill_cargo", "_fill_glob")
  }

  /** Clamp idade into [18, 70] with an audit flag, then cast to int
    * (reference: et_empregados.py:202-240; SURVEY.md §2.7 F9).
    */
  def clampAges(df: DataFrame): DataFrame =
    df.withColumn("idade_ajustada",
        col("idade").isNotNull && (col("idade") < 18 || col("idade") > 70))
      .withColumn("idade", clamp(col("idade"), lit(18), lit(70)).cast("int"))

  def treat(raw: DataFrame): DataFrame = {
    // keep the row index through dedup — the id backfill needs file order
    val deduped = dedupKeepFirst(raw, Seq("id_empregado"), keepIdx = true)
    val filled = fillMissingIds(deduped).drop("_row_idx")
    clampAges(fillAges(fillCargos(fixMissingNames(filled))))
      .select("id_empregado", "nome", "cargo", "idade",
        "idade_imputada", "metodo_imputacao_idade", "idade_ajustada")
  }
}
