package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Cleaning._

/** Cleaning stages for the product dimension (reference:
  * extract-transform-data/et_produtos.py:185-216). Stage order is
  * semantic — later stages consume earlier outputs (SURVEY.md §2.8):
  * dedup → fix names → fill categories → fill prices.
  */
object ProdutosEtl {

  /** Overwrite any name that deviates from "Produto {id}" — including
    * real-looking names and nulls (reference: et_produtos.py:101-108;
    * note the contrast with EmpregadosEtl, which only fixes blanks).
    */
  def fixNames(df: DataFrame): DataFrame = {
    val expected = concat(lit("Produto "), col("id_produto").cast("string"))
    df.withColumn("nome",
      when(col("nome").isNull || col("nome") =!= expected, expected)
        .otherwise(col("nome")))
  }

  /** NULL/'' categoria → 'Desconhecida' (reference: et_produtos.py:131-137). */
  def fillCategories(df: DataFrame): DataFrame =
    df.withColumn("categoria",
      when(isMissing(col("categoria")), lit("Desconhecida")).otherwise(col("categoria")))

  /** Missing preco → per-categoria exact median of the non-null pool,
    * rounded HALF_EVEN to 2dp like Python `round` (reference:
    * et_produtos.py:142-182; rounding-mode note SURVEY.md §2.9.4).
    * A categoria with no priced peer stays null (the reference's warn
    * path). Set-based: one grouped median + one broadcast join replaces
    * the reference's per-row loop — equivalent output because
    * inserting a group's median never moves that median (SURVEY.md
    * §2.9.2).
    */
  def fillPrices(df: DataFrame): DataFrame = {
    val med = groupMedian(df, "categoria", "preco", "_cat_med")
    df.join(broadcast(med), Seq("categoria"), "left")
      .withColumn("preco",
        when(col("preco").isNull && col("_cat_med").isNotNull, bround(col("_cat_med"), 2))
          .otherwise(col("preco")))
      .drop("_cat_med")
  }

  def treat(raw: DataFrame): DataFrame = {
    val deduped = dedupKeepFirst(raw, Seq("id_produto"))
    fillPrices(fillCategories(fixNames(deduped)))
      .select("id_produto", "nome", "preco", "categoria")
  }
}
