package graft.etl

import org.apache.spark.sql.types._

/** Explicit input schemas for the reference's three ';'-separated CSVs
  * (reference: bases-de-dados CSV headers; DDL load-data/l_produtos.py:78-86, l_vendas.py:78-89).
  *
  * Schemas are declared up front — never inferred — so a bad cell
  * degrades to NULL (Spark CSV PERMISSIVE mode), matching the
  * reference's `pd.to_numeric(errors='coerce')` semantics
  * (reference: extract-transform-data/et_produtos.py:154).
  *
  * `data` is read as a string and parsed downstream (the reference
  * carries dd/MM/yyyy text through all of ET); `idade` is read as
  * double because the CSV writes it as "49.0" (pandas float64) —
  * an IntegerType read would null it out.
  */
object SalesSchemas {
  val produtos: StructType = StructType(Seq(
    StructField("id_produto", IntegerType),
    StructField("nome", StringType),
    StructField("preco", DoubleType),
    StructField("categoria", StringType)))

  val vendas: StructType = StructType(Seq(
    StructField("id_venda", IntegerType),
    StructField("data", StringType),
    StructField("id_produto", IntegerType),
    StructField("id_empregado", IntegerType),
    StructField("quantidade", IntegerType),
    StructField("valor_unitario", DoubleType),
    StructField("valor_total", DoubleType)))

  val empregados: StructType = StructType(Seq(
    StructField("id_empregado", IntegerType),
    StructField("nome", StringType),
    StructField("cargo", StringType),
    StructField("idade", DoubleType)))
}
