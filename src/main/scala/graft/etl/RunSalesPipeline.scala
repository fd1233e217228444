package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** CLI analog of the reference's `pipeline.py` (reference:
  * pipeline.py:7-99): run the full ET over the reference-layout CSVs,
  * export the three cleaned tables as parquet, and print the five
  * query results (the PDF rendering is presentation-only and out of
  * engine scope — SURVEY.md §2.1 S9).
  *
  * Usage: runMain graft.etl.RunSalesPipeline <csvDir> <outDir> [yyyy-MM-dd]
  */
object RunSalesPipeline {
  def main(args: Array[String]): Unit = {
    val csvDir = if (args.length > 0) args(0) else "/root/reference/bases-de-dados"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sales_out"
    val refDate = if (args.length > 2) LocalDate.parse(args(2)) else LocalDate.now()
    val spark = graft.GraftSession.build("graft-sales-pipeline")

    val t0 = System.nanoTime()
    val cleanedRaw = SalesPipeline.run(spark, csvDir, refDate)
    // ~25 actions follow (writes, counts, shows, audits) — cache both
    // forms once so the ETL DAG doesn't re-execute per action
    val cleaned = SalesPipeline.Cleaned(
      cleanedRaw.produtos.cache(), cleanedRaw.vendas.cache(), cleanedRaw.empregados.cache())
    val b = SalesPipeline.loadBoundary(cleaned)
    val bc = SalesPipeline.Cleaned(b.produtos.cache(), b.vendas.cache(), b.empregados.cache())
    SalesPipeline.writeParquet(bc, outDir)
    SalesPipeline.writeReportTables(bc, outDir)
    // Both visual artifacts render the one ReportModel (built once):
    // the HTML/SVG report and the reference-named PDF.
    val model = ReportModel.build(bc)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outDir/report"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/report/relatorio_vendas.html"),
      SalesReportHtml.render(model).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/report/relatorio-final.pdf"),
      SalesReportPdf.render(model))
    println(s"[pipeline] produtos=${bc.produtos.count()} vendas=${bc.vendas.count()} " +
      s"empregados=${bc.empregados.count()} -> $outDir")
    Seq(
      "Q1 vendas por funcionário" -> SalesPipeline.q1SalesByEmployee(bc),
      "Q2 ticket médio por produto" -> SalesPipeline.q2AvgTicketByProduct(bc),
      "Q3 vendas por categoria" -> SalesPipeline.q3SalesByCategory(bc),
      "Q4 top 5 funcionários" -> SalesPipeline.q4Top5Employees(bc),
      "Q5 vendas por período" -> SalesPipeline.q5SalesByPeriod(bc),
    ).foreach { case (title, df) =>
      println(s"== $title (${df.count()} rows)")
      df.show(5, truncate = false)
    }
    // audit side-channel (reference logs these per stage — SURVEY.md A6)
    println("== audit: imputation methods (vendas dates)")
    EtlStats.imputationSummary(cleaned.vendas, "data_imputada", "metodo_imputacao")
      .show(truncate = false)
    println("== audit: empregados profile")
    EtlStats.profile(bc.empregados).show(truncate = false)
    println(f"[pipeline] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
