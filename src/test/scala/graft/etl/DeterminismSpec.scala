package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-determinism evidence: the cleaned outputs must not depend
  * on how the input happens to be partitioned — the property that
  * makes the engine's results reproducible on a 1000-executor cluster,
  * not just on one thread. (Keep-first dedup is the one order-
  * sensitive operator; on inputs whose duplicate groups are full-row
  * identical — as in the reference corpus — any physical order gives
  * the same result, and the shipped golden data exercises exactly
  * that.)
  */
class DeterminismSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("determinism-spec", "4")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("cleaned tables identical when inputs are re-partitioned") {
    import graft.sources.SalesIo
    val base = "/root/reference/bases-de-dados"
    val ref = LocalDate.of(2025, 8, 27)

    def treatWith(parts: Option[Int]): SalesPipeline.Cleaned = {
      def read(f: String, s: org.apache.spark.sql.types.StructType) = {
        val df = SalesIo.readCsv(spark, s"$base/$f", s)
        parts.fold(df)(df.repartition(_))
      }
      val produtos = ProdutosEtl.treat(read("produtos.csv", SalesSchemas.produtos))
      val vendas = VendasEtl.treat(read("vendas.csv", SalesSchemas.vendas), produtos, ref)
      val empregados = EmpregadosEtl.treat(read("empregados.csv", SalesSchemas.empregados))
      SalesPipeline.loadBoundary(SalesPipeline.Cleaned(produtos, vendas, empregados))
    }

    val plain = treatWith(None)
    val shuffled = treatWith(Some(7))
    assert(rows(plain.produtos) === rows(shuffled.produtos))
    assert(rows(plain.vendas) === rows(shuffled.vendas))
    assert(rows(plain.empregados) === rows(shuffled.empregados))
  }

  test("operator queries identical at different shuffle parallelism") {
    val sf = "/root/testdata/sf0.001"
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // clearCaches each pass: the dedup substrate is memoized+persisted,
    // so without it the second pass would silently replay the first
    // pass's partitioning out of cache instead of re-planning at 13.
    def run() = {
      graft.operators.DedupOps.clearCaches(spark)
      Seq(
        rows(graft.operators.RelationalOps.medianByGroup(spark, sf)),
        rows(graft.operators.StatOps.aggMoments(spark, sf)),
        rows(graft.operators.StatOps.aggCollectSorted(spark, sf)),
        rows(graft.operators.StatOps.aggGroupingSets(spark, sf)),
        rows(graft.operators.DedupOps.dedupMinhashLsh(spark, sf)),
        rows(graft.operators.DedupOps.dedupNgramJaccard(spark, sf)),
        rows(graft.operators.EmbeddingOps.annBruteTopK(spark, sf)),
        rows(graft.operators.EmbeddingOps.annRecall(spark, sf)),
        rows(graft.operators.StatOps.aggCollectCapped(spark, sf)),
        rows(graft.operators.TextOps.textRepSignals(spark, sf)),
        rows(graft.operators.EventOps.clickAttribution(spark, sf)),
        rows(graft.operators.PipelineOps.packSequences(spark, sf)),
        rows(graft.operators.PipelineOps.tfidfTopK(spark, sf)),
        rows(graft.operators.TimeSeriesOps.tsGapfill(spark, sf)),
        rows(graft.operators.TimeSeriesOps.scd2Build(spark, sf)),
        rows(graft.operators.EventOps.cohortRetention(spark, sf)),
        rows(graft.operators.EventOps.windowRangeFrame(spark, sf)),
        rows(graft.operators.StatOps.regrByGroup(spark, sf)),
        rows(graft.operators.PipelineOps.sampleImportance(spark, sf)))
    }
    val at4 = run()
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try {
      val at13 = run()
      assert(at4 === at13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
