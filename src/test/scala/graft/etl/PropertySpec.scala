package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over randomized dirty inputs (SURVEY.md
  * §5): the cleaning operators must hold these for ANY input, not just
  * the shipped CSVs. Raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline dependency cache)
  * — 10 deterministic random frames per property.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("property-spec", "4")
  import spark.implicits._

  /** Deterministic sampling: seed i -> sample of gen. */
  private def forAll[A](gen: Gen[List[A]])(check: List[A] => Unit): Unit =
    (1 to 10).foreach { i =>
      val rows = gen(Gen.Parameters.default.withSize(40), Seed(i.toLong))
        .getOrElse(Nil)
      if (rows.nonEmpty) check(rows)
    }

  private val genProdutoRow = for {
    id <- Gen.choose(1, 50)
    nome <- Gen.oneOf(Gen.const("Produto X"), Gen.alphaStr.map(_.take(8)))
    preco <- Gen.option(Gen.choose(1.0, 999.0).map(p => math.rint(p * 100) / 100))
    cat <- Gen.oneOf(Some("A"), Some("B"), Some(""), None)
  } yield (id, nome, preco, cat)

  test("produtos: dedup keeps exactly one row per id; names match template") {
    forAll(Gen.nonEmptyListOf(genProdutoRow)) { rows =>
      val df = rows.toDF("id_produto", "nome", "preco", "categoria")
      val out = ProdutosEtl.treat(df).cache()
      val ids = out.select("id_produto").collect().map(_.getInt(0)).toSeq
      assert(ids.distinct.length === ids.length, "duplicate ids survived")
      assert(ids.toSet === rows.map(_._1).toSet, "lost or invented ids")
      val badNames = out
        .filter(col("nome") =!= concat(lit("Produto "), col("id_produto").cast("string")))
        .count()
      assert(badNames === 0L)
      val missingCat = out.filter(Cleaning.isMissing(col("categoria"))).count()
      assert(missingCat === 0L)
      out.unpersist()
    }
  }

  test("produtos: any category with >=1 priced row ends fully priced") {
    forAll(Gen.nonEmptyListOf(genProdutoRow)) { rows =>
      val df = rows.toDF("id_produto", "nome", "preco", "categoria")
      val out = ProdutosEtl.treat(df)
      val holes = out.join(
        out.filter(col("preco").isNotNull).select(col("categoria")).distinct(),
        Seq("categoria"), "left_semi")
        .filter(col("preco").isNull).count()
      assert(holes === 0L, "null preco in a category with a priced peer")
    }
  }

  private val genEmpregadoRow = for {
    id <- Gen.option(Gen.choose(1, 40))
    nome <- Gen.oneOf(Gen.const(""), Gen.const("  "), Gen.alphaStr.map(_.take(6)))
    cargo <- Gen.oneOf(Some("Dev"), Some("Ops"), Some(""), None)
    idade <- Gen.option(Gen.choose(-5.0, 120.0).map(math.rint))
  } yield (id, nome, cargo, idade)

  test("empregados: ids unique & complete, ages clamped, no missing cargo") {
    forAll(Gen.nonEmptyListOf(genEmpregadoRow)) { rows =>
      val df = rows.toDF("id_empregado", "nome", "cargo", "idade")
      val out = EmpregadosEtl.treat(df).cache()
      val ids = out.select("id_empregado").collect().map(_.getInt(0)).toSeq
      assert(ids.distinct.length === ids.length)
      // null-key group dedups to ONE row which then gets a fresh id
      val expectedCount = rows.flatMap(_._1).distinct.length +
        (if (rows.exists(_._1.isEmpty)) 1 else 0)
      assert(ids.length === expectedCount)
      val outOfRange =
        out.filter(col("idade").isNotNull && (col("idade") < 18 || col("idade") > 70)).count()
      assert(outOfRange === 0L, "age escaped the clamp")
      assert(out.filter(Cleaning.isMissing(col("cargo"))).count() === 0L)
      assert(out.filter(trim(col("nome")) === "").count() === 0L)
      out.unpersist()
    }
  }

  private val genVendaRow = for {
    id <- Gen.choose(1, 80)
    data <- Gen.oneOf(Gen.const(""), Gen.const("15/03/2023"),
      Gen.const("01/06/2023"), Gen.const("garbage"))
    prod <- Gen.choose(1, 5)
    emp <- Gen.choose(1, 6)
    qty <- Gen.choose(1, 9)
    unit <- Gen.option(Gen.choose(1.0, 99.0).map(p => math.rint(p * 100) / 100))
    total <- Gen.option(Gen.choose(1.0, 999.0).map(p => math.rint(p * 100) / 100))
  } yield (id, data, prod, emp, qty, unit, total)

  test("vendas: every date valid after cascade; totals complete; count preserved") {
    val produtos = Seq((1, "Produto 1", 10.0, "A"), (2, "Produto 2", 20.0, "A"),
      (3, "Produto 3", 30.0, "B"), (4, "Produto 4", 40.0, "B"), (5, "Produto 5", 50.0, "C"))
      .toDF("id_produto", "nome", "preco", "categoria")
    forAll(Gen.nonEmptyListOf(genVendaRow)) { rows =>
      val df = rows.toDF("id_venda", "data", "id_produto", "id_empregado",
        "quantidade", "valor_unitario", "valor_total")
      val out = VendasEtl.treat(df, produtos, LocalDate.of(2025, 1, 1)).cache()
      assert(out.count() === rows.map(_._1).distinct.length.toLong, "rows lost (0% loss violated)")
      val badDates = out.filter(to_date(col("data"), "dd/MM/yyyy").isNull).count()
      assert(badDates === 0L, "invalid date survived the cascade")
      // whenever unit value exists post-fill, total must exist and,
      // for rows that had no total, equal quantidade * valor_unitario
      val badTotals = out
        .filter(col("valor_unitario").isNotNull && col("valor_total").isNull).count()
      assert(badTotals === 0L)
      out.unpersist()
    }
  }
}
