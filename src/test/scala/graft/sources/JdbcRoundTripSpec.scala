package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SalesPipeline

/** S5/S7 executed for real: the reference's deployment path is
  * clean → database → read back (load-data/l_vendas.py:71-125,
  * extract-transform-data/et_vendas.py:55-78). No Postgres exists in
  * this sandbox, but Derby's embedded JDBC driver ships with Spark's
  * jars, so the exact `writeJdbc(createTableColumnTypes)` /
  * `readJdbc(partitioned)` code paths round-trip against a real SQL
  * engine here — same Spark JDBC source, different dialect plugged in
  * by URL, which is precisely how the library would point at Postgres
  * in production.
  */
class JdbcRoundTripSpec extends AnyFunSuite {

  // Keep Derby's scratch space and log out of the repo.
  System.setProperty("derby.system.home", "/tmp/graft_derby")
  private val url = "jdbc:derby:/tmp/graft_derby/salesdb;create=true"

  lazy val spark: SparkSession = graft.GraftSession.build("jdbc-spec", "4")

  lazy val cleaned: SalesPipeline.Cleaned = SalesPipeline.loadBoundary(
    SalesPipeline.run(spark, "/root/reference/bases-de-dados", LocalDate.of(2025, 8, 27)))

  /** Row multiset with engine-portable values (ints→long, dates→ISO
    * strings, decimals→double) so a JDBC round-trip through NUMERIC /
    * DATE columns compares exactly.
    */
  private def rows(df: DataFrame): Map[Seq[Any], Int] = {
    import org.apache.spark.sql.types._
    val casted = df.schema.fields.map { f =>
      f.dataType match {
        case IntegerType | LongType | ShortType => col(f.name).cast("long")
        case DateType => col(f.name).cast("string")
        case _: DecimalType | DoubleType | FloatType => col(f.name).cast("double")
        case _ => col(f.name)
      }
    }
    df.select(casted: _*).collect().toSeq
      .map(_.toSeq).groupBy(identity).map { case (r, g) => r -> g.size }
  }

  test("all three cleaned tables round-trip through JDBC with the reference DDL types") {
    for ((name, df) <- Seq("produtos" -> cleaned.produtos,
                           "vendas" -> cleaned.vendas,
                           "empregados" -> cleaned.empregados)) {
      SalesIo.writeJdbc(df, url, name, "app", "app",
        columnTypes = Some(SalesIo.jdbcColumnTypes(name)))
      val back = SalesIo.readJdbc(spark, url, name, "app", "app")
      assert(back.count() === df.count(), s"$name row count")
      assert(rows(back) === rows(df), s"$name contents")
    }
  }

  test("partitioned JDBC scan returns the same rows across partition splits") {
    SalesIo.writeJdbc(cleaned.vendas, url, "vendas_p", "app", "app",
      columnTypes = Some(SalesIo.jdbcColumnTypes("vendas")))
    val whole = SalesIo.readJdbc(spark, url, "vendas_p", "app", "app")
    val split = SalesIo.readJdbc(spark, url, "vendas_p", "app", "app",
      partitionColumn = Some(("id_venda", 1L, 1000L, 8)))
    assert(split.rdd.getNumPartitions === 8)
    assert(rows(split) === rows(whole))
  }

  test("overwrite mode is a full replace (reference's DROP + CREATE semantics)") {
    val first = cleaned.produtos
    SalesIo.writeJdbc(first, url, "produtos_rw", "app", "app",
      columnTypes = Some(SalesIo.jdbcColumnTypes("produtos")))
    val half = first.limit(50)
    SalesIo.writeJdbc(half, url, "produtos_rw", "app", "app",
      columnTypes = Some(SalesIo.jdbcColumnTypes("produtos")))
    val back = SalesIo.readJdbc(spark, url, "produtos_rw", "app", "app")
    assert(back.count() === 50L, "stale rows survived the overwrite")
  }

  test("S10 bootstrap: idempotent check-then-create provisioning") {
    // Derby has schemas rather than users/databases, so the steps
    // target the system catalog it does have; the machinery (exists
    // guard -> DDL -> skip on rerun) is exactly what the Postgres step
    // list from the reference runs through. The Derby files persist in
    // /tmp across JVM runs, so the schema name is unique per run.
    val schema = s"GRAFT_APP_${System.nanoTime()}"
    val steps = Seq(Bootstrap.Step(s"schema:$schema",
      s"SELECT 1 FROM SYS.SYSSCHEMAS WHERE SCHEMANAME = '$schema'",
      Seq(s"CREATE SCHEMA $schema")))
    val first = Bootstrap.provision(url, "app", "app", steps)
    assert(first === Seq(s"schema:$schema"), "first run must create")
    val second = Bootstrap.provision(url, "app", "app", steps)
    assert(second.isEmpty, "rerun must be a no-op")
    // and the reference's Postgres plan is well-formed (two guarded steps)
    val pg = Bootstrap.postgresSteps("sales_db", "sales_user", "pw")
    assert(pg.map(_.name) === Seq("user:sales_user", "database:sales_db"))
    assert(pg.flatMap(_.createSql).exists(_.contains("CREATEDB")))
  }

  test("NUMERIC(10,2) DDL fidelity survives the database boundary") {
    SalesIo.writeJdbc(cleaned.vendas, url, "vendas_t", "app", "app",
      columnTypes = Some(SalesIo.jdbcColumnTypes("vendas")))
    val back = SalesIo.readJdbc(spark, url, "vendas_t", "app", "app")
    val vt = back.schema("valor_total").dataType
    assert(vt === org.apache.spark.sql.types.DecimalType(10, 2),
      s"expected NUMERIC(10,2), got $vt")
  }
}
