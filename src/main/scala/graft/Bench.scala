package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    // Untimed warmup: touch every table once so scan/file-index and
    // JIT first-touch costs don't land on whichever query runs first.
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // noop sink forces full evaluation of every operator (a count()
    // would let Catalyst prune projections, sorts and limits away).
    // A failed query reports -1 and is excluded from the total so a
    // regression can never make the benchmark look faster.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val good = results.values.filter(_ >= 0)
    val total = if (good.nonEmpty) good.sum else 0.0
    // "failures" is explicit so a consumer can never read a smaller
    // total (from an errored-out query) as an improvement.
    val failures = results.values.count(_ < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
