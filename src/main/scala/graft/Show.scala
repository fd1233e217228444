package graft

/** Dev tool: print a registered query's result.
  * `sbt "runMain graft.Show <sfDir> <query> [n]"`
  */
object Show {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 2) args(2).toInt else 50
    val spark = GraftSession.build("graft-show")
    SparkEntry.queries(args(1))(spark, dir).show(n, truncate = false)
    spark.stop()
  }
}
