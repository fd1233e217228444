package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, TopKByScore}

/** SparkSessionExtensions entry point: installs the engine's custom
  * Catalyst expressions as SQL functions at session build time —
  * the idiomatic deployment path for a cluster
  * (`spark.sql.extensions=graft.GraftExtensions`) as opposed to the
  * per-session VectorExprs.register call.
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * or
  *   --conf spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    // topk_by_score(score, id, k) — k must fold to an int at plan time
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"topk_by_score expects 3 arguments (score, id, k), got ${exprs.length}")
        val k = exprs(2) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"topk_by_score: k must be an INT, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"topk_by_score: k must be a foldable int expression, got $other")
        }
        TopKByScore(exprs(0), exprs(1), k)
      }))
  }
}
