package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph dataflow on the relational engine: PageRank over
  * the supplier↔part bipartite graph implied by lineitem. Each
  * iteration is one join (rank → edges) + one aggregation (sum of
  * neighbor contributions) — the textbook distributed PageRank shape,
  * with a FIXED iteration count so the whole computation is a single
  * declarative plan (no driver-side convergence loop; at 100 TB you'd
  * checkpoint the rank frame between iterations to truncate lineage,
  * which is a `.checkpoint()` call away).
  *
  * Determinism: float sums are partitioning-order-dependent, so each
  * contribution is floored to an integer at 1e15 scale before
  * summing — long sums are exact and order-independent, and `floor`
  * (unlike decimal casts or `round`) has identical semantics in every
  * engine. Total rank mass is 1, so the scaled sum stays ≤ ~1e15 —
  * no overflow at any node count.
  */
object GraphOps {

  /** Iterations — fixed so the plan is static and the oracle can
    * unroll the same number of CTE steps.
    */
  private[graft] val PageRankIters = 3

  /** Damping factor. */
  private[graft] val Damping = 0.85

  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    // undirected bipartite edges: s<suppkey> ↔ p<partkey>, deduped.
    // Node ids are LONGS through the whole iteration hot path —
    // suppliers on even keys (2k), parts on odd (2k+1), an injective
    // map, so distinct/join/groupBy semantics are those of the
    // original string ids while every shuffle carries 8-byte keys
    // instead of strings and the hash/compare work is integer. The
    // "s"/"p" string form is reconstructed only in the final output
    // projection, so the emitted rows (and their sort) are identical.
    // edges/degrees feed every iteration and the loop joins them
    // against frames derived from themselves — the self-join shape
    // where Spark's cache substitution does not reliably engage
    // (measured on dedup_clusters: the upstream pipeline re-ran every
    // round under plain persist). localCheckpoint physically truncates
    // the lineage so each iteration's plan starts from materialized
    // edge blocks; on a cluster the same call is `checkpoint()` to
    // reliable storage — the standard pre-iteration edge build
    // (GraphX's Pregel does exactly this).
    val li = Tables.lineitem(spark, dir)
      .select((col("l_suppkey").cast("long") * 2).as("a"),
        (col("l_partkey").cast("long") * 2 + 1).as("b"))
      .distinct()
    val edges = OpCaches.localCheckpointTracked(
      li.unionAll(li.select(col("b").as("a"), col("a").as("b"))))
    val degrees = OpCaches.localCheckpointTracked(
      edges.groupBy("a").agg(count(lit(1)).as("deg")))
    val n = degrees.count() // node count — one tiny job, result inlined as a literal
    // NOTE: pre-joining degree onto the edge list ("eDeg") was tried
    // and reverted after a direct A/B at sf1 showed steady-state
    // parity (±5%): the per-iteration join it removes — ranks ⋈
    // degrees, both skinny and node-keyed, co-partitioned with the
    // big edge join that follows — is nearly free, so the up-front
    // |E|-row materialization buys nothing. Simpler shape kept.
    var ranks = degrees.select(col("a").as("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to PageRankIters) {
      val contribs = ranks
        .join(degrees.withColumnRenamed("a", "node"), Seq("node"))
        .join(edges.withColumnRenamed("a", "node"), Seq("node"))
        .select(col("b").as("node"),
          floor(col("rank") / col("deg") * 1e15).cast("long").as("c"))
      ranks = contribs.groupBy("node")
        .agg(sum("c").as("cs"))
        .select(col("node"),
          (lit((1 - Damping) / n) + lit(Damping) * (col("cs") / 1e15)).as("rank"))
    }
    ranks
      .select(
        when(pmod(col("node"), lit(2)) === 0,
          concat(lit("s"), shiftright(col("node"), 1)))
          .otherwise(concat(lit("p"), shiftright(col("node"), 1)))
          .as("node"),
        round(col("rank") * 1e9).cast("long").as("rank_e9"))
      .orderBy("node")
  }
}
