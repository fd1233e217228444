package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`
  * column), SURVEY.md §7.4:
  *
  *  - brute-force cosine top-k: the correctness baseline. The query
  *    set is broadcast, so the candidate scan is one narrow pass over
  *    the corpus — linear, no shuffle of the big side;
  *  - sign-LSH bucketed top-k: the scale path. Deterministic
  *    hyperplanes (axis signs of the leading dimensions) bucket the
  *    corpus; search touches only the query's bucket — at 100 TB the
  *    corpus would be written bucket-partitioned so a query prunes to
  *    one partition;
  *  - near-dup pairs above a cosine threshold.
  *
  * All math runs in double via higher-order functions (zip_with +
  * aggregate) — codegen'd, index-order accumulation, deterministic.
  */
object EmbeddingOps {

  /** Embedding as double array (float math differs between engines;
    * double is exact enough to make rank outputs stable).
    */
  private def vecD(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), vecD(col("embedding")).as("v"))

  val QueryCount = 20
  val TopK = 5

  /** Shared top-k tail: rank candidates per query by cosine (desc,
    * neighbor-id tie-break) and keep TopK — the single definition all
    * ANN variants and their oracles depend on.
    */
  private def topK(scored: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Brute-force exact cosine top-k for the first `QueryCount` vectors.
    * Output is rank-only (ints) so it is robust to last-ulp drift.
    */
  def annBruteTopK(spark: SparkSession, dir: String): DataFrame = {
    val base = corpus(spark, dir)
    val q = base.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val joined = base.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    topK(joined)
  }

  /** Brute-force top-k via the custom codegen'd CosineSimilarity
    * expression (graft.functions.VectorExprs) — one fused pass per
    * pair, no intermediate zipped arrays. Bitwise-identical output to
    * annBruteTopK (same index-order double accumulation), so it shares
    * that query's oracle.
    */
  def annBruteTopKNative(spark: SparkSession, dir: String): DataFrame = {
    val base = corpus(spark, dir)
    val q = base.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val joined = base.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", graft.functions.VectorExprs.cosineSim(col("qv"), col("v")))
    topK(joined)
  }

  /** Sign-LSH bucket id: one bit per leading dimension's sign. */
  def signBucket(v: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: search only the query's sign-LSH bucket. Recall is
    * partial by construction (that's the approximation); the plumbing
    * — bucket key, co-partitioned join — is what carries to 100 TB.
    */
  def annLshBucket(spark: SparkSession, dir: String): DataFrame = {
    val base = corpus(spark, dir).withColumn("bucket", signBucket(col("v")))
    val q = base.filter(col("vec_id") < QueryCount)
      .select(col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"))
    val joined = base.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    topK(joined)
  }

  /** IVF-style ANN: a deterministic coarse quantizer (every 125th
    * vector serves as a centroid — a k-means stand-in with no RNG so
    * the oracle can replicate it), each vector assigned to its nearest
    * centroid by cosine, queries searched only within their own cell
    * (nprobe=1). At real scale the corpus is written partitioned by
    * cell, so a query touches one partition; recall/latency trades via
    * nprobe exactly as in a production IVF index.
    */
  val IvfCentroidStride = 125

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.dotProduct
    // norms hoisted once per vector/centroid (same bitwise cosine as
    // the per-pair formula — see embNeardupPairs) so the N x C
    // assignment stage does one fused dot per pair, no re-derived norms
    val base = corpus(spark, dir)
      .withColumn("nrm", sqrt(dotProduct(col("v"), col("v"))))
    val cents = base.filter(col("vec_id") % IvfCentroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    // assign: nearest centroid by cosine, ties -> lowest centroid id
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("ccos"), col("cent_id"))
    val assigned = base.join(broadcast(cents), lit(true))
      .withColumn("ccos", dotProduct(col("cv"), col("v")) / (col("cnrm") * col("nrm")))
      .withColumn("arank", row_number().over(wAssign))
      .filter(col("arank") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
    val q = assigned.filter(col("vec_id") < QueryCount)
      .select(col("cell"), col("vec_id").as("query_id"), col("v").as("qv"))
    val joined = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    topK(joined)
  }

  /** Embedding near-duplicate pairs: cosine above threshold, id-ordered
    * pairs only (ints — ulp-safe). Full pairwise at test scale; the
    * LSH bucket key above is the blocking strategy at real scale.
    *
    * Hot-loop engineering: norms are computed ONCE per vector (not per
    * pair) and the pairwise term is the fused native DotProduct — the
    * composed zip_with+aggregate form allocates a zipped array per
    * pair and recomputes both norms, and was 20× slower at sf0.1. The
    * norm is sqrt(dot(v,v)) with identical accumulation order, so
    * cos = dot/(na*nb) stays bitwise-equal to the oracle's formula.
    */
  def embNeardupPairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.dotProduct
    val base = corpus(spark, dir)
      .withColumn("nrm", sqrt(dotProduct(col("v"), col("v"))))
    val a = base.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", dotProduct(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") > 0.45)
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }
}
