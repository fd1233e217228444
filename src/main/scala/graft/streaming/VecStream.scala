package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming face of the ANN index maintenance family — the serving
  * path of `pinc` (EmbeddingOps.pqCodesIncremental): vectors arriving
  * on a stream encode against the STANDING codebook + coarse
  * centroids and their code rows append to the standing `pq_codes`
  * index.
  *
  * Shape: the standing state is collected once (K centroids + K·m
  * codebook sub-vectors ≈ 4 KB — the broadcast-to-executors story at
  * any corpus size) and the encoder is a pure row-local projection
  * (EmbeddingOps.pqEncodeRowLocal): coarse assignment, residual, and
  * per-sub-space argmin all run as column expressions over literal
  * arrays, so there is NO stream shuffle and NO state store — the
  * same columns that make splitDocs/encodeDocs exact streaming twins.
  * The op chains are bit-identical to the batch encoder's, so
  * StreamingSpec pins stream ≡ batch `pinc` code-for-code.
  */
object VecStream {

  /** vecs: streaming frame with (vec_id LONG, v ARRAY<DOUBLE>) — the
    * arriving shard (the batch fixture's delta slice). Emits
    * (vec_id, cell, j, code) append rows, the exact shape the standing
    * code index stores.
    */
  def encodeArrivals(spark: SparkSession, vecs: DataFrame, dir: String): DataFrame = {
    val (cents, cb) = graft.operators.EmbeddingOps.pqStandingState(spark, dir)
    graft.operators.EmbeddingOps.pqEncodeRowLocal(vecs, cents, cb)
  }

  /** Streaming face of the semantic-dedup probe (`sinc` —
    * EmbeddingOps.semanticDedupDelta): arriving vectors assign to
    * their trained cell ROW-LOCALLY against the collected centroid
    * state, then probe the STANDING cell membership with ONE
    * stream-static equi-join on the cell — no stream shuffle, no
    * state store. Emits the same normalized (vec_a, vec_b, cos) rows
    * as the batch probe restricted to arrival × standing pairs
    * (StreamingSpec pins it, cos bit-for-bit); arrival-arrival pairs
    * across micro-batches need a maintained-state face
    * (DocStream.maintainLabels' pattern) — the batch `sinc` query
    * covers them, and the restriction is documented here, not silent.
    */
  def semanticArrivals(spark: SparkSession, vecs: DataFrame, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val ops = graft.operators.EmbeddingOps
    val cents = ops.semanticStandingCentroids(spark, dir)
    val standing = ops.semanticStandingMembers(spark, dir)
      .select(col("cell"), col("vec_id").as("ib"),
        col("v").as("vb"), col("nrm").as("nb"))
    def dotC(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    ops.semanticAssignRowLocal(vecs, cents)
      .select(col("cell"), col("vec_id").as("ia"),
        col("v").as("va"), col("nrm").as("na"))
      .join(standing, Seq("cell"))
      .filter(col("ia") =!= col("ib"))
      .withColumn("cos", dotC(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= lit(ops.SemDedupTau))
      .select(least(col("ia"), col("ib")).as("vec_a"),
        greatest(col("ia"), col("ib")).as("vec_b"), col("cos"))
  }
}
