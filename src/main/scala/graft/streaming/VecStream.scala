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
    val ops = graft.operators.EmbeddingOps
    val cents = ops.semanticStandingCentroids(spark, dir)
    pairProbe(ops.semanticAssignRowLocal(vecs, cents),
      ops.semanticStandingMembers(spark, dir))
  }

  /** Same-cell cosine probe between an assigned arrival frame and a
    * members frame (both carrying cell/vec_id/v/nrm): threshold at
    * SemDedupTau, orientation-normalized, deduped — the one pair law
    * shared by the standing probe ([[semanticArrivals]]) and the
    * maintained-state face ([[maintainSemantic]]). The composed fold
    * is bit-identical to the batch probe's fused dot (the established
    * row-local contract), so StreamingSpec pins cos-for-cos equality.
    */
  private def pairProbe(asg: DataFrame, members: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    def dotC(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val ops = graft.operators.EmbeddingOps
    asg.select(col("cell"), col("vec_id").as("ia"),
      col("v").as("va"), col("nrm").as("na"))
      .join(members.select(col("cell"), col("vec_id").as("ib"),
        col("v").as("vb"), col("nrm").as("nb")), Seq("cell"))
      .filter(col("ia") =!= col("ib"))
      .withColumn("cos", dotC(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= lit(ops.SemDedupTau))
      .select(least(col("ia"), col("ib")).as("vec_a"),
        greatest(col("ia"), col("ib")).as("vec_b"), col("cos"))
      .dropDuplicates("vec_a", "vec_b")
  }

  /** STANDING semantic state for the maintained streaming refresh —
    * the in-memory twin of the `sem_blabels`/`sem_bkeep` memo stages
    * (the DocStream.StandingState discipline for the vector tier).
    */
  final class SemStandingState(initialLabels: DataFrame, initialKeep: DataFrame) {
    private var labels: DataFrame = initialLabels
    private var keep: DataFrame = initialKeep
    def labelsFrame: DataFrame = synchronized(labels)
    def keepFrame: DataFrame = synchronized(keep)
    def merge(pairs: DataFrame, arrivals: DataFrame): Unit = synchronized {
      val (l2, k2) = graft.operators.EmbeddingOps
        .mergeSemanticIntoStanding(labels, keep, pairs, arrivals)
      labels = l2
      keep = k2
    }
  }

  /** The FULL streaming semantic refresh — `sref`'s maintained-state
    * face: each micro-batch of arriving vectors assigns to its cell
    * row-locally, probes the vectors the state ALREADY KNOWS (standing
    * base + earlier admissions, their raw vectors read back from the
    * membership index — the vector-store lookup a deployment does)
    * plus the batch itself, and runs one admit → contract → converge →
    * relabel → re-elect transaction (EmbeddingOps.
    * mergeSemanticIntoStanding). Restricting the probe to known
    * vectors makes the face ORDER-ROBUST: a pair whose other endpoint
    * has not arrived yet is found when that endpoint's batch probes
    * back, and merging is idempotent and order-independent, so N
    * micro-batches land on the one-shot `sref` verdict table —
    * StreamingSpec pins it (modulo the per-run `reelected` flag, which
    * a standing table has no notion of).
    */
  def maintainSemantic(spark: SparkSession, vecs: DataFrame, dir: String,
      state: SemStandingState): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val ops = graft.operators.EmbeddingOps
    val cents = ops.semanticStandingCentroids(spark, dir)
    val membFull = ops.semanticMembers(spark, dir)
    vecs.select(col("vec_id"), col("v"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val asg = ops.semanticAssignRowLocal(batch, cents)
        val known = membFull
          .join(state.keepFrame.select("vec_id"), Seq("vec_id"), "left_semi")
        val bSide = known.select("cell", "vec_id", "v", "nrm")
          .unionByName(asg.select("cell", "vec_id", "v", "nrm"))
        val pairs = pairProbe(asg, bSide)
        state.merge(pairs.select("vec_a", "vec_b"),
          asg.select("vec_id", "cell", "ccos"))
      }
      .start()
  }
}
