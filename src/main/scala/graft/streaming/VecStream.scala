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
}
