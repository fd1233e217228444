package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the corpus pipeline's ingest stages — continuous
  * corpus ingestion for a crawl that never ends: the quality gate and
  * the exact content dedup run per micro-batch with watermark-bounded
  * state. The fingerprint is the SAME md5(lower(trim(text))) the batch
  * dedup / decontamination / composite use, so batch and stream agree
  * on what counts as a duplicate; `dropDuplicatesWithinWatermark`
  * keeps first-arrival semantics while letting Spark expire state
  * behind the horizon — an unwatermarked streaming dedup would hold
  * every fingerprint ever seen and OOM on an unbounded crawl.
  */
object DocStream {

  /** docs: streaming frame with (doc_id LONG, text STRING,
    * ingest_time TIMESTAMP). Emits the surviving (doc_id, n_tokens,
    * fp) rows in append mode.
    */
  def cleanDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens",
        size(graft.operators.TextOps.tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= graft.operators.PipelineOps.CorpusMinTokens)
      .withColumn("fp", md5(lower(trim(col("text")))))
      .withWatermark("ingest_time", "30 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("n_tokens"), col("fp"))
}
