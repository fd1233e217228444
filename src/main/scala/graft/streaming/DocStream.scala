package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the corpus pipeline — continuous corpus ingestion
  * for a crawl that never ends, covering all four stages of the batch
  * composite (`PipelineOps.corpusStagesFrom`): quality gate → exact
  * content dedup → eval-set decontamination → per-source quota.
  *
  * Stage-by-stage streaming design:
  *
  *  - quality gate: stateless row filter, identical constant
  *    (`PipelineOps.CorpusMinTokens`) and tokenizer as batch.
  *  - dedup: the fingerprint is the SAME md5(lower(trim(text))) the
  *    batch dedup / decontamination / composite use, so batch and
  *    stream agree on what counts as a duplicate;
  *    `dropDuplicatesWithinWatermark` keeps first-arrival semantics
  *    while letting Spark expire state behind the horizon — an
  *    unwatermarked streaming dedup would hold every fingerprint ever
  *    seen and OOM on an unbounded crawl.
  *  - decontamination: a stream-static LEFT ANTI join against the eval
  *    fingerprint frame. The benchmark set is static by nature, so the
  *    static side is broadcast once and the join is STATELESS — no
  *    watermark, no state store, exactly the shape Structured
  *    Streaming supports today.
  *  - quota: `flatMapGroupsWithState` keyed by source with ONE Long of
  *    state per source (documents admitted so far). State is
  *    O(#sources × 8 bytes) with NoTimeout — deliberate: a quota must
  *    remember its count forever or it is not a quota, and the key
  *    space (crawl domains) is bounded, unlike fingerprints. Semantic
  *    difference from batch, stated loudly: the batch quota selects a
  *    deterministic md5-ranked pseudo-random subset (it can see the
  *    whole corpus); a stream cannot rank what has not arrived without
  *    unbounded buffering, so the streaming quota admits the FIRST Q
  *    arrivals per source (doc_id-ordered within a micro-batch, so a
  *    replay of the same batch sequence emits identical rows).
  *
  * Batch ≡ stream, precisely: when the quota does not bind, the two
  * agree provided (a) arrival order matches doc_id order for every
  * duplicate pair — batch dedup keeps the LOWEST doc_id per
  * fingerprint while the stream keeps the FIRST arrival, so a
  * higher-id duplicate arriving first survives with a different
  * doc_id/source/lang — and (b) no duplicate pair spans the watermark
  * horizon, past which the stream's expired state re-admits content
  * batch would drop. StreamingSpec's equivalence fixture satisfies
  * both; its expiry test pins the horizon trade explicitly.
  */
object DocStream {

  final case class DocRow(doc_id: Long, source: String, lang: String,
    n_tokens: Long)

  /** docs: streaming frame with (doc_id LONG, text STRING,
    * ingest_time TIMESTAMP). Emits the surviving (doc_id, n_tokens,
    * fp) rows in append mode — the original two-stage ingest, kept as
    * the minimal quality+dedup entry point.
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

  /** The full streaming composite. docs: streaming frame with (doc_id
    * LONG, source STRING, lang STRING, text STRING, ingest_time
    * TIMESTAMP); evalFps: STATIC frame with the benchmark-set
    * fingerprints in column `fp` (same md5(lower(trim)) normalization
    * — shared with every batch consumer). Emits surviving (doc_id,
    * source, lang, n_tokens) rows in append mode.
    */
  def ingestCorpus(spark: SparkSession, docs: DataFrame, evalFps: DataFrame,
                   quota: Int = graft.operators.PipelineOps.SourceQuota): Dataset[DocRow] = {
    import spark.implicits._
    val survivors = docs
      .withColumn("n_tokens",
        size(graft.operators.TextOps.tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= graft.operators.PipelineOps.CorpusMinTokens)
      .withColumn("fp", md5(lower(trim(col("text")))))
      .withWatermark("ingest_time", "30 minutes")
      .dropDuplicatesWithinWatermark("fp")
      // holdout-slot exclusion, SAME predicate as the batch composite
      // (corpusStagesFrom): eval-slot docs are held out of training
      // even when their fingerprint is not (yet) in the supplied
      // static set — without this, an eval-slot doc unseen by evalFps
      // would leak into training output where batch holds it out
      .filter(col("doc_id") % 50 =!= 0)
      // stream-static anti-join: stateless, static side broadcast
      .join(broadcast(evalFps.select(col("fp"))), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"))
      .as[DocRow]
    survivors.groupByKey(_.source)
      .flatMapGroupsWithState[Long, DocRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(0L, quota.toLong - admitted).toInt
          if (room == 0) {
            // quota exhausted: a hot source must cost O(1), not a full
            // materialize+sort of every later micro-batch group
            Iterator.empty
          } else {
            // doc_id order within the micro-batch: deterministic under
            // replay of the same batch sequence (iterator order is not).
            // Bounded selection of the `room` smallest doc_ids — a hot
            // source pays O(group × log room) CPU and O(room) memory,
            // never O(group) memory for a full sort.
            val heap = new scala.collection.mutable.PriorityQueue[DocRow]()(
              Ordering.by(_.doc_id)) // max-heap: evict largest doc_id
            it.foreach { row =>
              if (heap.size < room) heap.enqueue(row)
              else if (row.doc_id < heap.head.doc_id) {
                heap.dequeue(); heap.enqueue(row)
              }
            }
            val keep = heap.dequeueAll.reverse // ascending doc_id
            if (keep.nonEmpty) state.update(admitted + keep.size)
            keep.iterator
          }
      }
  }
}
