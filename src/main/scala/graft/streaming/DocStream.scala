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
  *  - quota: keyed by source with ONE Long of state per source
  *    (documents admitted so far), on BOTH stateful backends — the
  *    classic `flatMapGroupsWithState` (ingestCorpus) and Spark 4's
  *    `transformWithState` StatefulProcessor (ingestCorpusTws, RocksDB
  *    state store) — sharing one admission function, with a spec
  *    pinning backend equivalence. State is
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

  /** [[DocRow]] carrying the text through the quota — the
    * training-data composite's tokenizer stage runs AFTER admission,
    * and a stream cannot rejoin itself to recover the column.
    * n_words is the quality gate's whitespace count; the emitted
    * n_tokens (BPE) comes from the tokenizer stage downstream.
    */
  final case class DocRowT(doc_id: Long, source: String, lang: String,
    n_words: Long, text: String)

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

  /** Streaming twin of PipelineOps.splitCorpus: train/val/test
    * assignment over an unbounded document stream. The assignment is
    * a pure row-local function of (seed, doc_id) — no state, no
    * watermark, no shuffle — so the SAME columns apply verbatim and
    * every document gets the batch run's exact set no matter when it
    * arrives or how micro-batches slice the stream (StreamingSpec pins
    * stream ≡ batch). This row-locality is the point of the seeded
    * design: a randomSplit-style RNG draw cannot be twinned at all.
    * docs: streaming frame with at least (doc_id LONG, lang STRING).
    */
  def splitDocs(docs: DataFrame, seed: String = "graft:v1"): DataFrame = {
    val (bucket, split) = graft.operators.PipelineOps.splitAssignment(seed)
    docs.select(col("doc_id"), col("lang"),
      bucket.as("bucket"), split.as("split"))
  }

  /** Streaming twin of DedupOps.dedupDelta — near-dup detection of an
    * ARRIVING shard against the standing corpus, which is incremental
    * dedup's native shape: each streamed document's shingles,
    * MinHash signature, band hashes, and shingle-hash set are all
    * ROW-LOCAL array expressions (exactly the batch derivations:
    * min(md5(seed|shingle)) per seed, md5(concat(band rows)) per
    * band, xxhash64 per shingle), so the probe is two stream-STATIC
    * joins — bands against the standing (band, bh) index, then the
    * matched doc's verification arrays — plus a row-local exact
    * Jaccard. No shuffle of the stream, no state except the final
    * pair dedup (a doc pair sharing several bands surfaces once per
    * shared band; `dropDuplicates` collapses them — in production,
    * bound that state by watermarking on ingest time, the same
    * recipe cleanDocs uses). StreamingSpec pins stream ≡ batch
    * dedupDelta pair-for-pair including the jaccard doubles.
    *
    * CAVEAT — within-delta pairs: a stream-static join only sees the
    * STANDING index, so two near-dup documents that arrive in the
    * same in-flight shard are matched only if the shard has already
    * been appended to the index the stream probes (the fixture's
    * shape, and the batch-append-then-probe production cadence). In
    * a strictly probe-before-append deployment, delta↔delta pairs
    * within one refresh are missed — append each micro-batch to the
    * index before the next probes (batch `dedupDelta` sees them for
    * exactly this reason: its delta is already part of the banded
    * index it probes), or union a probe-self band join for the
    * in-flight shard at refresh time.
    * docs: streaming frame with at least (doc_id LONG, text STRING).
    */
  def deltaNearDups(spark: SparkSession, docs: DataFrame, dir: String,
      threshold: Double = 0.5): DataFrame = {
    import graft.operators.DedupOps
    val rowsPerBand = DedupOps.MinhashSeeds / DedupOps.MinhashBands
    val hs = (0 until DedupOps.MinhashSeeds).map { s =>
      array_min(transform(col("shs"),
        x => md5(concat_ws("|", lit(s.toString), x)))).as(s"h$s")
    }
    val bandCols = (0 until DedupOps.MinhashBands).map { bd =>
      val parts = (0 until rowsPerBand).map(r => col(s"h${bd * rowsPerBand + r}"))
      struct(lit(bd).as("band"), md5(concat(parts: _*)).as("bh"))
    }
    val probe = docs
      .select(col("doc_id").as("p_doc"), DedupOps.shingles(col("text")).as("shs"))
      .filter(size(col("shs")) > 0)
      .select((Seq(col("p_doc"),
        transform(col("shs"), x => xxhash64(x)).as("p_ss"),
        size(col("shs")).cast("long").as("p_n")) ++ hs): _*)
      .select(col("p_doc"), col("p_ss"), col("p_n"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("p_doc"), col("p_ss"), col("p_n"),
        col("b.band").as("band"), col("b.bh").as("bh"))
    val index = DedupOps.bandedRows(spark, dir)
      .select(col("doc_id").as("i_doc"), col("band"), col("bh"))
    val arrs = DedupOps.shingleHashArrays(spark, dir)
      .select(col("doc_id").as("i_doc"), col("ss").as("i_ss"),
        col("n").as("i_n"))
    probe.join(index, Seq("band", "bh"))
      .filter(col("p_doc") =!= col("i_doc"))
      .join(arrs, Seq("i_doc"))
      .withColumn("c",
        size(array_intersect(col("p_ss"), col("i_ss"))).cast("long"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("p_n") + col("i_n") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(least(col("p_doc"), col("i_doc")).as("doc_a"),
        greatest(col("p_doc"), col("i_doc")).as("doc_b"),
        col("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Streaming twin of TextOps.bpeEncode — the tokenizer pass of a
    * continuous ingest: the merge table trains ONCE on the standing
    * corpus (a static driver-side Seq, the state a deployment ships
    * with the job) and arriving documents encode ROW-LOCALLY through
    * TextOps.bpeEncodeRowLocal — no explode, no shuffle, no state, so
    * micro-batch slicing cannot change any document's counts
    * (StreamingSpec pins stream ≡ batch bpeEncode row-for-row).
    * docs: streaming frame with at least (doc_id LONG, text STRING).
    */
  def encodeDocs(spark: SparkSession, docs: DataFrame, dir: String): DataFrame =
    graft.operators.TextOps.bpeEncodeRowLocal(docs,
      graft.operators.TextOps.bpeLearnedMerges(spark, dir))

  /** Streaming twin of the trained ftq quality classifier — the
    * deployment shape of a GPT-3-style quality filter: the model
    * trains ONCE on the standing corpus (QualityOps.ftqStandingModel
    * — FtqBuckets doubles + one threshold, broadcast-once state) and
    * arriving documents score ROW-LOCALLY (same md5 bucket law,
    * integer-ratio features, literal-weight fold) — no shuffle, no
    * state, so micro-batch slicing cannot change any verdict
    * (StreamingSpec pins stream ≡ the batch relational feature
    * path doc-for-doc). docs: streaming (doc_id LONG, text STRING).
    */
  def scoreDocs(spark: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    // the pinned ftq_model stage: training runs once per session (the
    // deployment retrain), not once per stream wiring
    val (w, theta) = graft.operators.QualityOps.ftqStandingModelCached(spark, dir)
    graft.operators.QualityOps.ftqScoreRowLocal(
      docs.select(col("doc_id"), col("text")), w, theta)
      .select(col("doc_id"), col("score"), col("keep"))
  }

  /** Streaming twin of the DSIR importance selector — the deployment
    * shape of importance-weighted data admission: the target/source
    * model fits ONCE on the standing corpus
    * (QualityOps.dsirStandingModel — DsirBuckets per-cell scores +
    * the frozen selection threshold, broadcast-once state) and
    * arriving documents score ROW-LOCALLY (same gram construction,
    * md5 cell law, decimal-sum integer-mean) with keep = w ≥ θ — no
    * shuffle, no state, so micro-batch slicing cannot change any
    * verdict (StreamingSpec pins stream ≡ the batch weights
    * doc-for-doc). docs: streaming (doc_id LONG, text STRING).
    */
  def scoreDocsDsir(spark: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    val (ps, theta) = graft.operators.QualityOps.dsirStandingModel(spark, dir)
    graft.operators.QualityOps.dsirScoreRowLocal(
      docs.select(col("doc_id"), col("text")), ps, theta)
      .select(col("doc_id"), col("w_scaled"), col("keep"))
  }

  /** Streaming twin of TextOps.winnowFingerprints: winnowing is
    * per-document by construction, so arriving docs fingerprint
    * ROW-LOCALLY through TextOps.winnowRowLocal — no shuffle, no
    * state, micro-batch slicing cannot change any document's
    * selection (StreamingSpec pins stream ≡ batch fingerprint-for-
    * fingerprint). The use case is the arrival-time attribution
    * check: an arriving doc's fingerprints probe the standing
    * fingerprint index exactly like deltaNearDups probes the band
    * index. docs: streaming frame with (doc_id LONG, text STRING).
    */
  def fingerprintDocs(docs: DataFrame): DataFrame =
    graft.operators.TextOps.winnowRowLocal(docs)

  /** Streaming winnowing ATTRIBUTION — arriving docs probe the
    * standing df-capped fingerprint index (TextOps.winnowKept), the
    * deltaNearDups recipe applied to the MOSS tier: the arriving
    * doc's fingerprint SET is one row-local array
    * (TextOps.winnowFpSet), candidates come from ONE stream-static
    * equi-join on the fingerprint (work ∝ arriving fps × df, bounded
    * by the standing index's WinnowMaxDf cap), and the shared count
    * is a row-local array_intersect against the matched doc's kept
    * array — no shuffle of the stream, no state except the final pair
    * dedup. The arriving side needs NO df filter of its own: a
    * fingerprint over the cap was dropped from the standing index, so
    * it can neither match a candidate nor appear in the intersected
    * kept arrays — stream ≡ batch winnowOverlapDelta by construction
    * (StreamingSpec pins it pair-for-pair, counts included).
    * docs: streaming frame with (doc_id LONG, text STRING).
    */
  def attributeDocs(spark: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    import graft.operators.TextOps
    val kept = TextOps.winnowKept(spark, dir)
    val keptArr = kept.groupBy("doc_id")
      .agg(collect_set(col("fp")).as("i_fps"))
      .select(col("doc_id").as("i_doc"), col("i_fps"))
    val probe = TextOps.winnowFpSet(docs)
      .filter(size(col("fps")) > 0)
      .select(col("doc_id").as("p_doc"), col("fps").as("p_fps"))
    probe
      .select(col("p_doc"), col("p_fps"), explode(col("p_fps")).as("fp"))
      .join(kept.select(col("fp"), col("doc_id").as("i_doc")), Seq("fp"))
      .filter(col("p_doc") =!= col("i_doc"))
      .join(keptArr, Seq("i_doc"))
      .withColumn("n_shared",
        size(array_intersect(col("p_fps"), col("i_fps"))).cast("long"))
      .filter(col("n_shared") >= TextOps.WinnowMinShared)
      .select(least(col("p_doc"), col("i_doc")).as("doc_a"),
        greatest(col("p_doc"), col("i_doc")).as("doc_b"),
        col("n_shared"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** STANDING label state for the streaming incremental-dedup refresh
    * — the in-memory twin of the `base_labels` memo stage. Each
    * micro-batch's near-dup pairs merge in through exactly the batch
    * refresh's machinery (DedupOps.contractedMapping →
    * DedupOps.applyMapping): endpoints substitute to their standing
    * labels, the CONTRACTED graph (nodes ∝ batch pairs, never corpus)
    * converges driver-side, and one mapping join relabels the standing
    * frame. The merged frame is eagerly localCheckpointed per batch —
    * without truncation every batch's plan would embed all previous
    * batches' join trees (the iterative self-derived-frame rule), and
    * the merge must be durable before the next batch substitutes
    * against it. Merge order cannot change the fixpoint: the final
    * partition is the connected components of (base ∪ all merged
    * pairs) and each label is its component's min id — both
    * order-independent — so N micro-batches land on the SAME frame as
    * one batch refresh over their union (StreamingSpec pins it
    * against labelsIncremental).
    */
  final class StandingLabels(initial: DataFrame) {
    private var standing: DataFrame = initial
    def frame: DataFrame = synchronized(standing)
    def merge(pairs: DataFrame): Unit = synchronized {
      if (!pairs.isEmpty)
        standing = graft.operators.DedupOps
          .mergePairsIntoStanding(standing, pairs)
    }
  }

  /** The FULL standing refresh state — labels AND retention verdicts,
    * the streaming face of `linc` end-to-end: each micro-batch's pairs
    * AND arriving-doc quality rows run
    * DedupOps.mergeRefreshIntoStanding (admit new docs as keep
    * singletons → contract → converge → relabel → re-elect touched
    * clusters from standing scores → carry untouched). After N batches
    * the verdict table equals the one-shot batch refresh's (verdicts
    * are a pure function of final membership and immutable scores;
    * membership merging is order-independent, and admission is
    * idempotent — a doc admits once and reads from standing forever
    * after).
    */
  final class StandingState(initialLabels: DataFrame, initialKeep: DataFrame) {
    private var labels: DataFrame = initialLabels
    private var keep: DataFrame = initialKeep
    def labelsFrame: DataFrame = synchronized(labels)
    def keepFrame: DataFrame = synchronized(keep)
    def merge(pairs: DataFrame, freshQuality: DataFrame): Unit = synchronized {
      val (l2, k2) = graft.operators.DedupOps
        .mergeRefreshIntoStanding(labels, keep, pairs, freshQuality)
      labels = l2
      keep = k2
    }
  }

  /** The label face's sink shape: [[deltaNearDups]]' pair stream into
    * a foreachBatch merge callback. foreachBatch is the right sink
    * because the merge is a TRANSACTION against standing state
    * (mapping build + relabel + checkpoint), not a row-append; the
    * pair stream itself stays the stream-static probe deltaNearDups
    * documents. (The full refresh face needs the DOCS per batch — see
    * [[maintainRefresh]] — so it streams documents instead.)
    */
  private def maintainWith(spark: SparkSession, docs: DataFrame, dir: String,
      threshold: Double)(
      merge: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    deltaNearDups(spark, docs, dir, threshold)
      .select(col("doc_a"), col("doc_b"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => merge(batch) }
      .start()

  /** [[maintainLabels]] extended to the full refresh: each micro-batch
    * of arriving DOCS becomes one standing-state transaction — the
    * batch frame probes the standing index for pairs (the same
    * [[deltaNearDups]] logic, run as plain batch code inside
    * foreachBatch) and its row quality is scored ONCE (delta-sized
    * text work, the refresh's only text input), so genuinely new
    * documents admit as keep singletons and pair-bridged clusters
    * re-elect — labels AND verdicts maintained in the supplied
    * [[StandingState]].
    */
  def maintainRefresh(spark: SparkSession, docs: DataFrame, dir: String,
      state: StandingState,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docs.select(col("doc_id"), col("text"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = deltaNearDups(spark, batch, dir, threshold)
          .select(col("doc_a"), col("doc_b"))
        val fresh = graft.operators.TextOps.textQualityOn(batch)
          .select(col("doc_id"), col("quality_score"))
        state.merge(pairs, fresh)
      }
      .start()

  /** Streaming face of the incremental label refresh: each micro-batch
    * of pairs merges into the supplied [[StandingLabels]].
    */
  def maintainLabels(spark: SparkSession, docs: DataFrame, dir: String,
      state: StandingLabels,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    maintainWith(spark, docs, dir, threshold)(state.merge)

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
    corpusSurvivors(spark, docs, evalFps).groupByKey(_.source)
      .flatMapGroupsWithState[Long, DocRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val keep = admitSmallest(it, quota, admitted)
          if (keep.nonEmpty) state.update(admitted + keep.size)
          keep.iterator
      }
  }

  /** The three stateless-or-bounded pre-quota stages, shared by both
    * quota backends (flatMapGroupsWithState and transformWithState).
    */
  private def corpusSurvivors(spark: SparkSession, docs: DataFrame,
                              evalFps: DataFrame): Dataset[DocRow] = {
    import spark.implicits._
    docs
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
  }

  /** One micro-batch group's quota admission, shared by both state
    * backends. doc_id order within the micro-batch: deterministic
    * under replay of the same batch sequence (iterator order is not).
    * Bounded selection of the `room` smallest doc_ids — a hot source
    * pays O(group × log room) CPU and O(room) memory, never O(group)
    * memory for a full sort; with room == 0 (quota exhausted) it
    * costs O(1), not a materialize of every later group.
    */
  private[streaming] def admitSmallest(it: Iterator[DocRow], quota: Int,
                                       admitted: Long): Seq[DocRow] =
    admitSmallestBy(it, quota, admitted)(_.doc_id)

  /** The admission function over any row type with a doc_id — shared
    * by the corpus quota (DocRow) and the training-data composite's
    * text-carrying quota (DocRowT).
    */
  private[streaming] def admitSmallestBy[T](it: Iterator[T], quota: Int,
      admitted: Long)(id: T => Long): Seq[T] = {
    val room = math.max(0L, quota.toLong - admitted).toInt
    if (room == 0) Seq.empty
    else {
      val heap = new scala.collection.mutable.PriorityQueue[T]()(
        Ordering.by(id)) // max-heap: evict largest doc_id
      it.foreach { row =>
        if (heap.size < room) heap.enqueue(row)
        else if (id(row) < id(heap.head)) {
          heap.dequeue(); heap.enqueue(row)
        }
      }
      heap.dequeueAll.reverse // ascending doc_id
    }
  }

  /** THE streaming training-data composite — the maintained-state
    * face of PipelineOps.trainingData, the capstone of the
    * incremental family: arriving documents flow
    *
    *   quality gate → watermarked exact dedup → eval decontamination
    *   → per-source quota (text carried through the one Long of
    *   state) → SEMANTIC dedup against the STANDING drop set (one
    *   stream-static broadcast anti-join — the state a deployment
    *   refreshes with sref, read-only per micro-batch) → row-local
    *   BPE token-ID encode under the COLLECTED standing tokenizer
    *   (merge rules + id map, KBs) → seeded split,
    *
    * per micro-batch, in append mode. Emits (doc_id, source, lang,
    * n_tokens, token_ids, split) — exactly the batch twin
    * PipelineOps.trainingDataOn's columns; the corpus-order tails
    * (pack bin, epoch position) are shard-write-time quantities over
    * the accumulated survivors, not per-arrival facts. StreamingSpec
    * pins N micro-batches with cross-batch duplicate and semantic
    * pairs ≡ the one-shot batch chain on the same rows.
    *
    * docs: streaming frame with (doc_id LONG, source STRING, lang
    * STRING, text STRING, ingest_time TIMESTAMP); evalFps: static
    * benchmark fingerprints (`fp`).
    *
    * Batch-equivalence PRECONDITIONS (the ≡ trainingDataOn law holds
    * only under these; a deployment that violates them gets a valid
    * stream but a different survivor set than the one-shot batch run):
    *  - duplicates arrive in doc_id order (or only the first arrival
    *    matters): dropDuplicatesWithinWatermark keeps the first
    *    ARRIVAL per fingerprint, while the batch twin's
    *    corpusSurvivorsFrom keeps the MIN doc_id — equal exactly when
    *    the smallest doc_id of each duplicate group arrives first;
    *  - the per-source quota never binds mid-stream: admitSmallestBy
    *    admits the smallest doc_ids seen SO FAR per batch, while the
    *    batch quota ranks the whole corpus by md5(doc_id) — the two
    *    agree when every survivor is admitted (quota not binding), as
    *    at the engine's defaults, but a binding quota selects
    *    different rows.
    */
  def ingestTrainingData(spark: SparkSession, docs: DataFrame,
      evalFps: DataFrame, dir: String,
      quota: Int = graft.operators.PipelineOps.SourceQuota,
      seed: String = "graft:v1"): DataFrame =
    ingestTrainingDataGated(spark, docs, evalFps, dir, quota, seed,
      gated = false)

  /** [[ingestTrainingData]] with the TRAINED quality classifier gating
    * the survivors — the streaming face of
    * PipelineOps.trainingDataFtq, reusing [[scoreDocs]]' row-local
    * scorer: after the semantic anti-join, each arrival scores
    * per-row under the collected standing model (pinned `ftq_model`
    * stage — FtqBuckets doubles + one threshold, broadcast-once
    * state) and only keep verdicts flow into the tokenizer. No
    * shuffle, no state added, so micro-batch slicing cannot change
    * any verdict; StreamingSpec pins N micro-batches ≡ the batch twin
    * PipelineOps.trainingDataFtqOn doc-for-doc (same preconditions as
    * [[ingestTrainingData]]).
    */
  def ingestTrainingDataFtq(spark: SparkSession, docs: DataFrame,
      evalFps: DataFrame, dir: String,
      quota: Int = graft.operators.PipelineOps.SourceQuota,
      seed: String = "graft:v1"): DataFrame =
    ingestTrainingDataGated(spark, docs, evalFps, dir, quota, seed,
      gated = true)

  private def ingestTrainingDataGated(spark: SparkSession, docs: DataFrame,
      evalFps: DataFrame, dir: String, quota: Int, seed: String,
      gated: Boolean): DataFrame = {
    import spark.implicits._
    val surv = docs
      .withColumn("n_words",
        size(graft.operators.TextOps.tokens(col("text"))).cast("long"))
      .filter(col("n_words") >= graft.operators.PipelineOps.CorpusMinTokens)
      .withColumn("fp", md5(lower(trim(col("text")))))
      .withWatermark("ingest_time", "30 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(evalFps.select(col("fp"))), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"), col("n_words"),
        col("text"))
      .as[DocRowT]
    val admitted = surv.groupByKey(_.source)
      .flatMapGroupsWithState[Long, DocRowT](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L)
          val keep = admitSmallestBy(it, quota, n)(_.doc_id)
          if (keep.nonEmpty) state.update(n + keep.size)
          keep.iterator
      }
    val semantic = admitted.toDF()
      .join(broadcast(graft.operators.EmbeddingOps.semanticDropIds(spark, dir)
        .select(col("vec_id").as("doc_id"))), Seq("doc_id"), "left_anti")
    // the trained-filter gate (ftq composite only): row-local scoring
    // under the collected standing model, keep verdicts flow on with
    // their payload — scoreDocs' scorer inlined into the cascade
    val filtered =
      if (!gated) semantic
      else {
        val (w, theta) =
          graft.operators.QualityOps.ftqStandingModelCached(spark, dir)
        graft.operators.QualityOps.ftqScoreRowLocal(
          semantic.select(col("doc_id"), col("source"), col("lang"),
            col("text")), w, theta)
          .filter(col("keep")).drop("score", "keep")
      }
    val encoded = graft.operators.TextOps.bpeTokenIdsRowLocal(
      filtered.select(col("doc_id"), col("source"), col("lang"), col("text")),
      graft.operators.TextOps.bpeLearnedMerges(spark, dir),
      graft.operators.TextOps.bpeStandingIdMap(spark, dir))
    val (_, split) = graft.operators.PipelineOps.splitAssignment(seed)
    encoded.withColumn("split", split)
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        col("token_ids"), col("split"))
  }

  /** The per-source quota as a Spark 4 `StatefulProcessor` — the
    * modern stateful API (typed per-key state handles, TTL support,
    * timers; requires the RocksDB state store provider). Identical
    * semantics to the flatMapGroupsWithState quota above: ONE Long of
    * state per source, first-Q-arrivals admission, doc_id-ordered
    * within a micro-batch. StreamingSpec pins backend equivalence —
    * same input files, same admitted rows.
    */
  final class SourceQuotaProcessor(quota: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, DocRow, DocRow] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var admitted: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[DocRow],
        timerValues: TimerValues): Iterator[DocRow] = {
      val cur = if (admitted.exists()) admitted.get() else 0L
      val keep = admitSmallest(rows, quota, cur)
      if (keep.nonEmpty) admitted.update(cur + keep.size)
      keep.iterator
    }
  }

  /** ingestCorpus on the transformWithState backend. Caller must run
    * with `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (the API requires it).
    */
  def ingestCorpusTws(spark: SparkSession, docs: DataFrame, evalFps: DataFrame,
                      quota: Int = graft.operators.PipelineOps.SourceQuota): Dataset[DocRow] = {
    import org.apache.spark.sql.streaming.TimeMode
    import spark.implicits._
    corpusSurvivors(spark, docs, evalFps).groupByKey(_.source)
      .transformWithState(new SourceQuotaProcessor(quota),
        TimeMode.None(), OutputMode.Append)
  }
}
