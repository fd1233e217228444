package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** Streaming results must agree with their DuckDB-oracled batch twins:
  * drive each streaming query to completion with a memory sink over
  * the finite sf0.001 events file and compare row sets.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("streaming-spec", "4")
  val sf = "/root/testdata/sf0.001"

  private def runToCompletion(df: org.apache.spark.sql.DataFrame,
                              name: String, mode: String): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming tumbling window matches batch twin") {
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.tumblingCounts(events), "tumbling", "complete")
    val streamed = spark.table("tumbling")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventOps.tumblingWindow(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
  }

  test("streaming sliding window matches batch twin") {
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.slidingCounts(events), "sliding", "complete")
    val streamed = spark.table("sliding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventOps.slidingWindow(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }

  test("session_window session count matches batch sessionize") {
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.sessionWindows(events), "sessions", "complete")
    val streamed = spark.table("sessions")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = EventOps.sessionize(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }

  test("streaming KMV sketch: retained arrays EXACTLY equal the batch twin per window") {
    // the custom TypedImperativeAggregate's serialized buffer lives in
    // the state store between micro-batches; if streaming state
    // save/restore or cross-batch merge() corrupted a single element,
    // the array equality breaks. k=8 saturates on sf0.001's 15
    // distinct users per full daily window, so the estimator path
    // (not exact-mode passthrough) is what both sides exercise.
    val k = 8
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.windowedDistinctSketch(events, k),
      "theta_stream", "complete")
    val streamed = spark.table("theta_stream")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getDouble(2))).toMap
    val batchEvents = graft.sources.Tables.events(spark, sf)
      .withColumn("event_time",
        timestamp_seconds(graft.operators.TimeSeriesOps.epochSecExpr("ts")))
    val batch = EventStream.windowedDistinctSketch(batchEvents, k)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getDouble(2))).toMap
    assert(streamed.keySet === batch.keySet, "window sets diverged")
    streamed.foreach { case (w, (sk, est)) =>
      assert(sk === batch(w)._1, s"window $w sketch arrays diverged")
      assert(est === batch(w)._2, s"window $w estimates diverged")
    }
    // saturated (estimator regime) and the estimate is sane: within
    // 75% of the exact per-window distinct at this tiny k (RSE ~41%;
    // the hash is fixed so the observed errors are deterministic)
    val exact = batchEvents
      .groupBy(window(col("event_time"), "1 day"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getStruct(0).getTimestamp(0).getTime / 1000 ->
        r.getLong(1)).toMap
    streamed.foreach { case (w, (sk, est)) =>
      assert(sk.length === math.min(k, exact(w).toInt),
        s"window $w sketch size off")
      assert(math.abs(est - exact(w)) <= 0.75 * exact(w),
        s"window $w estimate far off: $est vs ${exact(w)}")
    }
    assert(streamed.exists(_._2._1.length == k),
      "no window saturated the sketch — estimator untested")
  }

  test("stream-static join matches the batch equivalent") {
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.enrichedCounts(spark, events, sf), "enriched", "complete")
    val streamed = spark.table("enriched")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val batch = EventStream.enrichedCounts(spark, batchEvents, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }

  test("streaming split twin ≡ batch splitCorpus, row for row") {
    val docsSchema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
    runToCompletion(DocStream.splitDocs(stream), "split_stream", "append")
    val streamed = spark.table("split_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val batch = graft.operators.PipelineOps.splitCorpus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed === batch,
      "stream and batch split assignments diverged")
    // and a different seed re-deals on the stream exactly as in batch
    runToCompletion(DocStream.splitDocs(stream, seed = "graft:v2"),
      "split_stream2", "append")
    val streamed2 = spark.table("split_stream2").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val batch2 = graft.operators.PipelineOps.splitCorpus(spark, sf, seed = "graft:v2")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(streamed2 === batch2)
  }

  test("streaming delta-dedup twin ≡ batch dedupDelta, jaccard doubles included") {
    // sf0.01: the smallest SF where minhash emits pairs. The arriving
    // shard (every fifth doc — dedupDelta's demo predicate) streams
    // against the standing index; pairs AND their exact-Jaccard values
    // must match the batch probe bitwise (same row-local derivations).
    val dir = "/root/testdata/sf0.01"
    val docsSchema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .filter(col("doc_id") % 5 === 0)
    runToCompletion(DocStream.deltaNearDups(spark, stream, dir),
      "delta_stream", "append")
    val streamed = spark.table("delta_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.DedupOps.dedupDelta(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed.nonEmpty && streamed === batch,
      s"stream ${streamed.size} pairs vs batch ${batch.size}")
  }

  test("streaming label maintenance ≡ batch labelsIncremental after N micro-batches") {
    // the refresh's streaming face: delta docs arrive over THREE
    // micro-batches; each batch's near-dup pairs merge into standing
    // labels via the contracted-graph transaction. The fixpoint is
    // order-independent (components of base ∪ all pairs, min-id
    // labels), so the final standing frame must equal the one-shot
    // batch refresh over the same delta — frame-for-frame.
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val delta = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(delta.length >= 3, "fixture too small to slice into micro-batches")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val docs = src.toDF().toDF("doc_id", "text")
    val state = new DocStream.StandingLabels(
      graft.operators.DedupOps.baseLabels(spark, dir))
    val q = DocStream.maintainLabels(spark, docs, dir, state)
    val nBefore = state.frame.count()
    delta.grouped(delta.length / 3 + 1).foreach { chunk =>
      src.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = state.frame.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.DedupOps.labelsIncremental(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed === batch,
      "streamed standing labels diverged from the batch refresh")
    // and the stream actually merged something (standing state moved)
    assert(streamed.exists { case (id, lbl) => id != lbl } || nBefore < streamed.size,
      "fixture produced no label movement")
  }

  test("streaming BPE encode ≡ batch bpeEncode, row for row") {
    val docsSchema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
    runToCompletion(DocStream.encodeDocs(spark, stream, sf), "bpenc_stream", "append")
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) -> (1 to 3).map(i =>
        if (r.isNullAt(i)) null else r.getLong(i))).toMap
    val streamed = keyed(spark.table("bpenc_stream").collect())
    val batch = keyed(graft.operators.TextOps.bpeEncode(spark, sf).collect())
    assert(streamed.nonEmpty && streamed === batch,
      "streamed BPE encode diverged from batch")
  }

  test("streaming training-data composite ≡ the one-shot batch chain, doc for doc") {
    import spark.implicits._
    // the full maintained-state cascade: quality → watermarked dedup →
    // decontamination → quota → STANDING semantic drop → row-local BPE
    // token ids → split, across micro-batches with a cross-batch
    // duplicate pair and a semantic-drop member. Standing state
    // (semantic drop set, merge rules, id map) comes from the sf0.001
    // corpus; fixture text uses only that corpus' vocabulary so every
    // symbol is in the tokenizer's id map on both paths. Quota does
    // not bind (≤2 docs/source), where stream and batch admission
    // provably agree.
    val dir = java.nio.file.Files.createTempDirectory("graft_tdstream").toString
    val dropIds = graft.operators.EmbeddingOps
      .semanticDropIds(spark, sf).collect().map(_.getLong(0))
    assert(dropIds.nonEmpty, "standing corpus has no semantic drops")
    // a fixture id that IS semantically dropped, not eval-slot, not
    // in the delta-free paths' way
    // fixture ids sit ABOVE the standing corpus' id range so the
    // standing drop set can never touch the intended survivors
    val dStar = dropIds.filter(_ % 50 != 0).min
    val t0 = 1700000000L
    val textA = "scan column window order sort part agg value line key join"
    val textB = "merge query group vector hash slow stream filter fast the spark"
    val textC = "batch table small data big customer row scan column window sort"
    val textE = "the fast key order sort table scan merge part window small"
    val rows = Seq(
      (100001L, "s1", "en", textA, t0),            // survives
      (100002L, "s2", "en", " " + textA + " ", t0 + 7200), // cross-batch dup
      (100003L, "s1", "de", textB, t0 + 7200),     // survives
      (100004L, "s2", "en", "scan column window", t0), // quality gate (< 10 tokens)
      (dStar, "s3", "en", textC, t0),           // semantic drop via standing state
      (100050L, "s3", "en", textE, t0))         // eval-slot doc (% 50 == 0)
    def batchDf = rows.toDF("doc_id", "source", "lang", "text", "es")
    def write(sel: Seq[Long]): Unit = batchDf
      .filter(col("doc_id").isin(sel: _*))
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        timestamp_seconds(col("es")).as("ingest_time"))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(Seq(100001L, 100004L, dStar))
    write(Seq(100002L, 100003L, 100050L))
    val evalFps = batchDf
      .filter(size(graft.operators.TextOps.tokens(col("text"))) >=
        graft.operators.PipelineOps.CorpusMinTokens && col("doc_id") % 50 === 0)
      .select(md5(lower(trim(col("text")))).as("fp")).distinct()
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, lang STRING, text STRING, ingest_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = DocStream.ingestTrainingData(spark, stream, evalFps, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("tdata_stream").start()
    q.processAllAvailable()
    q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getString(5))).toMap
    val streamed = keyed(spark.table("tdata_stream").collect())
    val batch = keyed(graft.operators.PipelineOps.trainingDataOn(
      spark, sf, batchDf.select("doc_id", "source", "lang", "text")).collect())
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed === batch, s"stream $streamed != batch $batch")
    // the cascade actually fired every stage: the dup, the
    // quality-gated doc, the eval doc, and the semantic member are out
    assert(streamed.keySet === Set(100001L, 100003L))
    // and the survivors carry real id sequences
    streamed.values.foreach { case (_, _, n, ids, split) =>
      assert(n > 0 && ids.split(",").length.toLong === n)
      assert(Set("train", "val", "test").contains(split))
    }
  }

  test("streaming ftq-GATED composite ≡ the batch twin, and the trained gate binds") {
    import spark.implicits._
    // the trained-filter cascade: the standing model (pinned ftq_model
    // stage, trained on the sf0.001 corpus) gates survivors row-locally
    // between the semantic anti-join and the tokenizer. Fixture: two
    // lexicon-heavy docs the model keeps, one corpus-common-words doc
    // it drops — so the gate must BIND, not just pass everything.
    val dir = java.nio.file.Files.createTempDirectory("graft_ftdstream").toString
    val t0 = 1700000000L
    val textA = "scan column window order sort part agg value line key join"
    val textB = "merge query group vector hash slow stream filter fast the spark"
    val textD = "the slow big data row line column value table group order"
    val rows = Seq(
      (100001L, "s1", "en", textA, t0),
      (100003L, "s1", "de", textB, t0 + 7200),
      (100007L, "s2", "en", textD, t0))
    def batchDf = rows.toDF("doc_id", "source", "lang", "text", "es")
    def write(sel: Seq[Long]): Unit = batchDf
      .filter(col("doc_id").isin(sel: _*))
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        timestamp_seconds(col("es")).as("ingest_time"))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(Seq(100001L, 100007L))
    write(Seq(100003L))
    val evalFps = batchDf.filter(col("doc_id") % 50 === 0)
      .select(md5(lower(trim(col("text")))).as("fp")).distinct()
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, lang STRING, text STRING, ingest_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = DocStream.ingestTrainingDataFtq(spark, stream, evalFps, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("ftd_stream").start()
    q.processAllAvailable()
    q.stop()
    def keyed(rs: Array[org.apache.spark.sql.Row]) = rs
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getString(5))).toMap
    val streamed = keyed(spark.table("ftd_stream").collect())
    val batch = keyed(graft.operators.PipelineOps.trainingDataFtqOn(
      spark, sf, batchDf.select("doc_id", "source", "lang", "text")).collect())
    val plain = graft.operators.PipelineOps.trainingDataOn(
      spark, sf, batchDf.select("doc_id", "source", "lang", "text"))
      .collect().map(_.getLong(0)).toSet
    val (w, theta) = graft.operators.QualityOps.ftqStandingModelCached(spark, sf)
    val keepIds = graft.operators.QualityOps.ftqBatchScoresOn(
      batchDf.select(col("doc_id"), col("text")), w, theta)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    graft.operators.DedupOps.releaseTransients(spark)
    // stream ≡ batch twin, doc for doc
    assert(streamed === batch, s"stream $streamed != batch $batch")
    // the gate is exactly the trained verdict applied to the plain
    // composite's survivors — and it BINDS on this fixture
    assert(streamed.keySet === plain.intersect(keepIds),
      s"gated ${streamed.keySet} != plain $plain ∩ keep $keepIds")
    assert(streamed.keySet.nonEmpty && streamed.keySet != plain,
      s"fixture is vacuous: gate dropped nothing (plain=$plain, keep=$keepIds)")
  }

  test("streaming ftq scoring ≡ the batch relational feature path, doc for doc") {
    val docsSchema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
    runToCompletion(DocStream.scoreDocs(spark, stream, sf), "ftq_stream", "append")
    val streamed = spark.table("ftq_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val (w, theta) = graft.operators.QualityOps.ftqStandingModel(spark, sf)
    val batch = graft.operators.QualityOps.ftqBatchScores(spark, sf, w, theta)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed.nonEmpty && streamed === batch,
      "streamed quality scores diverged from the batch feature path")
    // the verdict actually splits the corpus (not all-keep/all-drop)
    assert(streamed.values.exists(_._2) && streamed.values.exists(!_._2))
  }

  test("streaming dsir scoring ≡ the batch importance weights, doc for doc") {
    val docsSchema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
    runToCompletion(DocStream.scoreDocsDsir(spark, stream, sf),
      "dsir_stream", "append")
    val streamed = spark.table("dsir_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val (_, theta) = graft.operators.QualityOps.dsirStandingModel(spark, sf)
    val batch = graft.operators.QualityOps.dsirSelect(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(3) >= theta)).toMap
    graft.operators.DedupOps.releaseTransients(spark)
    // the row-local fold replays the batch relational chain exactly —
    // same weights, and keep is the frozen-threshold law over them
    assert(streamed.nonEmpty && streamed === batch,
      "streamed dsir weights diverged from the batch chain")
    // the threshold actually splits arrivals (not all-keep/all-drop)
    assert(streamed.values.exists(_._2) && streamed.values.exists(!_._2))
    // the frozen-θ verdict agrees with the batch rank selection up to
    // boundary ties: every batch-selected doc keeps
    val selected = graft.operators.QualityOps.dsirSelect(spark, sf)
      .filter(col("selected")).collect().map(_.getLong(0)).toSet
    graft.operators.DedupOps.releaseTransients(spark)
    assert(selected.forall(id => streamed(id)._2),
      "a batch-selected doc failed the frozen-threshold keep")
  }

  test("streaming winnowing fingerprints ≡ batch wfp, fingerprint for fingerprint") {
    val docsSchema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
    runToCompletion(DocStream.fingerprintDocs(stream), "wfp_stream", "append")
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = keyed(spark.table("wfp_stream").collect())
    val batch = keyed(graft.operators.TextOps.winnowFingerprints(spark, sf).collect())
    assert(streamed.nonEmpty && streamed === batch,
      s"streamed fingerprints (${streamed.size}) diverged from batch (${batch.size})")
  }

  test("streaming winnowing attribution ≡ batch winnowOverlapDelta, counts included") {
    // the arriving shard (the delta predicate's slice) streams against
    // the standing df-capped fingerprint index; pairs AND shared
    // counts must match the batch probe (same kept selection on both
    // paths; the arriving side needs no df filter of its own — see
    // DocStream.attributeDocs)
    val dir = "/root/testdata/sf0.01"
    val docsSchema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .filter(col("doc_id") % 5 === 0)
    runToCompletion(DocStream.attributeDocs(spark, stream, dir),
      "winc_stream", "append")
    val streamed = spark.table("winc_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.TextOps.winnowOverlapDelta(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed.nonEmpty && streamed === batch,
      s"stream ${streamed.size} pairs vs batch ${batch.size}")
  }

  test("streaming PQ encode ≡ batch pqCodesIncremental, code for code") {
    // the arriving shard (the batch fixture's delta slice) streams in
    // two micro-batches; row-local encoding against the collected
    // standing state must reproduce the batch incremental encoder's
    // codes exactly (identical IEEE op chains, identical tie-breaks)
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val delta = graft.operators.EmbeddingOps.pqDeltaVectors(spark, dir)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()
    assert(delta.length >= 2)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val vecs = src.toDF().toDF("vec_id", "v")
    val out = VecStream.encodeArrivals(spark, vecs, dir)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("pq_stream").start()
    delta.grouped(delta.length / 2 + 1).foreach { chunk =>
      src.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getLong(3))).toMap
    val streamed = keyed(spark.table("pq_stream").collect())
    val batch = keyed(graft.operators.EmbeddingOps
      .pqCodesIncremental(spark, dir).collect())
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed.nonEmpty && streamed === batch,
      s"streamed codes (${streamed.size}) diverged from batch (${batch.size})")
  }

  test("streaming refresh ≡ batch dedupKeepIncremental: labels AND verdicts") {
    // the full linc streaming face: three micro-batches of delta docs
    // maintain labels + retention verdicts; the final verdict table
    // must equal the one-shot batch refresh's (modulo its per-run
    // `reelected` flag — a standing table has no "this refresh" notion)
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val delta = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val state = new DocStream.StandingState(
      graft.operators.DedupOps.baseLabels(spark, dir),
      graft.operators.DedupOps.baseKeep(spark, dir))
    val q = DocStream.maintainRefresh(spark, src.toDF().toDF("doc_id", "text"), dir, state)
    delta.grouped(delta.length / 3 + 1).foreach { chunk =>
      src.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("cluster"),
        r.getAs[Boolean]("keep"), r.getAs[Long]("kept_doc"),
        r.getAs[Long]("n_members"))
    }.toMap
    val streamed = keyed(state.keepFrame.collect())
    val batch = keyed(graft.operators.DedupOps.dedupKeepIncremental(spark, dir).collect())
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed.size === batch.size)
    assert(streamed === batch,
      "streamed standing verdicts diverged from the batch refresh")
  }

  test("stream-stream interval join matches the batch interval join") {
    val joined = EventStream.clickAttribution(
      EventStream.readEvents(spark, sf), EventStream.readEvents(spark, sf))
    runToCompletion(joined, "attribution", "append")
    val streamed = spark.table("attribution")
      .groupBy("purchase_id", "user_id").agg(count(lit(1)).as("n_clicks"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventOps.clickAttribution(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("streaming twin: keyed window containment ≡ batch binned point-in-interval") {
    val joined = EventStream.incidentWindowMatches(
      EventStream.readEvents(spark, sf), EventStream.readEvents(spark, sf), 900L)
    runToCompletion(joined, "rj_stream", "append")
    val streamed = spark.table("rj_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime / 1000)).toSet
    // batch side: the SAME containment through the grid join, on the
    // second-truncated time domain readEvents normalizes to
    val ev = graft.sources.Tables.events(spark, sf)
    val pts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        graft.operators.TimeSeriesOps.epochSecExpr("ts").as("es"))
    val ivs = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("i_user"),
        graft.operators.TimeSeriesOps.epochSecExpr("ts").as("lo"))
      .withColumn("hi", col("lo") + 900L)
    val batch = graft.operators.RangeJoinOps.pointInInterval(
        pts, "es", ivs, "lo", "hi", 900.0, keys = Seq("p_user" -> "i_user"))
      .select(col("p_id"), col("p_user"), col("lo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "fixture produced no in-window matches")
    assert(streamed === batch,
      s"stream diverged from the batch grid join: " +
        s"stream-only=${streamed -- batch} batch-only=${batch -- streamed}")
  }

  test("outer interval join: unmatched purchases emit nulls only after the watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_outer_join").toString
    val t0 = 1700000000L
    def write(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "es")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_seconds(col("es")).as("event_time"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    // user 1's purchase has a click in the 30-min window; user 2's
    // purchase has none — it must emit a single null-click row, and
    // ONLY once the watermark passes its eviction bound
    write(Seq((1L, 1L, "click", t0 + 100), (10L, 1L, "purchase", t0 + 200),
      (20L, 2L, "purchase", t0 + 200)))
    def stream = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.clickAttributionOuter(stream, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("outer_attr").start()
    q.processAllAvailable()
    // pre-watermark: the matched pair may have emitted eagerly, but
    // the unmatched purchase must NOT have produced its null row yet
    val early = spark.table("outer_attr").filter(col("purchase_id") === 20L).count()
    assert(early === 0, "null row emitted before the watermark proved no match")
    // advance the watermark well past the interval + delay bound
    write(Seq((97L, 99L, "click", t0 + 100000), (98L, 99L, "purchase", t0 + 100000)))
    q.processAllAvailable()
    write(Seq((95L, 99L, "click", t0 + 110000), (96L, 99L, "purchase", t0 + 110000)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("outer_attr").filter(col("user_id") < 99L).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getTimestamp(2).getTime / 1000))).toSet
    assert(rows === Set((10L, java.lang.Long.valueOf(t0 + 100)), (20L, null)),
      s"outer interval join diverged: $rows")
  }

  test("streaming as-of twin: interval join + windowed max ≡ batch tolerance as-of") {
    import spark.implicits._
    // purchases × signups with tolerance 100 s. Expected by hand AND
    // against the batch native as-of with the same tolerance: the
    // streaming inner form renders the batch operator's null rows as
    // absence, so its output must equal the batch query's MATCHED set.
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_stream").toString
    val t0 = 1700000000L
    val fixture = Seq(
      (10L, 1L, "signup", t0 + 10),
      (11L, 1L, "signup", t0 + 50),
      (12L, 1L, "purchase", t0 + 60),  // two in-window signups → latest (t0+50)
      (13L, 1L, "purchase", t0 + 300), // latest signup 250 s stale → nothing
      (20L, 2L, "purchase", t0 + 500), // only signup is later → nothing
      (21L, 2L, "signup", t0 + 1000),
      (30L, 3L, "signup", t0 + 650),
      (31L, 3L, "purchase", t0 + 700)) // gap 50 → match
    def write(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "es")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_seconds(col("es")).as("event_time"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(fixture)
    def stream = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.asofSignupEnrichment(stream, stream, 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_stream").start()
    q.processAllAvailable()
    // watermark sentinels on BOTH filtered streams (user 99, excluded
    // from expectations) so every fixture purchase's window finalizes;
    // two batches guarantee a micro-batch runs AFTER the watermark
    // update, same pattern as the session-flush test
    write(Seq((98L, 99L, "signup", t0 + 100000), (99L, 99L, "purchase", t0 + 100000)))
    q.processAllAvailable()
    write(Seq((96L, 99L, "signup", t0 + 110000), (97L, 99L, "purchase", t0 + 110000)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("asof_stream")
      .filter(col("user_id") =!= 99L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(streamed === Map(12L -> (t0 + 50), 31L -> (t0 + 650)),
      s"streaming as-of diverged from the hand-computed fixture: $streamed")
    // batch native as-of, same tolerance, matched rows only
    val ev = fixture.toDF("event_id", "user_id", "event_type", "es")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("es"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_uid"), col("es").as("signup_es"))
    val batch = graft.plans.AsOfJoinOps.asof(purchases, signups,
        Seq(purchases("user_id")), Seq(signups("s_uid")),
        purchases("es"), signups("signup_es"), Some(100L))
      .filter(col("signup_es").isNotNull)
      .select("event_id", "signup_es").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === batch,
      "streaming as-of twin diverged from the batch tolerance as-of")
  }

  test("streaming as-of OUTER twin ≡ batch tolerance as-of INCLUDING null rows") {
    import spark.implicits._
    // same fixture as the inner twin, but through the left-outer
    // interval join → windowed MAX chain: purchases with NO
    // in-tolerance signup (13: stale by 250 s; 20: only signup is
    // later) must each emit exactly ONE null-signup row once the
    // watermark proves no match can arrive — the batch operator's
    // null rows, rendered by a stream
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_outer").toString
    val t0 = 1700000000L
    val fixture = Seq(
      (10L, 1L, "signup", t0 + 10),
      (11L, 1L, "signup", t0 + 50),
      (12L, 1L, "purchase", t0 + 60),  // latest in-window signup → t0+50
      (13L, 1L, "purchase", t0 + 300), // stale → NULL row
      (20L, 2L, "purchase", t0 + 500), // signup only later → NULL row
      (21L, 2L, "signup", t0 + 1000),
      (30L, 3L, "signup", t0 + 650),
      (31L, 3L, "purchase", t0 + 700)) // gap 50 → match
    def write(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "es")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_seconds(col("es")).as("event_time"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(fixture)
    def stream = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.asofSignupEnrichmentOuter(stream, stream, 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_outer_stream").start()
    q.processAllAvailable()
    write(Seq((98L, 99L, "signup", t0 + 100000), (99L, 99L, "purchase", t0 + 100000)))
    q.processAllAvailable()
    write(Seq((96L, 99L, "signup", t0 + 110000), (97L, 99L, "purchase", t0 + 110000)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("asof_outer_stream")
      .filter(col("user_id") =!= 99L).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toMap
    // batch native as-of with the same tolerance, null rows KEPT
    val ev = fixture.toDF("event_id", "user_id", "event_type", "es")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("es"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_uid"), col("es").as("signup_es"))
    val batch = graft.plans.AsOfJoinOps.asof(purchases, signups,
        Seq(purchases("user_id")), Seq(signups("s_uid")),
        purchases("es"), signups("signup_es"), Some(100L))
      .select("event_id", "signup_es").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(r.getLong(1)))).toMap
    assert(streamed === batch,
      s"outer streaming as-of != batch as-of with nulls: $streamed vs $batch")
    assert(streamed(13L) == null && streamed(20L) == null,
      s"unmatched purchases did not surface null rows: $streamed")
  }

  test("streaming FORWARD as-of twin ≡ batch forward-direction tolerance as-of") {
    import spark.implicits._
    // mirrored fixture: each purchase wants its EARLIEST at-or-after
    // signup within 100 s. 12: signup 40 s later → match; 13: next
    // signup 700 s later → nothing; 20: signup 500 s EARLIER only →
    // nothing (forward ignores the past); 31: exact-time signup →
    // distance 0, forward is inclusive at-or-after.
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_fwd").toString
    val t0 = 1700000000L
    val fixture = Seq(
      (12L, 1L, "purchase", t0 + 60),
      (10L, 1L, "signup", t0 + 100),   // +40 → match for 12
      (11L, 1L, "signup", t0 + 150),   // later; 12 takes the EARLIEST ≥
      (13L, 1L, "purchase", t0 + 300), // next signup t0+1000 → too far
      (14L, 1L, "signup", t0 + 1000),
      (21L, 2L, "signup", t0 + 100),
      (20L, 2L, "purchase", t0 + 600), // only signup is in the past → nothing
      (31L, 3L, "purchase", t0 + 700),
      (30L, 3L, "signup", t0 + 700))   // exact time → inclusive match
    def write(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "es")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_seconds(col("es")).as("event_time"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(fixture)
    def stream = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.asofSignupEnrichmentForward(stream, stream, 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_fwd_stream").start()
    q.processAllAvailable()
    write(Seq((98L, 99L, "signup", t0 + 100000), (99L, 99L, "purchase", t0 + 100000)))
    q.processAllAvailable()
    write(Seq((96L, 99L, "signup", t0 + 110000), (97L, 99L, "purchase", t0 + 110000)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("asof_fwd_stream")
      .filter(col("user_id") =!= 99L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(streamed === Map(12L -> (t0 + 100), 31L -> (t0 + 700)),
      s"forward streaming as-of diverged from hand-computed fixture: $streamed")
    // batch native FORWARD as-of, same tolerance, matched rows only
    val ev = fixture.toDF("event_id", "user_id", "event_type", "es")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("es"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_uid"), col("es").as("signup_es"))
    val batch = graft.plans.AsOfJoinOps.asof(purchases, signups,
        Seq(purchases("user_id")), Seq(signups("s_uid")),
        purchases("es"), signups("signup_es"), Some(100L),
        graft.plans.AsOfDirection.Forward)
      .filter(col("signup_es").isNotNull)
      .select("event_id", "signup_es").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === batch,
      "forward streaming twin diverged from the batch forward as-of")
  }

  test("streaming as-of twin recovers join + window state across restarts") {
    import spark.implicits._
    // two stateful operators' state (interval-join buffers AND the
    // per-purchase window aggregate) must survive checkpoint restart:
    // a purchase arriving AFTER the restart matches a signup ingested
    // BEFORE it — possible only if the join's buffered right side was
    // recovered — and earlier purchases still emit correctly.
    val root = java.nio.file.Files.createTempDirectory("graft_asof_ck").toString
    val t0 = 1700000000L
    def write(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "es")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_seconds(col("es")).as("event_time"))
        .coalesce(1).write.mode("append").parquet(s"$root/in")
    def run(): Unit = {
      def stream = spark.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, event_time TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/in")
      val q = EventStream.asofSignupEnrichment(stream, stream, 100L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$root/ck")
        .format("parquet").option("path", s"$root/out").start()
      q.processAllAvailable(); q.stop()
    }
    write(Seq((10L, 1L, "signup", t0 + 50), (12L, 1L, "purchase", t0 + 60)))
    run()
    // restart 1: this purchase's only possible match was ingested in
    // the PREVIOUS run — the cross-restart join-state proof
    write(Seq((13L, 1L, "purchase", t0 + 120)))
    run()
    // restart 2: watermark sentinels finalize every fixture window
    write(Seq((98L, 99L, "signup", t0 + 100000), (99L, 99L, "purchase", t0 + 100000)))
    run()
    write(Seq((96L, 99L, "signup", t0 + 110000), (97L, 99L, "purchase", t0 + 110000)))
    run()
    val got = spark.read.parquet(s"$root/out")
      .filter(col("user_id") =!= 99L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(12L -> (t0 + 50), 13L -> (t0 + 50)),
      s"as-of state lost across restart: $got")
  }

  test("foreachBatch JDBC sink lands the final windowed aggregate in the database") {
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val url = "jdbc:derby:/tmp/graft_derby/streamdb;create=true"
    val events = EventStream.readEvents(spark, sf)
    val q = EventStream.countsToJdbc(
      EventStream.tumblingCounts(events), url, "stream_counts", "app", "app")
    q.processAllAvailable()
    q.stop()
    val landed = graft.sources.SalesIo.readJdbc(spark, url, "stream_counts", "app", "app")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventOps.tumblingWindow(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(landed === batch, "JDBC-landed aggregate differs from the batch twin")
  }

  test("streaming dedup suppresses replayed events within the watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    val rows = Seq((1L, 10L, 1700000000L), (2L, 10L, 1700000060L), (3L, 11L, 1700000120L))
    def writeBatch(): Unit = rows.toDF("event_id", "user_id", "es")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("es")).as("event_time"))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    writeBatch() // original events
    val stream = spark.readStream
      .schema("event_id LONG, user_id LONG, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.dedupedEvents(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("deduped").start()
    q.processAllAvailable()
    writeBatch() // exact replay — an at-least-once delivery duplicate
    q.processAllAvailable()
    q.stop()
    val got = spark.table("deduped").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L, 3L), s"replay leaked through: ${got.toSeq}")
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    // two micro-batches in a fresh directory: batch 1 advances event
    // time past the watermark horizon; batch 2 arrives entirely before
    // it (late) and must be dropped from the append-mode aggregation
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    def writeBatch(name: String, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "es")
        .select(col("user_id"), timestamp_seconds(col("es")).as("event_time"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val t0 = 1700000000L
    writeBatch("early", Seq((1L, t0), (1L, t0 + 3600))) // horizon -> t0+3600-600
    val stream = spark.readStream
      .schema("user_id LONG, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws"), col("n"))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("late_test").start()
    q.processAllAvailable()
    // late event in the SAME 5-min window as t0, far behind the horizon
    writeBatch("late", Seq((1L, t0 + 50)))
    q.processAllAvailable()
    q.stop()
    val firstWindow = t0 - t0 % 300
    val rows = spark.table("late_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).filter(_._1 == firstWindow)
    // the window finalized once with ONLY the on-time event; had the
    // late event been (wrongly) accepted it would read n=2 or re-emit
    assert(rows.toSeq === Seq((firstWindow, 1L)),
      s"late event not dropped: $rows")
  }

  test("out-of-order event INSIDE the watermark merges into its window") {
    import spark.implicits._
    // the other half of the late-data contract: an event that arrives
    // out of order but within the watermark delay must be ACCEPTED and
    // merged into its (still-open) window — a watermark that dropped
    // everything out-of-order would be vacuously "correct".
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    def writeBatch(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "es")
        .select(col("user_id"), timestamp_seconds(col("es")).as("event_time"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val t0 = 1700000400L // aligned to the 5-min window grid
    // batch 1: window [t0, t0+300) opens; watermark -> t0+400-600 < t0,
    // so the window is NOT finalized yet
    writeBatch(Seq((1L, t0 + 10), (1L, t0 + 400)))
    val stream = spark.readStream
      .schema("user_id LONG, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws"), col("n"))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("merge_test").start()
    q.processAllAvailable()
    // batch 2: out-of-order (behind max event time) but ABOVE the
    // watermark -> must merge into [t0, t0+300)
    writeBatch(Seq((1L, t0 + 20)))
    q.processAllAvailable()
    // batch 3: advance the watermark past t0+300+600 so the first
    // window finalizes and emits (append mode emits only final rows)
    writeBatch(Seq((1L, t0 + 1500)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("merge_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).filter(_._1 == t0)
    assert(rows.toSeq === Seq((t0, 2L)),
      s"within-watermark event not merged into its window: $rows")
  }

  test("sessionizer merges a within-watermark out-of-order event into the open session") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_merge").toString
    val t0 = 1600000000L
    def write(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "es", "value")
        .select(col("user_id"), timestamp_seconds(col("es")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(Seq((1L, t0, 2.0), (1L, t0 + 60, 3.0)))
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.statefulSessions(spark, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_merge").start()
    q.processAllAvailable()
    // out-of-order event INSIDE the open session's span, watermark
    // still behind it (t0+60-1800 < t0+30): must merge, n 2 -> 3
    write(Seq((1L, t0 + 30, 5.0)))
    q.processAllAvailable()
    // advance the watermark far past the gap bound via another user,
    // twice, so the event-time timeout flushes user 1's session
    write(Seq((2L, t0 + 14400, 1.0)))
    q.processAllAvailable()
    write(Seq((2L, t0 + 14460, 1.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_merge").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.contains((1L, t0, t0 + 60, 3L, 10.0)),
      s"within-watermark event not merged into the session: ${got.toSeq}")
  }

  test("sessionizer drops an event behind the watermark (no ghost session)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_drop").toString
    val t0 = 1600000000L
    def write(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "es", "value")
        .select(col("user_id"), timestamp_seconds(col("es")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(Seq((1L, t0, 2.0), (1L, t0 + 60, 3.0)))
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.statefulSessions(spark, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_drop").start()
    q.processAllAvailable()
    // push the watermark ~3.5 h ahead and let the timeout flush user 1
    write(Seq((2L, t0 + 14400, 1.0)))
    q.processAllAvailable()
    write(Seq((2L, t0 + 14460, 1.0)))
    q.processAllAvailable()
    // now an event FAR behind the watermark for user 1: the stateful
    // operator must never see it — no new/ghost session, no mutation
    // of the already-flushed one
    write(Seq((1L, t0 + 120, 9.0)))
    q.processAllAvailable()
    write(Seq((2L, t0 + 14520, 1.0)))
    q.processAllAvailable()
    q.stop()
    val user1 = spark.table("sess_drop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .filter(_._1 == 1L)
    assert(user1.toSeq === Seq((1L, t0, t0 + 60, 2L, 5.0)),
      s"behind-watermark event leaked into session state: ${user1.toSeq}")
  }

  test("stateful sessionizer emits consistent closed sessions") {
    val events = EventStream.readEvents(spark, sf)
    val out = EventStream.statefulSessions(spark, events)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("stateful").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stateful").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // closed sessions (the final open session per user stays in state)
    assert(got.nonEmpty)
    assert(got.forall { case (_, s, e, n) => s <= e && n >= 1 })
    // each closed session must exist in the batch sessionization
    val batch = EventOps.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val missing = got.filterNot(batch.contains)
    assert(missing.isEmpty, s"sessions not in batch result: ${missing.take(3)}")
  }

  test("trailing open session flushes via event-time timeout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_flush").toString
    val t0 = 1600000000L
    def write(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "es", "value")
        .select(col("user_id"), timestamp_seconds(col("es")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(Seq((1L, t0, 2.0), (1L, t0 + 60, 3.0)))
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.statefulSessions(spark, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_flush").start()
    q.processAllAvailable()
    // User 1 never gets a gap-closing event. Events for a DIFFERENT
    // user advance the watermark past user 1's gap bound (t0+60+30min);
    // the second batch guarantees a micro-batch runs AFTER the
    // watermark update so the event-time timeout fires deterministically
    // (not relying on a no-data batch).
    write(Seq((2L, t0 + 14400, 1.0)))
    q.processAllAvailable()
    write(Seq((2L, t0 + 14460, 1.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_flush").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.contains((1L, t0, t0 + 60, 2L, 5.0)),
      s"trailing session not flushed: ${got.toSeq}")
  }

  test("value-dependent-gap sessionizer: gap follows the last event's value") {
    import spark.implicits._
    // the semantics session_window cannot express: the same 2400 s
    // silence CLOSES a session after a low-value event (base gap
    // 1800) but KEEPS IT OPEN after a high-value one (long gap 3600).
    val dir = java.nio.file.Files.createTempDirectory("graft_vgap").toString
    val t0 = 1600000000L
    def write(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "es", "value")
        .select(col("user_id"), timestamp_seconds(col("es")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    // user 1: low-value then 2400 s silence → TWO sessions
    // user 2: HIGH-value then the same 2400 s silence → ONE session
    write(Seq((1L, t0, 10.0), (1L, t0 + 2400, 11.0),
      (2L, t0, 99.0), (2L, t0 + 2400, 12.0)))
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = EventStream.statefulSessionsValueGap(spark, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("vgap").start()
    q.processAllAvailable()
    // sentinels push the watermark past every gap bound (two batches
    // so a micro-batch runs after the watermark update)
    write(Seq((3L, t0 + 20000, 1.0)))
    q.processAllAvailable()
    write(Seq((3L, t0 + 20060, 1.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vgap").filter(col("user_id") =!= 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got === Set(
      (1L, t0, t0, 1L, 10.0), (1L, t0 + 2400, t0 + 2400, 1L, 11.0),
      (2L, t0, t0 + 2400, 2L, 111.0)),
      s"value-dependent gap semantics diverged: $got")
  }

  test("streaming corpus ingest: quality gate + fingerprint dedup across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_docstream").toString
    val t0 = 1700000000L
    def write(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "es")
        .select(col("doc_id"), col("text"),
          timestamp_seconds(col("es")).as("ingest_time"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val longText = "one two three four five six seven eight nine ten"
    // batch 1: a good doc and a too-short doc (quality gate rejects)
    write(Seq((1L, longText, t0), (2L, "too short", t0 + 10)))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ingest_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = graft.streaming.DocStream.cleanDocs(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("doc_clean").start()
    q.processAllAvailable()
    // batch 2: a re-crawl of doc 1's content under a NEW id (case and
    // padding differ — the normalized fingerprint must still match and
    // suppress it) plus a genuinely new long doc
    write(Seq((3L, "  " + longText.toUpperCase + " ", t0 + 60),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", t0 + 70)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("doc_clean").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 4L),
      s"expected the first-crawled and the new doc only, got ${got.toSeq}")
  }

  test("streaming corpus composite equals the batch composite on the same docs") {
    import spark.implicits._
    // the full 4-stage twin: quality gate, dedup, stream-static
    // decontamination, per-source quota. Fixture sized so the quota
    // does NOT bind (≤2 docs/source < SourceQuota) — there the
    // first-arrival streaming quota and the md5-ranked batch quota
    // provably agree, so streamed survivors must EQUAL the batch
    // composite (corpusStagesFrom) run over the very same rows.
    val dir = java.nio.file.Files.createTempDirectory("graft_doccomp").toString
    val t0 = 1700000000L
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "one two three four five six seven eight nine ten eleven"
    val textE = "held out evaluation prompt with exactly ten little tokens"
    // (doc_id, source, lang, text, arrival)
    val rows = Seq(
      (1L, "s1", "en", textA, t0),                        // survives
      (2L, "s2", "en", "  " + textA.toUpperCase + " ", t0 + 10), // dup of 1
      (3L, "s1", "en", textE.toUpperCase, t0 + 20),       // contaminated
      (4L, "s2", "en", "too short", t0 + 30),             // quality gate
      (7L, "s2", "de", textB, t0 + 40),                   // survives
      (50L, "s3", "en", textE, t0 + 50))                  // the eval doc itself
    def batchDf = rows.toDF("doc_id", "source", "lang", "text", "es")
    def write(sel: Seq[Long]): Unit = batchDf
      .filter(col("doc_id").isin(sel: _*))
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        timestamp_seconds(col("es")).as("ingest_time"))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(Seq(1L, 2L, 3L, 4L))
    write(Seq(7L, 50L))
    // the static benchmark fingerprints — same derivation the batch
    // composite uses internally (quality-gated, doc_id % 50 == 0)
    val evalFps = batchDf
      .filter(size(graft.operators.TextOps.tokens(col("text"))) >=
        graft.operators.PipelineOps.CorpusMinTokens && col("doc_id") % 50 === 0)
      .select(md5(lower(trim(col("text")))).as("fp")).distinct()
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, lang STRING, text STRING, ingest_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = DocStream.ingestCorpus(spark, stream, evalFps)
      .writeStream.outputMode("append").format("memory")
      .queryName("doc_composite").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("doc_composite").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val batch = graft.operators.PipelineOps.corpusStagesFrom(
        batchDf.select("doc_id", "source", "lang", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(streamed === batch, s"stream $streamed != batch $batch")
    assert(streamed.map(_._1) === Set(1L, 7L))
  }

  test("streaming per-source quota admits first Q arrivals with one counter per source") {
    import spark.implicits._
    // the binding case the equality test can't cover: a hot source
    // exceeding the quota across MICRO-BATCH boundaries — the state
    // carried between batches is a single Long per source
    val dir = java.nio.file.Files.createTempDirectory("graft_docquota").toString
    val t0 = 1700000000L
    def write(rows: Seq[(Long, String)]): Unit = rows
      .toDF("doc_id", "source")
      .select(col("doc_id"), col("source"), lit("en").as("lang"),
        concat(lit("u"), col("doc_id"),
          lit(" alpha beta gamma delta epsilon zeta eta theta iota")).as("text"),
        timestamp_seconds(lit(t0) + col("doc_id")).as("ingest_time"))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(Seq((10L, "hot"), (11L, "hot"), (12L, "hot")))
    write(Seq((13L, "hot"), (14L, "hot"), (30L, "cold")))
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, lang STRING, text STRING, ingest_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = DocStream.ingestCorpus(spark, stream,
        spark.emptyDataFrame.select(lit("").as("fp")).limit(0), quota = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("doc_quota").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("doc_quota").collect().map(_.getLong(0)).sorted.toSeq
    // batch 1 fills hot's quota with its two lowest ids; batch 2's hot
    // docs find the counter full; cold is untouched by hot's counter
    assert(got === Seq(10L, 11L, 30L), s"quota mis-admitted: $got")
  }

  test("three sessionizers agree: fMGWS = transformWithState = session_window") {
    import spark.implicits._
    // the sess_flush fixture on ALL THREE backends: gap-close emission
    // and the watermark-driven flush of the trailing open session must
    // produce identical session sets — the two custom state machines
    // (flatMapGroupsWithState with setTimeoutTimestamp;
    // transformWithState with an explicit event-time timer) and the
    // DECLARATIVE built-in session_window, whose append-mode emission
    // is also watermark-driven. Three-way equality pins the custom
    // processors to the standard session semantics, not just to each
    // other.
    val t0 = 1600000000L
    def run(tag: String,
            mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Double)] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_sess_$tag").toString
      def write(rows: Seq[(Long, Long, Double)]): Unit =
        rows.toDF("user_id", "es", "value")
          .select(col("user_id"), timestamp_seconds(col("es")).as("ts"), col("value"))
          .coalesce(1).write.mode("append").parquet(s"$dir/in")
      write(Seq((1L, t0, 2.0), (1L, t0 + 60, 3.0)))
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val q = mk(stream).writeStream.outputMode("append")
        .format("memory").queryName(s"sess_$tag").start()
      q.processAllAvailable()
      // a second user advances the watermark twice so the trailing
      // session of user 1 flushes deterministically on both backends
      write(Seq((2L, t0 + 14400, 1.0)))
      q.processAllAvailable()
      write(Seq((2L, t0 + 14460, 1.0)))
      q.processAllAvailable()
      q.stop()
      spark.table(s"sess_$tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
    }
    val fmgws = run("fmgws", df => EventStream.statefulSessions(spark, df).toDF)
    val keepConf = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val tws =
      try run("tws", df => EventStream.statefulSessionsTws(spark, df).toDF)
      finally keepConf match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    // the declarative twin reads the same fixture; its event_time is
    // derived with the same whole-second truncation as readEvents
    val swin = run("swin", df => EventStream.sessionWindowSessions(
      df.withColumn("event_time", timestamp_seconds(
        graft.operators.TimeSeriesOps.epochSecExpr("ts")))))
    assert(fmgws.contains((1L, t0, t0 + 60, 2L, 5.0)),
      s"fMGWS baseline lost the flushed session: $fmgws")
    assert(tws === fmgws, s"backends diverged: tws=$tws fmgws=$fmgws")
    assert(swin === fmgws,
      s"session_window diverged from the custom sessionizers: swin=$swin fmgws=$fmgws")
  }

  test("transformWithState quota backend admits the same rows as flatMapGroupsWithState") {
    import spark.implicits._
    // same fixture as the quota test above, run through the Spark 4
    // StatefulProcessor backend (RocksDB state store, required by the
    // API): backend equivalence means the quota semantics live in the
    // shared admitSmallest, not in either engine's state plumbing
    val dir = java.nio.file.Files.createTempDirectory("graft_doctws").toString
    val t0 = 1700000000L
    def write(rows: Seq[(Long, String)]): Unit = rows
      .toDF("doc_id", "source")
      .select(col("doc_id"), col("source"), lit("en").as("lang"),
        concat(lit("u"), col("doc_id"),
          lit(" alpha beta gamma delta epsilon zeta eta theta iota")).as("text"),
        timestamp_seconds(lit(t0) + col("doc_id")).as("ingest_time"))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    write(Seq((10L, "hot"), (11L, "hot"), (12L, "hot")))
    write(Seq((13L, "hot"), (14L, "hot"), (30L, "cold")))
    val keepConf = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("doc_id LONG, source STRING, lang STRING, text STRING, ingest_time TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/in")
      val q = DocStream.ingestCorpusTws(spark, stream,
          spark.emptyDataFrame.select(lit("").as("fp")).limit(0), quota = 2)
        .writeStream.outputMode("append").format("memory")
        .queryName("doc_tws").start()
      q.processAllAvailable()
      q.stop()
      val got = spark.table("doc_tws").collect().map(_.getLong(0)).sorted.toSeq
      // identical to the flatMapGroupsWithState backend's admission
      assert(got === Seq(10L, 11L, 30L), s"tws backend diverged: $got")
    } finally keepConf match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming quota: state survives a checkpoint restart and replay is deterministic") {
    import spark.implicits._
    // turns the in-code determinism claim (doc_id sort within a
    // micro-batch ⇒ a replay of the same batch sequence emits
    // identical rows) into a pinned contract, and proves the
    // one-Long-per-source counter is RECOVERED from the checkpoint on
    // restart rather than reset
    val root = java.nio.file.Files.createTempDirectory("graft_docreplay").toString
    val t0 = 1700000000L
    def write(rows: Seq[(Long, String)]): Unit = rows
      .toDF("doc_id", "source")
      .select(col("doc_id"), col("source"), lit("en").as("lang"),
        concat(lit("u"), col("doc_id"),
          lit(" alpha beta gamma delta epsilon zeta eta theta iota")).as("text"),
        timestamp_seconds(lit(t0) + col("doc_id")).as("ingest_time"))
      .coalesce(1).write.mode("append").parquet(s"$root/in")
    def run(ck: String, out: String): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, source STRING, lang STRING, text STRING, ingest_time TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/in")
      val q = DocStream.ingestCorpus(spark, stream,
          spark.emptyDataFrame.select(lit("").as("fp")).limit(0), quota = 2)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("parquet").option("path", out).start()
      q.processAllAvailable(); q.stop()
    }
    write(Seq((10L, "hot"), (11L, "hot"))) // fills hot's quota exactly
    run(s"$root/ck", s"$root/out")
    // stop, new arrivals, restart from the SAME checkpoint: hot's
    // counter must come back as 2 (full), so doc 12 is rejected while
    // cold's fresh counter admits doc 30
    write(Seq((12L, "hot"), (30L, "cold")))
    run(s"$root/ck", s"$root/out")
    val got = spark.read.parquet(s"$root/out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(10L, 11L, 30L), s"counter lost across restart: $got")
    // replay determinism: a FRESH run over the same input files (same
    // per-file micro-batch sequence) emits the identical admitted set
    run(s"$root/ck2", s"$root/out2")
    val replay = spark.read.parquet(s"$root/out2")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(replay === got, s"replay diverged: $replay vs $got")
  }

  test("tws quota on RocksDB with changelog checkpointing recovers across restart") {
    import spark.implicits._
    // the state-store recovery-latency story at 100 TB state:
    // changelog checkpointing uploads per-batch DELTAS instead of
    // RocksDB snapshot files, so restart recovery replays a changelog
    // rather than re-downloading full snapshots. The semantics
    // contract is that recovery is indistinguishable from the
    // snapshot path — pinned here by re-running the quota
    // checkpoint-restart fixture on the transformWithState backend
    // with changelog checkpointing ON (confs live on a private child
    // session; nothing shared is mutated)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    val root = java.nio.file.Files.createTempDirectory("graft_docchlog").toString
    val t0 = 1700000000L
    def write(rows: Seq[(Long, String)]): Unit = rows
      .toDF("doc_id", "source")
      .select(col("doc_id"), col("source"), lit("en").as("lang"),
        concat(lit("u"), col("doc_id"),
          lit(" alpha beta gamma delta epsilon zeta eta theta iota")).as("text"),
        timestamp_seconds(lit(t0) + col("doc_id")).as("ingest_time"))
      .coalesce(1).write.mode("append").parquet(s"$root/in")
    def run(): Unit = {
      val stream = s2.readStream
        .schema("doc_id LONG, source STRING, lang STRING, text STRING, ingest_time TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/in")
      val q = DocStream.ingestCorpusTws(s2, stream,
          s2.emptyDataFrame.select(lit("").as("fp")).limit(0), quota = 2)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$root/ck")
        .format("parquet").option("path", s"$root/out").start()
      q.processAllAvailable(); q.stop()
    }
    write(Seq((10L, "hot"), (11L, "hot"))) // fills hot's quota exactly
    run()
    // restart from the changelog-checkpointed state: hot's counter
    // must replay back to 2 (full) so doc 12 is rejected, while
    // cold's fresh counter admits doc 30
    write(Seq((12L, "hot"), (30L, "cold")))
    run()
    val got = spark.read.parquet(s"$root/out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(10L, 11L, 30L),
      s"changelog-checkpointed state lost across restart: $got")
    // prove the changelog path actually engaged (a mistyped conf key
    // would silently fall back to snapshot checkpointing and this test
    // would assert nothing new): delta uploads appear as .changelog
    // files under the state directory
    val changelogs = java.nio.file.Files
      .walk(java.nio.file.Paths.get(s"$root/ck/state"))
      .filter(_.toString.endsWith(".changelog")).count()
    assert(changelogs > 0, "no .changelog files — changelog checkpointing never engaged")
  }

  test("streaming corpus ingest: dedup state expires behind the watermark") {
    import spark.implicits._
    // the bounded-state side of the contract: a re-crawl of content
    // whose fingerprint state has EXPIRED (arrival far beyond the
    // 30-minute horizon) is admitted again — exactly the trade that
    // lets an unbounded crawl run with finite state. Batch dedup over
    // the full corpus remains the global guarantee; the stream only
    // promises in-horizon suppression.
    val dir = java.nio.file.Files.createTempDirectory("graft_docexp").toString
    val t0 = 1700000000L
    def write(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "es")
        .select(col("doc_id"), col("text"),
          timestamp_seconds(col("es")).as("ingest_time"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val text = "one two three four five six seven eight nine ten"
    write(Seq((1L, text, t0)))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ingest_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val q = graft.streaming.DocStream.cleanDocs(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("doc_expire").start()
    q.processAllAvailable()
    // advance the watermark far past t0 + 30 min with unrelated docs
    write(Seq((2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", t0 + 7200)))
    q.processAllAvailable()
    // the same content re-crawled 2h later: its state is gone
    write(Seq((3L, text, t0 + 7300)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("doc_expire").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L, 3L),
      s"expired fingerprint not re-admitted (state unbounded?): ${got.toSeq}")
  }

  test("streaming semantic probe ≡ batch sinc restricted to arrival × standing") {
    // the sinc streaming face: delta vectors arrive over three
    // micro-batches, assign to their trained cell row-locally, and
    // probe the standing membership; the union of all batches' pairs
    // must equal the batch probe minus its delta-delta pairs (which
    // need the maintained-state face — documented on semanticArrivals),
    // cos values bit-for-bit
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val delta = graft.operators.EmbeddingOps.pqDeltaVectors(spark, dir)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()
    assert(delta.length >= 3)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val vecs = src.toDF().toDF("vec_id", "v")
    val out = VecStream.semanticArrivals(spark, vecs, dir)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sem_stream").start()
    delta.grouped(delta.length / 3 + 1).foreach { chunk =>
      src.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val streamed = keyed(spark.table("sem_stream").collect())
    val batch = keyed(graft.operators.EmbeddingOps.semanticDedupDelta(spark, dir)
      .filter(!(col("vec_a") % 5 === 0 && col("vec_b") % 5 === 0)).collect())
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed.nonEmpty && streamed === batch,
      s"streamed pairs (${streamed.size}) diverged from batch (${batch.size})")
  }

  test("streaming semantic refresh ≡ batch sref after 3 micro-batches") {
    // the maintained-state face: arriving vectors admit, probe the
    // vectors the state already knows (order-robust deferred pairing),
    // and re-elect touched clusters per batch; the final verdict table
    // must equal the one-shot batch refresh's, modulo its per-run
    // `reelected` flag
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ops = graft.operators.EmbeddingOps
    val delta = ops.pqDeltaVectors(spark, dir)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()
    assert(delta.length >= 3)
    val state = new VecStream.SemStandingState(
      ops.semBaseLabels(spark, dir), ops.semBaseKeep(spark, dir))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val q = VecStream.maintainSemantic(spark,
      src.toDF().toDF("vec_id", "v"), dir, state)
    delta.grouped(delta.length / 3 + 1).foreach { chunk =>
      src.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getAs[Long]("vec_id") -> ((r.getAs[Long]("cell"), r.getAs[Double]("ccos"),
        r.getAs[Long]("cluster"), r.getAs[Boolean]("keep"),
        r.getAs[Long]("kept_vec"), r.getAs[Long]("n_members")))).toMap
    val streamed = keyed(state.keepFrame.collect())
    val batch = keyed(ops.semanticRefresh(spark, dir).collect())
    graft.operators.DedupOps.releaseTransients(spark)
    assert(streamed.nonEmpty && streamed === batch,
      s"maintained verdicts (${streamed.size}) diverged from batch sref " +
        s"(${batch.size}) on ${
          (streamed.keySet ++ batch.keySet)
            .count(k => streamed.get(k) != batch.get(k))} vec_ids")
  }
}
