package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the 100 TB story depends on scans
  * staying pruned/pushed, dimensions staying broadcast, and top-k
  * staying TakeOrderedAndProject. These assert the plan shape so a
  * refactor that silently de-optimizes fails CI.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("plan-spec", "4")
  val sf = "/root/testdata/sf0.001"

  // Plans are rendered from a PRISTINE memo-cache state: a pinned
  // stage that an earlier suite (same forked JVM, shared session)
  // already MATERIALIZED renders its InMemoryRelation subtree as an
  // executed AdaptiveSparkPlan with BOTH "== Final Plan ==" and
  // "== Initial Plan ==" sections — every exchange/scan inside it
  // counts twice and the shape pins below flap with suite order.
  // Clearing the caches before construction makes every render the
  // deterministic un-executed initial plan (stages rebuild lazily at
  // sf0.001 — cheap).
  private def planString(df: => DataFrame): String = {
    graft.operators.DedupOps.clearCaches(spark)
    df.queryExecution.executedPlan.toString()
  }

  private def formatted(df: => DataFrame): String = {
    graft.operators.DedupOps.clearCaches(spark)
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted") match {
      case m => df.queryExecution.explainString(m)
    }
  }

  test("filter_pushdown pushes predicates into the parquet scan") {
    val s = formatted(RelationalOps.filterPushdown(spark, sf))
    assert(s.contains("PushedFilters:"), "no pushdown section")
    assert(s.contains("GreaterThan(l_quantity,40.0)"), s"missing pushed filter in:\n$s")
    // pruned read schema: only the 5 referenced columns
    assert(!s.contains("l_extendedprice"), "column pruning lost")
  }

  test("q1 joins dimension via broadcast (fact side never shuffles for the join)") {
    val s = planString(SalesAnalytics.q1RevenueByCustomer(spark, sf))
    assert(s.contains("BroadcastHashJoin"), s"expected BHJ in:\n$s")
  }

  test("global top-k plans TakeOrderedAndProject, not a full sort") {
    val s = planString(RelationalOps.topKOrders(spark, sf))
    assert(s.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$s")
  }

  test("dedup_exact partial-aggregates map-side before the shuffle") {
    val s = formatted(RelationalOps.dedupExact(spark, sf))
    val firstAgg = s.indexOf("HashAggregate")
    val exchange = s.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0, s"plan missing agg/exchange:\n$s")
  }

  // Under AQE the plan only materializes codegen stages at runtime, so
  // plan the query with AQE off for a deterministic codegen census.
  private def codegenExplain(mk: => DataFrame): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("aggregation queries keep whole-stage codegen in the hot path") {
    val s = codegenExplain(SalesAnalytics.q5SalesByMonth(spark, sf))
    assert(s.contains("WholeStageCodegen") && !s.startsWith("Found 0"),
      s"codegen lost in:\n${s.take(400)}")
  }

  test("ann native expression participates in codegen") {
    val s = codegenExplain(EmbeddingOps.annBruteTopKNative(spark, sf))
    assert(s.contains("WholeStageCodegen") && !s.startsWith("Found 0"),
      s"codegen lost in:\n${s.take(400)}")
    // and the custom expression actually shows up inside the plan
    assert(s.contains("cosine_sim") || s.contains("CosineSimilarity"),
      "custom expression missing from codegen plan")
  }

  test("interval join plans a hash/merge join on user_id, not a nested loop") {
    val s = planString(EventOps.clickAttribution(spark, sf))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"range predicate hijacked the join strategy:\n$s")
    // skew guard: the equi-key must include the time bucket, so a hot
    // user's pair work is bounded per one-hour span, never C×P over
    // their full history
    assert("\\[user_id#\\d+L?, tb#\\d+L?\\]".r.findFirstIn(s).isDefined,
      s"interval join lost its (user_id, tb) key:\n$s")
  }

  test("emb_neardup_pairs never plans an all-pairs nested-loop join") {
    // round 1's a.join(b, vec_a < vec_b) planned a
    // BroadcastNestedLoopJoin over the full corpus — O(N²) at any
    // scale. The banded sign-LSH rewrite must keep every join an
    // equi-join (hash/sort-merge on band-bucket or id keys).
    val s = planString(EmbeddingOps.embNeardupPairs(spark, sf))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"non-equi join reappeared in:\n$s")
  }

  test("ANN top-k tail partial-aggregates (no per-query window sort)") {
    // the row_number window collected each query's full candidate set
    // into one task; the TopKByScore aggregate must replace it with a
    // map-side-combinable ObjectHashAggregate carrying O(k) per group.
    for (q <- Seq(EmbeddingOps.annBruteTopK(spark, sf),
                  EmbeddingOps.annLshBucket(spark, sf))) {
      val s = planString(q)
      assert(!s.contains("Window"), s"window sort back in ANN tail:\n$s")
      assert(s.contains("ObjectHashAggregate") && s.contains("topk_by_score"),
        s"expected partial topk_by_score aggregate in:\n$s")
    }
  }

  test("stratified sampling never reads the text column") {
    // the sampling decision is a function of (doc_id, lang); at corpus
    // scale the scan must prune the (dominant) text payload or the
    // "cheap" sample reads the whole 100 TB corpus.
    val s = formatted(PipelineOps.sampleStratified(spark, sf))
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    assert(read.contains("doc_id") && read.contains("lang"), s"unexpected schema: $read")
    assert(!read.contains("text"), s"text column not pruned from sampling scan: $read")
  }

  test("upsert's anti-join key side prunes to the key column") {
    // the update-keys branch feeding the left-anti join must scan ONLY
    // o_orderkey; dragging full rows through the build side defeats
    // the one-skinny-side merge design.
    val s = formatted(PipelineOps.mergeUpsert(spark, sf))
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(s).map(_.group(1)).toSeq
    assert(reads.exists(r => r == "o_orderkey:bigint"),
      s"no key-only scan for the anti-join side; schemas: $reads")
  }

  test("source-quota sampling pushes a partial WindowGroupLimit below the exchange") {
    // a hot domain must cost what a cold one does: at most Q rows per
    // (source, mapper) may reach the rank window's shuffle.
    val s = planString(PipelineOps.sampleSourceQuota(spark, sf))
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"),
      s"quota filter not pushed into a partial WindowGroupLimit:\n$s")
  }

  test("capped collect plans a partial-aggregatable ObjectHashAggregate") {
    // the whole point of MinKStrings is bounded map-side buffers; if a
    // refactor falls back to collect_list+slice the buffers are
    // unbounded again even though answers stay identical.
    val s = planString(StatOps.aggCollectCapped(spark, sf))
    assert(s.contains("ObjectHashAggregate") && s.contains("min_k_strings"),
      s"expected partial min_k_strings aggregate in:\n$s")
    assert(!s.contains("collect_list"), "unbounded collect_list crept back in")
  }

  test("pack_sequences cumsum window is sub-stratified by (lang, bucket)") {
    // a per-lang-only cumsum funnels a dominant language (≈90% of a
    // real corpus) through ONE window partition; the hash bucket must
    // appear in the window's partition spec so the stratum splits.
    val s = planString(PipelineOps.packSequences(spark, sf))
    assert("windowspecdefinition\\(lang#\\d+, bucket#\\d+".r.findFirstIn(s).isDefined,
      s"cumsum window must partition by (lang, bucket), got:\n$s")
  }

  test("tf-idf ranks through a single window over pre-aggregated tf rows") {
    // one top-3 window over (doc_id, term, tf, df) rows — never a
    // window over the exploded token stream.
    val s = planString(PipelineOps.tfidfTopK(spark, sf))
    assert("\\+- Window ".r.findAllIn(s).length === 1,
      s"expected exactly one WindowExec in tf-idf plan:\n$s")
    // the rank<=3 filter must push a map-side partial top-k below the
    // doc_id exchange (WindowGroupLimit Partial), so the shuffle
    // carries at most 3 rows per (doc, partition), not every term
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"),
      s"rank filter not pushed into a partial WindowGroupLimit:\n$s")
    // since the tf checkpoint (corpus tokenizes once), the exploded
    // token stream lives BEHIND the checkpoint scan: the window's
    // visible subtree must contain no Generate at all — a Generate
    // here would mean the window ranks raw tokens again
    assert(!s.contains("Generate"),
      s"window subtree re-explodes tokens past the tf checkpoint:\n$s")
    assert(s.contains("Scan ExistingRDD"),
      s"tf rows not served from the checkpoint:\n$s")
  }

  test("fuzzy join stays a blocked equi-join over the name vocabulary") {
    // the blocking key must keep this a hash/merge join; losing it
    // would re-plan as an all-pairs nested loop over the vocabulary —
    // tolerable at 64 names, quadratic death at a real one.
    val s = planString(RelationalOps.joinFuzzyEdit(spark, sf))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"fuzzy join lost its blocking key:\n$s")
  }

  test("exact profiler never sorts the expanded multi-distinct stream") {
    // mixing countDistinct with min/max(string) in ONE aggregate forces
    // SortAggregate for the whole plan — the ×columns Expand stream
    // gets globally sorted by its (columns..., gid) key (measured 3×
    // at sf0.1, ~6× at 10×). The split keeps the distinct branch
    // hash-aggregated; a Sort keyed on the Expand's gid is the exact
    // signature of the regression.
    val s = planString(QualityOps.profileTable(spark, sf))
    assert("Sort \\[[^\\]]*gid#".r.findFirstIn(s).isEmpty,
      s"expanded multi-distinct stream is being sorted again:\n$s")
  }

  test("approx profiler plans one un-expanded scan; exact profiler pays the Expand") {
    // the whole point of profile_approx is that approx_count_distinct
    // needs no Expand: row stream cost independent of column count.
    // If Expand appears here, someone swapped a true distinct back in.
    val s = planString(QualityOps.profileApproxOnly(spark, sf))
    assert(!s.contains("Expand"), s"approx profiler must not Expand:\n$s")
    // contrast pin: the exact multi-distinct DOES plan the Expand —
    // if this ever stops holding, the doc comparing the two plans is
    // stale and the approx variant may have lost its reason to exist.
    val e = planString(QualityOps.profileTable(spark, sf))
    assert(e.contains("Expand"), "exact profiler no longer Expands — update docs")
  }

  test("ts_gapfill joins the daily aggregate via broadcast") {
    // both join sides are calendar-bounded (days × priorities), so the
    // spine-to-daily join must broadcast — at 100 TB the orders scan
    // grows but this join's inputs do not.
    val s = planString(TimeSeriesOps.tsGapfill(spark, sf))
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast spine join in:\n$s")
  }

  test("scd2_build shuffles once on the dimension key for both windows") {
    // lag and lead windows share (o_custkey, od, o_orderkey) ordering;
    // a second hashpartitioning exchange would mean the filter broke
    // the partitioning reuse.
    val s = planString(TimeSeriesOps.scd2Build(spark, sf))
    val n = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(n === 1, s"expected one key shuffle, got $n in:\n$s")
  }

  test("wfp: one doc-partition sort serves the k-gram leads AND the sliding min") {
    // the winnowing chain stacks three window computations (lead×2,
    // count, sliding min) on the same (doc_id, pos) clustering, and
    // even the selection's distinct groups on (doc_id, wm) — a
    // superset of the window partitioning — so the WHOLE operator
    // runs on ONE hash exchange of the gram stream (the only other
    // exchange is the final presentation sort's range partitioning).
    // If any stage stops sharing, an extra exchange re-shuffles the
    // full gram stream and this count moves.
    val s = planString(TextOps.winnowFingerprints(spark, sf))
    val n = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(n === 1, s"expected ONE hash exchange for the whole chain, got $n in:\n$s")
    assert("Window ".r.findAllIn(s).length === 3,
      s"expected the lead/count/min windows, plan changed:\n$s")
  }

  test("window_range_frame runs one window over one event_type shuffle") {
    val s = planString(EventOps.windowRangeFrame(spark, sf))
    assert("\\+- Window ".r.findAllIn(s).length === 1)
    val n = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(n === 1, s"expected one hash exchange, got $n in:\n$s")
  }

  test("outliers broadcasts the stats table back onto the event scan") {
    // the per-type stats frame is 4 rows; a shuffled join here would
    // move every event for nothing.
    val s = planString(StatOps.outliers(spark, sf))
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast stats join in:\n$s")
  }

  test("win_value shares one customer-key shuffle across both window specs") {
    // full-frame (by date) and cume_dist (by price) windows partition
    // on the same key — the plan must exchange once and re-sort, not
    // re-shuffle.
    val s = planString(RelationalOps.windowValueFuncs(spark, sf))
    val n = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(n === 1, s"expected one key shuffle for both windows, got $n in:\n$s")
  }

  test("chunks never shuffles before the output sort") {
    // the chunker must stay embarrassingly parallel: scan → in-row
    // sequence/slice → explode; the only exchange is the final
    // presentation sort's range partitioning
    val s = planString(TextOps.docChunks(spark, sf))
    assert(!s.contains("Exchange hashpartitioning"),
      s"chunking acquired a key shuffle:\n$s")
    assert(s.contains("Generate explode"), s"expected the in-row explode in:\n$s")
  }

  test("bm25 keeps top-k as TakeOrderedAndProject with no nested-loop term join") {
    val s = planString(TextOps.bm25Search(spark, sf))
    assert(s.contains("TakeOrderedAndProject"), s"top-k became a global sort:\n$s")
    // df (≤|terms| rows) and the 1-row stats must broadcast; the term
    // match is an equi-join, never a cartesian/BNLJ over terms
    assert(!s.contains("CartesianProduct"), s"cartesian in:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"df/stats join not broadcast:\n$s")
  }

  test("bloom prunes the fact scan via a scalar-subquery runtime filter") {
    val s = formatted(RelationalOps.bloomPruneJoin(spark, sf))
    // the filter must be the InjectRuntimeFilter shape: might_contain
    // over a scalar subquery, sitting on the lineitem scan BEFORE any
    // join/shuffle — a literal bloom here would mean a driver collect,
    // and its absence would mean the fact table flows unpruned
    assert(s.contains("might_contain(Subquery"),
      s"bloom filter not a scalar subquery on the scan:\n$s")
    assert(s.contains("EqualTo(o_orderpriority,1-URGENT)"),
      s"dim predicate not pushed to the orders scan:\n$s")
    // exact check joins the small dim side by broadcast
    assert(s.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$s")
  }

  test("dup_spans and decon_ngram share one pinned gram substrate") {
    graft.operators.DedupOps.clearCaches(spark)
    // memoization: repeated fetches return the SAME frame (so its
    // InMemoryRelation is built and materialized exactly once)
    assert(PipelineOps.gramRowsCached(spark, sf) eq
      PipelineOps.gramRowsCached(spark, sf),
      "gram substrate is rebuilt per call")
    // both consumers read the pinned cache, not the raw text pipeline
    // (the printed plan still shows the relation's build plan inside
    // the InMemoryTableScan node — that subtree runs once at
    // materialization, not per consumer)
    val s = planString(PipelineOps.dupSpans(spark, sf))
    assert(s.contains("InMemoryTableScan"),
      s"dup_spans not served from the pinned substrate:\n$s")
    val d = planString(PipelineOps.decontaminateNgram(spark, sf))
    assert(d.contains("InMemoryTableScan"),
      s"decon_ngram does not share the gram substrate:\n$d")
  }

  test("lm_score counts bigrams in hash aggregates off the checkpointed positions") {
    val s = planString(TextOps.lmScore(spark, sf))
    // grouping by (b, w1) instead of carrying w1 through max() keeps
    // the full-gram-stream aggregate hash-based; a SortAggregate here
    // means the carrier agg regressed and the gram stream gets sorted
    assert(!s.contains("SortAggregate"),
      s"bigram count fell back to a sort aggregate:\n$s")
    assert(s.contains("Scan ExistingRDD"),
      s"bigram positions not served from the checkpoint:\n$s")
  }

  test("corpus composite reads the checkpoint once and pushes partial window limits") {
    val s = planString(PipelineOps.corpusPipeline(spark, sf))
    // both the dedup spine and the eval-fp branch must read the
    // checkpointed fingerprint rows — a parquet scan in the final plan
    // means a branch re-read and re-fingerprinted the corpus
    assert(!s.contains("Scan parquet"),
      s"a branch re-scans the raw documents:\n$s")
    // keep-first (rn=1) and quota (rk<=10) must each push a partial
    // WindowGroupLimit below their exchange
    assert("WindowGroupLimit".r.findAllIn(s).length >= 4,
      s"window limits not pushed below the exchanges:\n$s")
  }

  test("tdata: the composite scans the documents parquet a bounded number of times") {
    // DISTINCT scan nodes via formatted mode (each unique scan prints
    // exactly one Location line), not tree-text line counts: the
    // pinned tok_ids stage is an InMemoryRelation whose cached child
    // prints once per REFERENCE in tree mode (and twice more under
    // AQE's Initial/Final echo), so a textual count conflates one
    // physical scan with its plan-print multiplicity. Since r19 the
    // verdict chain runs on checkpointed skinny rows (0 scans) and the
    // encode is the pinned stage whose only raw-text consumer is the
    // NULL-contract rejoin spine — so the whole composite owns ≤2
    // DISTINCT documents scans; a 3rd means a branch went back to the
    // raw table (the carrying-text-through-shuffles anti-shape this
    // plan exists to avoid). Same bound for embeddings: the semantic
    // verdict is an eagerly-checkpointed id frame.
    val s = formatted(PipelineOps.trainingData(spark, sf))
    def scans(table: String) = s.linesIterator
      .count(l => l.contains("Location:") && l.contains(s"$table.parquet"))
    val nd = scans("documents")
    assert(nd <= 2, s"expected <= 2 distinct documents scans, got $nd:\n$s")
    assert(scans("embeddings") <= 2,
      s"semantic stage re-scans embeddings unboundedly:\n$s")
  }

  test("semantic dedup family: cell-blocked pair joins, no unbounded product") {
    // the within-cell pair verification and the incremental probe are
    // equi-joins on the CELL. The membership subtree's N×K assignment
    // is a DELIBERATE BroadcastNestedLoopJoin against the 32-row
    // centroid set (ivfRankedWith's established shape — bounded build
    // side), so the pin here is (a) no CartesianProduct anywhere and
    // (b) every nested-loop node is a broadcast build — an unbounded
    // big-big nested loop cannot satisfy both.
    for ((name, df) <- Seq(
      "sdd" -> EmbeddingOps.semanticDedup(spark, sf),
      "sinc" -> EmbeddingOps.semanticDedupDelta(spark, sf),
      "sref" -> EmbeddingOps.semanticRefresh(spark, sf))) {
      val s = planString(df)
      assert(!s.contains("CartesianProduct"),
        s"$name plan contains a cartesian product:\n$s")
      val loops = s.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      assert(loops.forall(l => l.contains("BuildRight") || l.contains("BuildLeft")),
        s"$name has a non-broadcast nested loop:\n$s")
    }
    // the memo-stage lifecycle contract (clusterLabels' scaladoc): a
    // checkpoint-backed pinned stage must see one full action before
    // releaseTransients frees its transient checkpoint blocks — this
    // suite only built plan strings, so materialize sem_labels first
    // or a later suite sharing the session reads through freed blocks
    EmbeddingOps.semanticVerdicts(spark, sf)
      .write.format("noop").mode("overwrite").save()
    graft.operators.DedupOps.releaseTransients(spark)
  }

  test("pksq: bounded document scans, no cartesian, doc-granularity pack window") {
    val s = planString(PipelineOps.packedSequences(spark, sf))
    // same budget as the composite: verdicts on checkpointed rows,
    // text re-read only for the survivors' tokenize (+ NULL-contract
    // rejoin + the tokenizer's vocabulary scan)
    def scans(table: String) = s.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains(table))
    assert(scans("documents") <= 3,
      s"packed-sequence chain re-scans documents:\n$s")
    assert(!s.contains("CartesianProduct"),
      s"pksq plan contains a cartesian product:\n$s")
    // the stream-offset cumsum runs at DOC granularity: the pack
    // explode sits ABOVE its window child in the printed tree (the
    // window feeds the explode, never the reverse — a token-level
    // cumsum would funnel each stratum's every token through one
    // sort), and the per-window aggregation is a hash aggregate
    // keyed on the stratum + window id
    val lines = s.linesIterator.toSeq
    val gen = lines.indexWhere(l => l.contains("Generate posexplode"))
    assert(gen >= 0, s"pack explode missing:\n$s")
    assert(lines.exists(l => l.contains("HashAggregate") &&
      l.contains("lang") && l.contains("bucket") && l.contains("seq_id")),
      s"pack aggregation not keyed on (lang, bucket, seq_id):\n$s")
    graft.operators.DedupOps.releaseTransients(spark)
  }

  test("wci: keyed anti-join and probe shapes, never a nested loop") {
    val s = planString(TextOps.winnowCutDelta(spark, sf))
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"),
      s"wci fell to a nested loop:\n$s")
    graft.operators.DedupOps.releaseTransients(spark)
  }

  test("wct: the extent anti-join keys on doc_id, never a nested loop") {
    // equi key + range residual must plan as a keyed anti join; a
    // BroadcastNestedLoopJoin would pair every token with every
    // extent — quadratic in corpus size
    val s = planString(TextOps.winnowCut(spark, sf))
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"),
      s"wct anti-join fell to a nested loop:\n$s")
    graft.operators.DedupOps.releaseTransients(spark)
  }

  test("json_funcs parses the document exactly once") {
    val s = planString(EventOps.jsonFuncs(spark, sf))
    // JsonToStructs is a non-codegen parse; CollapseProject must keep
    // the multiply-referenced parse in its own projection instead of
    // inlining it into each of the three consumers (measured 1.7x at
    // sf1). More than one from_json in the plan means the structure
    // regressed.
    assert("from_json".r.findAllIn(s).length === 1,
      s"expected exactly one from_json parse in:\n$s")
  }

  test("zorder is one narrow projection over one broadcast stats row") {
    // the Morton math must not introduce a per-row shuffle: the only
    // exchanges are the broadcast of the 1-row min/max stats and the
    // final presentation sort
    val s = planString(LayoutOps.zorderKeys(spark, sf))
    assert(!s.contains("Exchange hashpartitioning"),
      s"zorder acquired a key shuffle:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"),
      s"stats row not broadcast in:\n$s")
  }

  test("hh builds the CMS in-plan off one checkpointed events read") {
    val s = planString(StatOps.sketchHeavyHitters(spark, sf))
    // the sketch must be the count_min_sketch AGGREGATE (binary
    // column, merged map-side), not a driver-side stat.countMinSketch
    assert(s.contains("count_min_sketch"),
      s"expected the count_min_sketch aggregate in:\n$s")
    // both the sketch branch and the exact top-10 read the same
    // checkpointed user_id column — a parquet scan here means a
    // branch went back to the raw events table
    assert(!s.contains("Scan parquet"),
      s"a branch re-scans raw events:\n$s")
    assert(s.contains("TakeOrderedAndProject"),
      s"exact top-10 lost its TakeOrderedAndProject shape:\n$s")
    // estimates evaluate executor-side against the broadcast 1-row
    // sketch frame — the scalar reader must appear in the projection
    assert(s.contains("cms_estimate"),
      s"cms_estimate projection missing in:\n$s")
  }

  test("skew_join: AQE splits the hot partition into balanced tasks") {
    // Demonstration scale-down, two dials (the REWRITE under test is
    // the same one a 100 TB hot key hits):
    //  - thresholds: production defaults (256 MB) can't trigger on
    //    test-scale bytes, so the skew detector runs at byte scale;
    //  - map tasks: the split slices a reduce partition by MAP RANGE,
    //    which needs multiple map outputs — a cluster scan has
    //    thousands, the local single-file scan has ONE — so the spec
    //    feeds skewJoin a multi-file copy of the tables.
    val skewDir = java.nio.file.Files
      .createTempDirectory("graft_skew_sf").toString
    graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
      .repartition(8).write.mode("overwrite")
      .parquet(s"$skewDir/events.parquet")
    graft.sources.Tables.customer(spark, "/root/testdata/sf0.01")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$skewDir/customer.parquet")
    // baseline on the SHARED session, untouched confs: genuinely
    // default thresholds, so the later equality really compares
    // split vs unsplit
    val plain = StatOps.skewJoin(spark, "/root/testdata/sf0.01").collect()
    // byte-scale thresholds go on a PRIVATE child session (own
    // SQLConf, shared SparkContext) — nothing shared is mutated, so
    // concurrent suites can never observe the demo dials
    val skewed = spark.newSession()
    skewed.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    skewed.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256")
    skewed.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256")
    skewed.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val df = StatOps.skewJoin(skewed, skewDir)
    val rows = df.collect() // AQE decides at runtime; materialize the final plan
    val s = planString(df)
    assert(s.contains("skew=true"),
      s"expected an isSkewJoin SortMergeJoin in the final adaptive plan:\n$s")
    // and the split preserved results: same rows as the unsplit
    // default-config run captured above
    assert(rows.map(_.toString).toSeq === plain.map(_.toString).toSeq,
      "skew-split run diverged from the unsplit run")
  }

  test("binned range join: AQE skew split composes with the bin equi-join") {
    // An incident storm piles intervals into a few grid cells — after
    // the bin rewrite the hot BIN is an ordinary hot join key, so the
    // claim "binning turns the nested loop into a join AQE can
    // re-balance" must be pinned the same way skew_join pins SMJ:
    // hot-bin fixture, byte-scale thresholds on a child session,
    // skew=true in the final adaptive plan, results preserved.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 85% of points and intervals land in bin 0 at w=10; multi-file
    // writes give the skew splitter map outputs to slice
    val hotDir = java.nio.file.Files.createTempDirectory("graft_rjskew").toString
    (1 to 4000).map { i =>
      val t = if (i % 20 < 17) rnd.nextDouble() * 10
              else 10.0 + rnd.nextDouble() * 400
      (i.toLong, t)
    }.toDF("pid", "t").repartition(8)
      .write.mode("overwrite").parquet(s"$hotDir/pts.parquet")
    (1 to 400).map { i =>
      val lo = if (i % 20 < 17) rnd.nextDouble() * 8
               else 10.0 + rnd.nextDouble() * 390
      (i.toLong, lo, lo + 2.0)
    }.toDF("iid", "lo", "hi").repartition(8)
      .write.mode("overwrite").parquet(s"$hotDir/ivs.parquet")
    // baseline: shared session, untouched confs
    val plain = RangeJoinOps.pointInInterval(
        spark.read.parquet(s"$hotDir/pts.parquet"), "t",
        spark.read.parquet(s"$hotDir/ivs.parquet"), "lo", "hi", 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    // byte-scale skew thresholds on a private child session; SMJ
    // forced via the broadcast threshold (the 100 TB shape)
    val child = spark.newSession()
    child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256")
    child.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256")
    val df = RangeJoinOps.pointInInterval(
        child.read.parquet(s"$hotDir/pts.parquet"), "t",
        child.read.parquet(s"$hotDir/ivs.parquet"), "lo", "hi", 10.0)
      .select("pid", "iid")
    // collect df ITSELF (not a derived .as[] twin): AQE finalizes —
    // and marks skew on — the exact plan that executes
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val s = planString(df)
    assert(s.contains("skew=true"),
      s"expected AQE to mark the hot-bin SMJ skew=true:\n$s")
    assert(rows.nonEmpty && rows === plain,
      "skew-split binned join diverged from the default-config run")
  }

  test("2-D box join: AQE skew split composes with the (bx, by) cell equi-join") {
    // The 2-D twin of the hot-bin pin above: a geographic/temporal
    // hotspot piles points AND boxes into one grid CELL — after the
    // box rewrite the hot (bx, by) pair is an ordinary hot composite
    // join key, so AQE must re-balance it exactly like any skewed SMJ.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val hotDir = java.nio.file.Files.createTempDirectory("graft_rj2skew").toString
    (1 to 4000).map { i =>
      val hot = i % 20 < 17 // 85% in cell (0, 0) at widths (10, 10)
      val (x, y) = if (hot) (rnd.nextDouble() * 10, rnd.nextDouble() * 10)
                   else (10 + rnd.nextDouble() * 400, 10 + rnd.nextDouble() * 400)
      (i.toLong, x, y)
    }.toDF("pid", "x", "y").repartition(8)
      .write.mode("overwrite").parquet(s"$hotDir/pts.parquet")
    (1 to 400).map { i =>
      val hot = i % 20 < 17
      val (xlo, ylo) = if (hot) (rnd.nextDouble() * 7, rnd.nextDouble() * 7)
                       else (10 + rnd.nextDouble() * 390, 10 + rnd.nextDouble() * 390)
      (i.toLong, xlo, xlo + 2.0, ylo, ylo + 2.0)
    }.toDF("bid", "xlo", "xhi", "ylo", "yhi").repartition(8)
      .write.mode("overwrite").parquet(s"$hotDir/boxes.parquet")
    val plain = RangeJoinOps.pointInBox(
        spark.read.parquet(s"$hotDir/pts.parquet"), "x", "y",
        spark.read.parquet(s"$hotDir/boxes.parquet"),
        "xlo", "xhi", "ylo", "yhi", 10.0, 10.0)
      .select("pid", "bid").as[(Long, Long)].collect().sorted.toSeq
    val child = spark.newSession()
    child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256")
    child.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256")
    val df = RangeJoinOps.pointInBox(
        child.read.parquet(s"$hotDir/pts.parquet"), "x", "y",
        child.read.parquet(s"$hotDir/boxes.parquet"),
        "xlo", "xhi", "ylo", "yhi", 10.0, 10.0)
      .select("pid", "bid")
    // collect df ITSELF (not a derived twin): AQE finalizes — and
    // marks skew on — the exact plan that executes
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val s = planString(df)
    assert(s.contains("skew=true"),
      s"expected AQE to mark the hot-cell SMJ skew=true:\n$s")
    assert(rows.nonEmpty && rows === plain,
      "skew-split 2-D box join diverged from the default-config run")
  }

  test("binned range join over a bucketed bin layout joins with zero Exchange") {
    // The repeated-range-join amortization: an interval table reused
    // across many queries (validity periods, incident windows) is
    // written ONCE pre-exploded into its bins and bucketed by the bin
    // id; the point stream is bucketed by its (single) bin the same
    // way. Every later width-w range join between them is then a
    // plain co-located SMJ on the bin — zero Exchange on either side,
    // the same layout economics LayoutOps.bucketedJoin pins for equi
    // keys. RangeJoinOps.binFor/binsFor are the public building
    // blocks (same floor(x/w) grid and runaway guard as the join).
    val w = 900.0
    val base = java.nio.file.Files.createTempDirectory("graft_rjbkt").toString
    val ev = graft.sources.Tables.events(spark, sf)
    val inc = ev.filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .select(org.apache.spark.sql.functions.col("ts").as("lo"),
        (org.apache.spark.sql.functions.col("ts") +
          org.apache.spark.sql.functions.expr("INTERVAL 15 MINUTES")).as("hi"))
    val p = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id").as("p_id"))
    spark.sql("DROP TABLE IF EXISTS graft_rj_pts_bkt")
    spark.sql("DROP TABLE IF EXISTS graft_rj_inc_bkt")
    p.withColumn("bin", RangeJoinOps.binFor(p, "ts", w))
      .write.mode("overwrite").option("path", s"$base/pts")
      .bucketBy(8, "bin").sortBy("bin").saveAsTable("graft_rj_pts_bkt")
    inc.withColumn("bin", org.apache.spark.sql.functions.explode(
        RangeJoinOps.binsFor(inc, "lo", "hi", w)))
      .write.mode("overwrite").option("path", s"$base/inc")
      .bucketBy(8, "bin").sortBy("bin").saveAsTable("graft_rj_inc_bkt")
    val pb = spark.table("graft_rj_pts_bkt")
    val ib = spark.table("graft_rj_inc_bkt")
    val joined = pb.hint("merge").join(ib,
      pb("bin") === ib("bin") && pb("ts") >= ib("lo") && pb("ts") < ib("hi"))
    val s = planString(joined)
    assert(s.contains("SortMergeJoin") && !s.contains("Exchange"),
      s"bucketed bin layout should join with zero Exchange:\n$s")
    // layout never changes results: ≡ the direct grid join
    val got = joined.select(pb("p_id"), ib("lo")).collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)))).sorted.toSeq
    val want = RangeJoinOps.pointInInterval(p, "ts", inc, "lo", "hi", w)
      .select("p_id", "lo").collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)))).sorted.toSeq
    assert(got.nonEmpty && got === want,
      "bucketed-layout range join diverged from the direct grid join")
  }

  test("CBO join reorder: statistics move the selective dim ahead of the big fact") {
    // Every small-side join in the engine is manually broadcast()- or
    // merge-hinted; at 100 TB the optimizer must also be able to pick
    // JOIN ORDER from statistics, because the human-written order of a
    // 3-way join is wrong as often as not. Demonstrated end to end:
    // catalog tables + ANALYZE ... FOR ALL COLUMNS, then the same
    // deliberately-bad syntactic order (lineitem ⋈ orders first, the
    // selective customer filter LAST) planned with CBO off vs on.
    val dir01 = "/root/testdata/sf0.01"
    val base = java.nio.file.Files.createTempDirectory("graft_cbo").toString
    def mkTable(name: String, df: DataFrame): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite").option("path", s"$base/$name").saveAsTable(name)
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    mkTable("cbo_lineitem", graft.sources.Tables.lineitem(spark, dir01)
      .select("l_orderkey", "l_extendedprice"))
    mkTable("cbo_orders", graft.sources.Tables.orders(spark, dir01)
      .select("o_orderkey", "o_custkey"))
    mkTable("cbo_customer", graft.sources.Tables.customer(spark, dir01)
      .select("c_custkey", "c_mktsegment"))
    val sql = """SELECT count(*) AS n
                 FROM cbo_lineitem l
                 JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
                 JOIN cbo_customer c ON o.o_custkey = c.c_custkey
                 WHERE c.c_mktsegment = 'BUILDING'"""
    // leaf order in the optimized plan reads the join tree left-to-right
    def leafOrder(s: SparkSession): Seq[String] =
      "cbo_(lineitem|orders|customer)".r
        .findAllIn(s.sql(sql).queryExecution.optimizedPlan.toString())
        .toSeq.distinct
    val off = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    val on = spark.newSession()
    on.conf.set("spark.sql.cbo.enabled", "true")
    on.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val (offOrder, onOrder) = (leafOrder(off), leafOrder(on))
    // without stats-driven reorder the syntactic order survives
    assert(offOrder === Seq("cbo_lineitem", "cbo_orders", "cbo_customer"),
      s"cbo-off baseline not in syntactic order: $offOrder")
    // with CBO the filtered customer dim must join BEFORE the big
    // fact joins in — the stats-driven order a human hint encoded
    assert(onOrder.indexOf("cbo_customer") < onOrder.indexOf("cbo_lineitem"),
      s"CBO did not reorder the selective dim ahead of the fact: $onOrder")
    // and the reorder preserved the result
    val (a, b) = (off.sql(sql).head().getLong(0), on.sql(sql).head().getLong(0))
    assert(a === b && a > 0, s"reordered result diverged: $a vs $b")
  }

  test("from_json prunes the parse schema to the referenced field") {
    // the 100 TB claim on json_funcs' parse-once structure: when a
    // query touches ONE field, OptimizeJsonExprs must narrow the
    // JsonToStructs schema so unreferenced fields are never parsed
    import org.apache.spark.sql.functions.{col, from_json}
    val df = graft.sources.Tables.events(spark, sf)
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k LONG, missing STRING")).as("j"))
      .select(col("j.k"))
    val opt = df.queryExecution.optimizedPlan.toString()
    assert(opt.contains("from_json"), s"parse disappeared entirely:\n$opt")
    assert(opt.contains("StructField(k"),
      s"referenced field missing from parse schema:\n$opt")
    assert(!opt.contains("StructField(missing"),
      s"unreferenced field still in the parse schema (pruning lost):\n$opt")
  }
}
