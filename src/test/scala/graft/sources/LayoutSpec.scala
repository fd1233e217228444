package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout evidence for the 100 TB story: co-located (bucketed)
  * joins must not shuffle either side, and partition-pruned scans must
  * push the partition predicate into file listing — the two techniques
  * that keep a 1000-executor join/scan from touching the whole corpus.
  * Local bucket/partition counts are small; the plan SHAPES are what
  * carry to scale.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("layout-spec", "4")
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with zero exchanges on either side") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf)
      .select("c_custkey", "c_name")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    orders.write.mode("overwrite")
      .option("path", "/tmp/graft_layout/orders_bkt")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    customer.write.mode("overwrite")
      .option("path", "/tmp/graft_layout/customer_bkt")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    // forbid broadcast so the join must exploit the bucket layout
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located join in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it is not vacuous: the same join on the raw parquet DOES shuffle
      val raw = orders.join(customer, col("o_custkey") === col("c_custkey"))
      assert(raw.queryExecution.executedPlan.toString().contains("Exchange"))
      // results identical either way
      assert(j.count() === raw.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("bkt_join operator: planned join is an Exchange-free SMJ and matches the raw join") {
    val df = graft.operators.LayoutOps.bucketedJoin(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(3)),
      "bucketed_no_exchange gate is FALSE — the layout claim failed at plan time")
    // the gate's plan interrogation is also re-checked here from the
    // outside, so a regression in the operator's own check cannot
    // silently weaken it: same inputs, same hint, direct plan read
    val (o, c) = (spark.table(spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_orders_bkt_")).head),
      spark.table(spark.catalog.listTables().collect()
        .map(_.name).filter(_.startsWith("graft_customer_bkt_")).head))
    val plan = o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
      s"bucketed join shuffles:\n$plan")
    // and the aggregate equals the unbucketed in-engine join
    val raw = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        graft.util.Num.moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      raw.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq,
      "bucketed-join aggregate diverged from the raw join")
  }

  test("rt_bloom: runtime bloom filter is injected, prunes before the shuffle, and preserves the result") {
    val dir01 = "/root/testdata/sf0.01"
    val df = graft.operators.LayoutOps.runtimeBloomJoin(spark, dir01)
    val row = df.head()
    assert(row.getBoolean(2),
      "bloom_injected gate is FALSE — InjectRuntimeFilter did not fire")
    // external re-check of the operator's own plan interrogation:
    // same dials, direct read of the optimized plan
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
    def joined(sess: SparkSession) =
      Tables.lineitem(sess, dir01).select("l_orderkey", "l_extendedprice")
        .join(Tables.orders(sess, dir01)
          .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
    val opt = joined(s).queryExecution.optimizedPlan.toString()
    assert(opt.contains("might_contain"),
      s"no bloom probe on the application side:\n$opt")
    // negative control: with the feature off the probe must vanish
    val off = spark.newSession()
    off.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    off.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    assert(!joined(off).queryExecution.optimizedPlan.toString()
      .contains("might_contain"),
      "bloom probe injected with the feature disabled")
    // and pruning is result-preserving: the plain-session join (default
    // thresholds, no injection on local file sizes) agrees exactly
    val plain = joined(off)
      .agg(count(lit(1)).as("n_rows"),
        graft.util.Num.moneySum(col("l_extendedprice")).as("sum_price"))
      .head()
    assert((row.getLong(0), row.getDouble(1)) ===
      ((plain.getLong(0), plain.getDouble(1))),
      "bloom-pruned join diverged from the plain join")
  }

  test("xchg_reuse: one shuffle feeds both consumers, and reuse preserves the result") {
    val dir01 = "/root/testdata/sf0.01"
    val df = graft.operators.LayoutOps.exchangeReuse(spark, dir01)
    val rows = df.collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getBoolean(4)),
      "exchange_reused gate is FALSE — the second consumer re-shuffled")
    // negative control: with exchange reuse disabled the node vanishes
    // (same child-session dials as the operator, AQE off for a static plan)
    val noReuse = spark.newSession()
    noReuse.conf.set("spark.sql.adaptive.enabled", "false")
    noReuse.conf.set("spark.sql.exchange.reuse", "false")
    val g = Tables.lineitem(noReuse, dir01)
      .groupBy("l_orderkey")
      .agg(graft.util.Num.moneySum(col("l_extendedprice")).as("order_rev"))
    val top = g.orderBy(col("order_rev").desc, col("l_orderkey")).limit(5)
    val stats = g.agg(count(lit(1)).as("n_orders"),
      graft.util.Num.moneySum(col("order_rev")).as("total_rev"))
    val unshared = top.crossJoin(stats)
    assert(!unshared.queryExecution.executedPlan.toString()
      .contains("ReusedExchange"),
      "ReusedExchange present with spark.sql.exchange.reuse=false")
    // and reuse is result-preserving: values equal the reuse-free run
    val want = unshared
      .orderBy(col("order_rev").desc, col("l_orderkey")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSeq ===
      want.toSeq,
      "exchange-reuse run diverged from the reuse-free run")
  }

  test("partition-pruned scan pushes the partition predicate to file listing") {
    val out = "/tmp/graft_layout/orders_by_year"
    Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("order_year") === 1995)
    val s = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(s.contains("PartitionFilters") &&
      s.replaceAll("\\s", "").contains("order_year"),
      s"partition predicate not pruned in:\n$s")
    // the predicate must NOT appear as a data filter on row contents
    val full = spark.read.parquet(out)
    assert(pruned.count() > 0 && pruned.count() < full.count())
  }

  test("dynamic partition pruning: a dim predicate prunes fact partitions at runtime") {
    import spark.implicits._
    // the runtime complement of the static partition-pruning test
    // above: the year is only known after filtering the dim, so the
    // fact scan must receive a DYNAMIC pruning subquery (DPP reuses
    // the broadcast). Note the dim predicate is an equality on a
    // literal — the rule only fires for likely-selective predicates
    // (a bare boolean attribute does not qualify).
    val out = "/tmp/graft_layout/orders_by_year_dpp"
    Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(out)
    val fact = spark.read.parquet(out)
    val dimPath = "/tmp/graft_layout/year_dim"
    Seq((1995, "current"), (1996, "past"), (1997, "past"), (1998, "past"))
      .toDF("order_year", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val j = fact.join(dim.filter(col("tag") === "current"), Seq("order_year"))
      .groupBy("order_year").agg(count(lit(1)).as("n"))
    val rows = j.collect()
    val s = j.queryExecution.executedPlan.toString()
    assert(s.contains("dynamicpruning"),
      s"no dynamic pruning subquery on the fact scan:\n$s")
    // and the pruned plan returns exactly the statically-filtered count
    val want = fact.filter(col("order_year") === 1995).count()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((1995, want)),
      s"DPP result diverged: ${rows.toSeq} vs $want")
  }

  test("IVF cell-partitioned corpus: a probe's scan prunes to its cells' files") {
    // the annIvf scaladoc claims "at real scale the corpus is written
    // partitioned by cell, so a query touches one partition" — prove
    // it the way the orders_by_year test proves year pruning: write
    // the corpus partitioned by its arank=1 cell, run one query's
    // nprobe=2 probe through the parquet path, and measure the files
    // actually opened.
    val dir01 = "/root/testdata/sf0.01"
    val ranked = graft.operators.EmbeddingOps.ivfCellAssignments(spark, dir01)
    val out = "/tmp/graft_layout/emb_by_cell"
    ranked.filter(col("arank") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(out)
    val stored = spark.read.parquet(out)
    val totalFiles = stored.select(input_file_name()).distinct().count()
    assert(totalFiles >= graft.operators.EmbeddingOps.IvfCentroidK,
      s"expected at least one file per cell, got $totalFiles")
    // query 0's two nearest cells (its nprobe=2 probe set)
    val probeCells = ranked
      .filter(col("vec_id") === 0 && col("arank") <= 2)
      .select("cent_id").collect().map(_.getLong(0)).toSeq
    assert(probeCells.length === 2)
    val probed = stored.filter(col("cell").isin(probeCells: _*))
    // the partition predicate must reach file listing, not row
    // filters: the cell reference must sit INSIDE the
    // PartitionFilters bracket itself (a plan that merely mentions
    // cell# in a downstream Filter node must not pass)
    val s = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val partFilter = "PartitionFilters:\\s*\\[[^\\]]*cell".r
    assert(partFilter.findFirstIn(s).isDefined,
      s"cell predicate not pruned at listing time:\n$s")
    // files actually opened ~ nprobe/K of the corpus (2 of 32 cells)
    val touched = probed.select(input_file_name()).distinct().count()
    assert(touched.toDouble / totalFiles <= 3.0 / 32,
      s"probe touched $touched of $totalFiles files — pruning lost")
    // and the partitioned path returns the SAME neighbors: top-5 for
    // query 0 from the pruned scan ≡ the in-memory IVF nprobe=2 result
    val qv = ranked.filter(col("vec_id") === 0 && col("arank") === 1)
      .select("v").head().getSeq[Double](0)
    val qvCol = array(qv.map(lit): _*)
    val viaParquet = probed.filter(col("vec_id") =!= 0)
      .withColumn("cos", graft.operators.EmbeddingOps.cosine(qvCol, col("v")))
      .orderBy(desc("cos"), col("vec_id")).limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val inMemory = graft.operators.EmbeddingOps.annIvfProbe2(spark, dir01)
      .filter(col("query_id") === 0).orderBy("rank")
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(viaParquet === inMemory,
      s"partitioned-path neighbors $viaParquet != in-memory $inMemory")
  }

  test("dynamic partition overwrite rewrites only the partitions receiving data") {
    // the incremental-backfill primitive at 100 TB: re-running one
    // day's ingest must replace THAT day's partition and leave the
    // other ~36,500 untouched. Default (static) overwrite mode is the
    // classic footgun — it clears the whole root first — so both
    // behaviors are pinned: static loses the sibling partitions,
    // dynamic preserves them byte-for-byte.
    val base = java.nio.file.Files.createTempDirectory("graft_dynow").toString
    def orders = Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
    def writeFull(out: String): Unit =
      orders.write.mode("overwrite").partitionBy("order_year").parquet(out)
    def slice(hit: Int) = orders.filter(col("order_year") === hit)
      .withColumn("o_totalprice", lit(0.0))
    val years = orders.select("order_year").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(years.length >= 2, "fixture needs at least two year partitions")
    val (keep, hit) = (years.head, years.last)
    // static mode (the default): the one-partition rewrite clears the
    // whole dataset root — sibling partitions are gone afterwards
    val statOut = s"$base/static"
    writeFull(statOut)
    slice(hit).write.mode("overwrite").partitionBy("order_year").parquet(statOut)
    assert(spark.read.parquet(statOut)
      .filter(col("order_year") === keep).count() === 0L,
      "static overwrite unexpectedly preserved sibling partitions")
    // dynamic mode: only the partition that received data is replaced
    val dynOut = s"$base/dynamic"
    writeFull(dynOut)
    val beforeKeep = spark.read.parquet(dynOut)
      .filter(col("order_year") === keep).count()
    val dyn = spark.newSession()
    dyn.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    Tables.orders(dyn, sf)
      .withColumn("order_year", year(col("o_orderdate")))
      .filter(col("order_year") === hit)
      .withColumn("o_totalprice", lit(0.0))
      .write.mode("overwrite").partitionBy("order_year").parquet(dynOut)
    val after = spark.read.parquet(dynOut)
    assert(after.filter(col("order_year") === keep).count() === beforeKeep,
      "dynamic overwrite disturbed an untouched partition")
    val hitRows = after.filter(col("order_year") === hit)
    assert(hitRows.count() > 0 &&
      hitRows.agg(max(abs(col("o_totalprice")))).head().getDouble(0) === 0.0,
      "dynamic overwrite did not replace the targeted partition")
  }

  test("z-order layout gives every written file a tight two-column bounding box") {
    import org.apache.spark.sql.DataFrame
    // sf0.01 so each of the 8 range partitions holds enough orders
    // for per-file spans to be meaningful
    val o = graft.operators.LayoutOps.zorderKeys(spark, "/root/testdata/sf0.01")
    val parts = 8
    // write the layout to REAL parquet files, read back, and measure
    // per-file (x-span + y-span) — exactly what min/max footer
    // skipping sees: a file is pruned for a box query when the box
    // misses its bounds, so tighter boxes = more pruned files
    def fileSpans(laidOut: DataFrame, out: String): DataFrame = {
      laidOut.write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
        .groupBy(input_file_name().as("f"))
        .agg((max("zx") - min("zx")).as("xspan"),
          (max("zy") - min("zy")).as("yspan"))
    }
    def mean(spans: DataFrame, e: Column): Double =
      spans.agg(avg(e)).head().getDouble(0)
    val zFiles = fileSpans(
      o.repartitionByRange(parts, col("zval")).sortWithinPartitions("zval"),
      "/tmp/graft_layout/orders_z")
    val keyFiles = fileSpans(
      o.repartitionByRange(parts, col("o_orderkey")),
      "/tmp/graft_layout/orders_key")
    assert(zFiles.count() >= parts - 1, "range write produced too few files")
    // single-key layout: zx/zy are independent of o_orderkey, so every
    // file spans ~the full plane; z-order must tile it substantially
    val (zBox, keyBox) = (mean(zFiles, col("xspan") + col("yspan")),
      mean(keyFiles, col("xspan") + col("yspan")))
    assert(zBox < keyBox * 0.5,
      s"z-order did not tighten file bounds: z=$zBox vs key=$keyBox")
    // and a one-dimension range layout on zx alone must NOT bound zy:
    // z-order trades a little x-tightness for bounds on BOTH columns
    val xFiles = fileSpans(o.repartitionByRange(parts, col("zx")),
      "/tmp/graft_layout/orders_x")
    assert(mean(zFiles, col("yspan")) < mean(xFiles, col("yspan")),
      "z-order should bound the second column where an x-only sort cannot")
  }

  test("small-file compaction collapses file count, preserves content, no shuffle by default") {
    import graft.operators.LayoutOps
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // an over-parallel write: 40 tiny files
    val src = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    src.repartition(40).write.mode("overwrite").parquet(s"$base/messy")
    val (filesIn, filesOut, rows) =
      LayoutOps.compactParquet(spark, s"$base/messy", s"$base/tidy")
    assert(filesIn >= 40, s"fixture did not produce small files: $filesIn")
    assert(filesOut <= 2, s"compaction left $filesOut files")
    assert(rows === src.count(), "compaction changed the row count")
    // content identical as a multiset
    val before = spark.read.parquet(s"$base/messy").collect()
      .map(_.toString).sorted.toSeq
    val after = spark.read.parquet(s"$base/tidy").collect()
      .map(_.toString).sorted.toSeq
    assert(after === before, "compaction changed the data")
    // the default path must not shuffle: coalesce keeps the read
    // pipeline exchange-free (the 100 TB point — compaction is I/O,
    // not a shuffle job)
    val plan = spark.read.parquet(s"$base/messy").coalesce(1)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"coalesce path shuffled:\n$plan")
    // in-place compaction would have overwrite destroy the input the
    // lazy read still needs — both directions must fail fast
    val e = intercept[IllegalArgumentException] {
      LayoutOps.compactParquet(spark, s"$base/messy", s"$base/messy")
    }
    assert(e.getMessage.contains("destroy"), e.getMessage)
    intercept[IllegalArgumentException] {
      LayoutOps.compactParquet(spark, s"$base/messy", s"$base/messy/sub")
    }
    // partition-preserving compaction: a dt-style layout keeps its
    // directories, and each partition dir collapses to ONE file (the
    // hash-repartition-on-partition-columns shape; a naive coalesce +
    // partitionBy would re-create a file per task per partition)
    graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text")
      .repartition(10)
      .write.mode("overwrite").partitionBy("lang").parquet(s"$base/part_messy")
    val (pIn, pOut, pRows) = LayoutOps.compactParquet(
      spark, s"$base/part_messy", s"$base/part_tidy",
      partitionBy = Seq("lang"))
    val langs = spark.read.parquet(s"$base/part_tidy")
      .select("lang").distinct().count()
    assert(pOut <= langs, s"partitioned compaction left $pOut files for $langs partitions")
    assert(pIn > pOut && pRows === spark.read.parquet(s"$base/part_messy").count())
    // layout preserved: partition directories exist at the destination
    val dirs = new java.io.File(s"$base/part_tidy").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.nonEmpty, "partition directories were flattened")
    // the documented escape hatch for LARGE partitions: in partitionBy
    // mode sizing is per-partition-value, and maxRecordsPerFile is how
    // a caller caps a huge partition — each dir splits past the cap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxRecordsPerFile", "5")
    val (_, cappedOut, cappedRows) = LayoutOps.compactParquet(
      s2, s"$base/part_messy", s"$base/part_capped",
      partitionBy = Seq("lang"))
    assert(cappedOut > langs,
      s"maxRecordsPerFile did not split large partitions: $cappedOut files")
    assert(cappedRows === pRows)
    // per-partition-bytes sizing: derive the records-per-file cap from
    // targetBytes and the source's measured bytes-per-row, so a huge
    // partition VALUE splits into ≈targetBytes files without the
    // caller hand-tuning a conf — a target of ~2 average rows forces
    // strictly more files than partition values
    val avgRowBytes = {
      val d = new java.io.File(s"$base/part_messy")
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      math.max(1L, walk(d) / math.max(1L, pRows))
    }
    val (_, sizedOut, sizedRows) = LayoutOps.compactParquet(
      spark, s"$base/part_messy", s"$base/part_sized",
      targetBytes = 2 * avgRowBytes, partitionBy = Seq("lang"),
      sizePartitionFiles = true)
    assert(sizedOut > langs,
      s"sizePartitionFiles did not split large partitions: $sizedOut files")
    assert(sizedRows === pRows)
    intercept[IllegalArgumentException] { // flat modes already size by targetBytes
      LayoutOps.compactParquet(spark, s"$base/part_messy", s"$base/part_bad",
        sizePartitionFiles = true)
    }
  }

  test("packed-corpus artifact: stratum layout, shard rolling, content identity, listing-time pruning") {
    import graft.operators.{DedupOps, PipelineOps}
    val dir01 = "/root/testdata/sf0.01"
    val base = java.nio.file.Files.createTempDirectory("graft_pkc_spec").toString
    val dest = s"$base/packed"
    // cap of 1 record/file: proves the writer ROLLS shards inside a
    // stratum (a monster-file writer would emit one file per stratum
    // regardless of the cap)
    val (files, rows) = PipelineOps.writePackedCorpus(spark, dir01, dest,
      maxRecordsPerFile = 1L)
    val mem = PipelineOps.packedSequences(spark, dir01).collect()
    DedupOps.releaseTransients(spark)
    assert(mem.nonEmpty && rows === mem.length.toLong,
      s"artifact carries $rows rows, in-memory frame ${mem.length}")
    assert(files === rows,
      s"maxRecordsPerFile=1 must roll one shard per window: $files files, $rows rows")
    // Hive-style stratum directories exist at both levels
    val langDirs = new java.io.File(dest).listFiles()
      .filter(_.isDirectory).filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty, "no lang= partition directories")
    assert(langDirs.exists(_.listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("bucket="))),
      "no bucket= partition directories under lang=")
    // content identity: the read-back face returns EXACTLY the
    // in-memory frame (schema order, partition-value types, rows)
    val back = PipelineOps.readPackedCorpus(spark, dest).collect()
    assert(back.map(_.toString).sorted.toSeq ===
      mem.map(_.toString).sorted.toSeq,
      "artifact round-trip diverged from the in-memory frame")
    // one-stratum read prunes at LISTING time: the partition predicate
    // must sit inside PartitionFilters, and the files actually opened
    // must be ≤ that stratum's own shard count (never the corpus)
    val r0 = mem.find(r => !r.isNullAt(0)).get
    val (l, b) = (r0.getString(0), r0.getString(1))
    val stratumFiles = mem.count(r => !r.isNullAt(0) &&
      r.getString(0) == l && r.getString(1) == b)
    val pruned = spark.read.schema(PipelineOps.PackedCorpusSchema).parquet(dest)
      .filter(col("lang") === l && col("bucket") === b)
    val s = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PartitionFilters:\\s*\\[[^\\]]*bucket".r.findFirstIn(s).isDefined,
      s"stratum predicate not pruned at listing time:\n$s")
    val touched = pruned.select(input_file_name()).distinct().count()
    assert(touched <= stratumFiles && touched < files,
      s"one-stratum read touched $touched of $files files " +
        s"(stratum holds $stratumFiles)")
  }

  test("compaction across distinct filesystems lists each side with its own FS") {
    import graft.operators.LayoutOps
    // a genuinely distinct second FileSystem without a second store:
    // a viewfs:// mount table whose link resolves to the local disk.
    // Src stays on file:, dest lives on viewfs://graftmt/... — the
    // file:-staging → hdfs:/s3:-target copy-compact shape. The final
    // file count must list the dest through the dest's OWN FileSystem
    // (listing a viewfs path through src's LocalFileSystem throws
    // 'Wrong FS' — AFTER the write already succeeded).
    val base = java.nio.file.Files.createTempDirectory("graft_xfs").toString
    spark.sparkContext.hadoopConfiguration.set(
      "fs.viewfs.mounttable.graftmt.link./stage", s"file:$base/stage")
    val src = graft.sources.Tables.nation(spark, sf)
    src.repartition(8).write.mode("overwrite").parquet(s"$base/messy")
    val destDir = "viewfs://graftmt/stage/tidy"
    val (filesIn, filesOut, rows) = LayoutOps.compactParquet(
      spark, s"$base/messy", destDir)
    assert(filesIn >= 8 && filesOut <= 2,
      s"cross-FS compaction: $filesIn -> $filesOut files")
    assert(rows === src.count())
    val after = spark.read.parquet(destDir).collect()
      .map(_.toString).sorted.toSeq
    assert(after === src.collect().map(_.toString).sorted.toSeq)
  }
}
