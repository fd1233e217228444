package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-input checks for the round-6 operator families: the
  * distributed implementations must match straightforward in-JVM
  * reference implementations on arbitrary data, not just on the
  * driver's corpus. Fixed seed → deterministic CI.
  */
class OperatorPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("op-prop-spec", "4")

  private val rnd = new scala.util.Random(20260813L)

  /** Write a synthetic orders/lineitem pair under a temp dir so the
    * dir-based operators run on it unchanged.
    */
  private def writeTables(dir: String, nOrders: Int, nLines: Int): Unit = {
    val priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val orders = (1 to nOrders).map { i =>
      Row(i.toLong, rnd.nextInt(20).toLong, "O",
        math.rint(rnd.nextDouble() * 1000 * 100) / 100,
        java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(1995, 1, 1, 0, 0).plusDays(rnd.nextInt(400))),
        priorities(rnd.nextInt(priorities.length)))
    }
    val oSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(orders, 3), oSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val lines = (1 to nLines).map { i =>
      Row(i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(8).toLong)
    }
    val lSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(lines, 3), lSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("scd2_build matches a sequential fold on random order histories") {
    val dir = "/tmp/graft_prop_scd2"
    writeTables(dir, nOrders = 400, nLines = 1)
    // reference: per customer, walk orders in (day, orderkey) order and
    // emit a version on every priority change
    val raw = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey", "o_orderpriority",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400 AS od")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = raw.groupBy(_._1).flatMap { case (cust, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val changes = sorted.foldLeft(Vector.empty[(String, Long)]) { (acc, r) =>
        if (acc.isEmpty || acc.last._1 != r._3) acc :+ (r._3, r._4) else acc
      }
      changes.zipAll(changes.drop(1).map(c => Some(c._2)), null, None).collect {
        case ((prio, from), to: Option[Long] @unchecked) =>
          (cust, prio, from, to.getOrElse(-1L), to.isEmpty)
      }
    }.toSet
    val got = TimeSeriesOps.scd2Build(spark, dir).collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))
    }.toSet
    assert(got === expected)
  }

  test("pagerank matches an in-JVM reference on random bipartite graphs") {
    val dir = "/tmp/graft_prop_pr"
    writeTables(dir, nOrders = 1, nLines = 600)
    val edgesRaw = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("'s' || l_suppkey AS a", "'p' || l_partkey AS b")
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val adj = scala.collection.mutable.Map.empty[String, Vector[String]]
    edgesRaw.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Vector.empty) :+ b
      adj(b) = adj.getOrElse(b, Vector.empty) :+ a
    }
    val n = adj.size
    var rank = adj.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to GraphOps.PageRankIters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      adj.foreach { case (a, nbrs) =>
        val c = math.floor(rank(a) / nbrs.length * 1e15).toLong
        nbrs.foreach(b => contrib(b) = contrib.getOrElse(b, 0L) + c)
      }
      rank = contrib.map { case (k, v) =>
        k -> ((1 - GraphOps.Damping) / n + GraphOps.Damping * (v / 1e15))
      }.toMap
    }
    val expected = rank.map { case (k, v) => k -> math.rint(v * 1e9).toLong }
    val got = GraphOps.pageRank(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  /** Random documents table: short token-salad docs over a tiny vocab
    * (so gram/bigram collisions are common), plus planted edge shapes
    * — an exact-duplicate pair, an empty doc, a single-token doc, and
    * a one-note doc repeating a single token.
    */
  private def writeDocs(dir: String, nDocs: Int): Seq[(Long, String)] = {
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "la", "mu")
    def salad(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (1 to nDocs).map(i => (i.toLong, salad(rnd.nextInt(28))))
    val docs = base ++ Seq(
      (nDocs + 1L, base.head._2),                        // exact duplicate of doc 1
      (nDocs + 2L, ""),                                  // empty
      (nDocs + 3L, "alpha"),                             // single token
      (nDocs + 4L, Array.fill(20)("beta").mkString(" "))) // one-note
    val rows = docs.map { case (id, t) =>
      Row(id, t, "en", s"src${id % 3}", t.length.toLong)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    docs
  }

  private def toks(t: String): Array[String] =
    t.trim.split("\\s+").filter(_.nonEmpty)

  test("dup_spans matches an in-JVM reference on random corpora") {
    val dir = "/tmp/graft_prop_spans"
    val docs = writeDocs(dir, nDocs = 60)
    val gramSets = docs.map { case (id, t) =>
      id -> toks(t).sliding(PipelineOps.DecontamK)
        .filter(_.length == PipelineOps.DecontamK).map(_.mkString(" ")).toSet
    }.toMap
    val df = gramSets.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size)
    val expected = gramSets.map { case (id, gs) =>
      id -> (gs.size.toLong, gs.count(g => df(g) >= 2).toLong)
    }
    val got = PipelineOps.dupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    DedupOps.clearCaches(spark)
    assert(got === expected)
    // the planted exact-duplicate pair must fully overlap
    val (n1, d1) = got(61L)
    assert(n1 === d1 && (n1 > 0L || gramSets(1L).isEmpty))
  }

  test("lm_score matches an in-JVM reference on random corpora") {
    val dir = "/tmp/graft_prop_lm"
    val docs = writeDocs(dir, nDocs = 60)
    val positions = docs.map { case (id, t) =>
      id -> toks(t).sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toVector
    }.toMap
    val c2 = positions.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size.toLong)
    val c1 = c2.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val expected = positions.map { case (id, ps) =>
      val scaled = ps.map { bg =>
        math.floor(c2(bg).toDouble / c1(bg._1).toDouble * 1e12).toLong
      }
      id -> (ps.length.toLong,
        if (ps.isEmpty) 0L else scaled.sum / ps.length)
    }
    val got = TextOps.lmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    DedupOps.releaseTransients(spark)
    assert(got === expected)
    // the one-note doc's every bigram is (beta, beta) with P = its own
    // count / beta-start count — its positions all score identically
    assert(got(64L)._1 === 19L)
  }

  test("min_k_distinct_longs matches the in-JVM reference on random shapes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the KMV sketch state must equal distinct→sort→take(k) for ANY
    // data, duplication pattern, k, and partitioning — including k
    // larger than the distinct count (exact mode), empty input, and
    // null values (skipped, like every Spark aggregate)
    for (trial <- 1 to 10) {
      val n = rnd.nextInt(400)
      val domain = 1 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(40)
      val values = (0 until n).map(_ =>
        if (rnd.nextInt(10) == 0) None
        else Some(rnd.nextLong() % domain))
      val rows = values.map(v => Row(v.map(Long.box).orNull))
      val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(6)),
          StructType(Seq(StructField("v", LongType, nullable = true))))
      val got = df.agg(graft.functions.BoundedAgg
          .minKDistinctLongs(col("v"), k).as("mk"))
        .head().getSeq[Long](0)
      val want = values.flatten.distinct.sorted.take(k)
      assert(got === want,
        s"trial $trial (n=$n domain=$domain k=$k) diverged: $got vs $want")
    }
  }
}
