package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Zero-row robustness: at cluster scale empty inputs are routine
  * (empty partitions, fresh ingests, filtered-to-nothing branches).
  * Every registered query must execute over a fully EMPTY dataset —
  * no divide-by-zero, no .head on nothing, no null-order surprises —
  * and return zero rows.
  */
class EmptyInputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("empty-spec", "4")
  lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dst = "/tmp/graft_empty"
    graft.sources.Tables.all.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    dst
  }

  // Global-aggregate reports whose FIXED-SHAPE output on empty input
  // is the correct behavior: a profiler must report its columns with
  // n=0, a DQ suite must report every check passing — vanishing would
  // be the bug. Their row counts are pinned below instead.
  private val fixedShape = Map("prof" -> 6L, "papx" -> 6L, "dq" -> 7L,
    // one-row global gates: a grand aggregate emits one row on empty
    // input in both engines (n=0 / NULL metrics / vacuous-TRUE bounds)
    "blm" -> 1L, "skm" -> 1L, "bmln" -> 1L,
    // rt_bloom/obs: grand aggregates over the (empty) join / scan —
    // one row of zero-counts is the correct report, same as above
    "rblm" -> 1L, "obs" -> 1L,
    // one gate row per candidate stage: 0 candidates of 0 pairs, subq
    // vacuously TRUE — the work-metric report must not vanish
    "cwork" -> 4L)

  test("every registered query runs on empty tables and yields zero rows") {
    DedupOps.clearCaches(spark) // don't serve another suite's substrate
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, emptyDir).count()
        if (n != fixedShape.getOrElse(name, 0L))
          Some(s"$name: $n rows from empty input") else None
      } catch { case e: Throwable =>
        Some(s"$name: threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)}") }
    }
    DedupOps.clearCaches(spark) // don't leak the empty substrate to other suites
    assert(bad.isEmpty, s"queries misbehaving on empty input:\n${bad.mkString("\n")}")
  }

  test("profiler and DQ suite report zeros (not nothing) on empty input") {
    val prof = QualityOps.profileTable(spark, emptyDir).collect()
    assert(prof.length === 6)
    prof.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
    }
    val dq = QualityOps.dqChecks(spark, emptyDir).collect()
    assert(dq.length === 7)
    dq.foreach(r => assert(r.getLong(1) === 0L, s"${r.getString(0)} nonzero on empty"))
    // approx profiler: zero estimates vs zero exacts — the 5% gate
    // must hold trivially (0 <= 0), not NaN/flake
    val pa = QualityOps.profileApprox(spark, emptyDir).collect()
    assert(pa.length === 6)
    pa.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(3) === 0L)
      assert(r.getBoolean(4), s"${r.getString(0)} acd gate false on empty")
    }
  }
}
