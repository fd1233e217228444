package graft.operators

import org.apache.spark.sql.DataFrame

/** One-off profiler for `dedup_jaccard` — the repo's heaviest
  * query at sf1. Splits its cost into the three separable stages so
  * optimization effort lands where the time actually goes:
  *
  *   1. `_substrate`  — the shared shingle-row materialization
  *                      (memoized; amortized across the dedup family);
  *   2. `candidates`  — PPJoin prefix+length+positional filtered
  *                      candidate pairs (`ngramCandidates`);
  *   3. `verify`      — exact-Jaccard verification of those pairs,
  *                      derived as (full query − candidates) since the
  *                      full query re-runs candidate generation after
  *                      `releaseTransients`.
  *
  * Usage: runMain graft.operators.ProfileNgram [sfDir] [iters]
  * Prints one JSON line with per-stage medians and the candidate /
  * verified-pair counts.
  */
object ProfileNgram {

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime()
    fn
    (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.build("graft-profile-ngram")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val tSub = time(DedupOps.materializeSubstrate(spark, dir))
    val cand = (1 to iters).map { _ =>
      val t = time(noop(DedupOps.ngramCandidates(spark, dir)))
      DedupOps.releaseTransients(spark)
      t
    }
    val full = (1 to iters).map { _ =>
      val t = time(noop(DedupOps.dedupNgramJaccard(spark, dir)))
      DedupOps.releaseTransients(spark)
      t
    }
    val nCand = DedupOps.ngramCandidates(spark, dir).count()
    DedupOps.releaseTransients(spark)
    val nVerified = DedupOps.dedupNgramJaccard(spark, dir).count()
    DedupOps.releaseTransients(spark)
    val mc = median(cand)
    val mf = median(full)
    // Locale.ROOT, never the f-interpolator: a comma-decimal default
    // locale would print 3,266 and break the JSON consumer.
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"dir":"$dir","iters":$iters,"substrate":${d3(tSub)},"candidates":${d3(mc)},"full":${d3(mf)},"verify_derived":${d3(mf - mc)},"n_candidates":$nCand,"n_verified":$nVerified}""")
    spark.stop()
  }
}
