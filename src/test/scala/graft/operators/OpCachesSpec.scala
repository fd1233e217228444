package graft.operators

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle tests for the operators' internal cache registry: the
  * substrate memo must be race-safe (one materialization under
  * concurrent first callers), and releasing per-call transients must
  * keep the pinned substrate cached while actually unpersisting the
  * per-call intermediates.
  */
class OpCachesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("opcaches-spec", "4")
  val sf = "/root/testdata/sf0.001"

  test("concurrent first callers agree on one substrate instance") {
    DedupOps.clearCaches(spark)
    val threads = 8
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(threads)
    val results = new Array[DataFrame](threads)
    try {
      val futures = (0 until threads).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            results(i) = DedupOps.shingleRowsCached(spark, sf)
          }
        })
      }
      start.countDown()
      futures.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(results.forall(_ ne null))
    // every caller got the single winning frame — no thread kept a
    // private copy that would later double-materialize
    assert(results.forall(_ eq results(0)),
      "racing callers received distinct substrate frames")
    // exactly one pinned registration happened
    assert(OpCaches.trackedCount(spark) === 1)
    assert(results(0).storageLevel !== StorageLevel.NONE)
  }

  test("releaseTransients drops per-call frames but keeps the substrate") {
    DedupOps.clearCaches(spark)
    val substrate = DedupOps.shingleRowsCached(spark, sf)
    val afterSubstrate = OpCaches.trackedCount(spark)
    assert(afterSubstrate === 1)
    // a dedup query tracks per-call transients (candidate set + pre-sort
    // result) on top of the substrate
    DedupOps.dedupNgramJaccard(spark, sf).write.format("noop")
      .mode("overwrite").save()
    val afterQuery = OpCaches.trackedCount(spark)
    assert(afterQuery > afterSubstrate, "query registered no transients")
    DedupOps.releaseTransients(spark)
    assert(OpCaches.trackedCount(spark) === 1,
      "transients survived releaseTransients")
    // the pinned substrate is still cached and still the memoized one
    assert(substrate.storageLevel !== StorageLevel.NONE)
    assert(DedupOps.shingleRowsCached(spark, sf) eq substrate)
    // repeated query + release cycles do not grow the registry — the
    // long-lived-session leak the ADVICE flagged
    DedupOps.dedupNgramJaccard(spark, sf).write.format("noop")
      .mode("overwrite").save()
    DedupOps.releaseTransients(spark)
    assert(OpCaches.trackedCount(spark) === 1)
  }

  test("track() leaves already-cached frames alone (pinned-twin protection)") {
    DedupOps.clearCaches(spark)
    // a PINNED stage frame handed to a consumer that defensively
    // track()s its input: the track must be a no-op, or the next
    // releaseTransients would unpersist the pinned twin (CacheManager
    // keys by canonicalized plan — "two" registrations are one entry)
    val pinned = DedupOps.minhashCandidates(spark, sf)
    pinned.write.format("noop").mode("overwrite").save()
    assert(pinned.storageLevel !== StorageLevel.NONE)
    val before = OpCaches.trackedCount(spark)
    val tracked = OpCaches.track(pinned)
    assert(tracked eq pinned, "track() wrapped an already-cached frame")
    assert(OpCaches.trackedCount(spark) === before,
      "track() re-registered an already-cached frame")
    DedupOps.releaseTransients(spark)
    assert(pinned.storageLevel !== StorageLevel.NONE,
      "releaseTransients unpersisted the pinned twin")
    DedupOps.clearCaches(spark)
  }

  test("clearCaches releases everything including the pinned substrate") {
    DedupOps.clearCaches(spark)
    val substrate = DedupOps.shingleRowsCached(spark, sf)
    assert(substrate.storageLevel !== StorageLevel.NONE)
    DedupOps.clearCaches(spark)
    assert(OpCaches.trackedCount(spark) === 0)
    assert(substrate.storageLevel === StorageLevel.NONE)
    // the memo was dropped too: next call re-registers (fresh instance)
    val again = DedupOps.shingleRowsCached(spark, sf)
    assert(again ne substrate)
    assert(OpCaches.trackedCount(spark) === 1)
    DedupOps.clearCaches(spark)
  }

  test("clear()/add() cycles reuse the one cleanup listener") {
    // clear() empties the frame registry but must NOT forget that the
    // session's listener exists — or every cycle in a long-lived
    // session stacks another listener holding a session reference.
    DedupOps.clearCaches(spark)
    for (_ <- 1 to 3) {
      DedupOps.shingleRowsCached(spark, sf)
      assert(OpCaches.hasListener(spark), "listener record lost")
      DedupOps.clearCaches(spark)
      assert(OpCaches.hasListener(spark),
        "clear() must not drop the listener record (re-add would stack a new listener)")
    }
  }
}
