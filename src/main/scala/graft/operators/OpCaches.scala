package graft.operators

import scala.collection.mutable.ListBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry for the operators' internal persisted frames, in two
  * tiers:
  *
  *  - PINNED: the memoized dedup substrate — shared across queries in
  *    a session, released only by `clear` (DedupOps.clearCaches);
  *  - TRANSIENT: per-call intermediates (candidate sets, pre-sort
  *    results). They must stay cached while the single query that
  *    created them materializes (they feed several joins inside it),
  *    but are dead weight afterwards — `clearTransients`
  *    (DedupOps.releaseTransients) unpersists them without touching
  *    the substrate, so a long-lived session repeatedly calling the
  *    dedup/ANN operators does not grow the block-manager cache per
  *    call.
  *
  * Registration is race-safe (putIfAbsent, no lost frames under
  * concurrent first callers), and the registry drops its strong
  * references to a session's frames when that session's SparkContext
  * ends, so stopped sessions are never pinned by this map.
  */
private[operators] object OpCaches {

  private sealed trait Entry { def pinned: Boolean; def release(): Unit }
  private final case class FrameEntry(df: DataFrame, pinned: Boolean) extends Entry {
    def release(): Unit = df.unpersist(blocking = false)
  }
  private final case class RddEntry(rdd: org.apache.spark.rdd.RDD[_],
      var pinned: Boolean = false) extends Entry {
    def release(): Unit = rdd.unpersist(blocking = false)
  }

  private val caches =
    scala.collection.concurrent.TrieMap.empty[SparkSession, ListBuffer[Entry]]

  /** Sessions whose context already carries our cleanup listener.
    * Deliberately NOT cleared by `clear`: `clear` only empties the
    * frame registry, so a later `add` for the same session must not
    * register a second listener — repeated clearCaches cycles in a
    * long-lived session would otherwise accumulate listeners on the
    * bus, each pinning the session. Entries leave this set only when
    * the application ends (the listener removes its own session).
    */
  private val listenerInstalled =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Unit]

  /** Persist `df` (memory+disk) as a per-call TRANSIENT frame.
    * A frame that is ALREADY cached (e.g. a pinned stage memo handed
    * to a consumer that defensively tracks its input) is returned
    * untouched: re-registering it as transient would let
    * clearTransients unpersist the pinned twin — Spark's CacheManager
    * keys entries by canonicalized plan, so the "two" registrations
    * are one cache entry.
    */
  def track(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df else add(df, pinned = false)

  /** Eagerly localCheckpoint `df` and register the materialized RDD
    * blocks as TRANSIENT. Iterative operators need checkpoints (plain
    * persist does not reliably survive the analyzer's self-join
    * rewrites — the upstream pipeline silently re-ran every round),
    * but checkpoint blocks are NOT managed by the cache manager:
    * without this registration they linger until the context cleaner
    * GCs them, and a bench sweep's accumulated blocks measurably
    * slowed every query that ran after the iterative ones
    * (winsorize 0.35 s → 1.3 s at sf0.1). The frame is dead
    * after its query materializes — clearTransients frees the blocks.
    */
  def localCheckpointTracked(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    val cp = df.localCheckpoint()
    val rdds = cp.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
    val session = cp.sparkSession
    val buf = bufferFor(session)
    buf.synchronized { rdds.foreach(r => buf += RddEntry(r)) }
    cp
  }

  /** Persist `df` (memory+disk) as a PINNED frame (survives
    * `clearTransients`; released by `clear`).
    */
  def trackPinned(df: DataFrame): DataFrame = add(df, pinned = true)

  /** Race-safe memoize-then-pin: the frame is registered via
    * putIfAbsent BEFORE it is persisted, so two concurrent first
    * callers agree on one winner and the loser's frame is discarded
    * un-persisted (unpersisting it would be WRONG: Spark's
    * CacheManager keys entries by canonicalized plan, so unpersisting
    * a same-plan twin would drop the winner's cache too). If persist
    * itself throws, the memo entry is removed so the failure is not
    * cached. Shared by every pinned substrate (shingles, grams).
    */
  def memoPinned[K](cache: scala.collection.concurrent.TrieMap[K, DataFrame],
                    key: K)(build: => DataFrame): DataFrame =
    cache.get(key) match {
      case Some(df) => df
      case None =>
        val fresh = build
        cache.putIfAbsent(key, fresh) match {
          case Some(winner) => winner
          case None =>
            try {
              val pinned = trackPinned(fresh)
              // PROMOTE the transient checkpoint RDDs in the pinned
              // frame's lineage: iterative stage builds (Lloyd, label
              // propagation, BPE training) bottom out in TRANSIENT
              // localCheckpoint blocks, and a stage that is constructed
              // (its driver loop runs at construction) but not yet
              // cache-materialized when clearTransients frees those
              // blocks fails later with
              // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the construction/
              // materialization gap consumers-of-stages widened in
              // r19. Only the FINAL round's checkpoint survives in the
              // lineage (each round truncates the previous), so the
              // promoted blocks are the small converged frames, freed
              // with the stage by clear().
              import org.apache.spark.sql.execution.LogicalRDD
              val deps = pinned.queryExecution.analyzed
                .collect { case l: LogicalRDD => l.rdd.id }.toSet
              if (deps.nonEmpty) {
                val buf = bufferFor(pinned.sparkSession)
                buf.synchronized {
                  buf.foreach {
                    case r: RddEntry if deps.contains(r.rdd.id) => r.pinned = true
                    case _ => ()
                  }
                }
              }
              pinned
            }
            catch {
              case e: Throwable => cache.remove(key, fresh); throw e
            }
        }
    }

  private def add(df: DataFrame, pinned: Boolean): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val buf = bufferFor(p.sparkSession)
    buf.synchronized { buf += FrameEntry(p, pinned) }
    p
  }

  private def bufferFor(session: SparkSession): ListBuffer[Entry] = {
    caches.get(session) match {
      case Some(existing) => existing
      case None =>
        val fresh = ListBuffer.empty[Entry]
        caches.putIfAbsent(session, fresh) match {
          case Some(winner) => winner
          case None =>
            // Release the registry's strong refs when the context ends,
            // even if the caller never invokes clearCaches. Guarded by
            // listenerInstalled so a clear()-then-add() cycle reuses the
            // existing listener instead of stacking a new one per cycle.
            if (listenerInstalled.putIfAbsent(session, ()).isEmpty) {
              session.sparkContext.addSparkListener(new SparkListener {
                override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
                  caches.remove(session)
                  listenerInstalled.remove(session)
                }
              })
            }
            fresh
        }
    }
  }

  /** Unpersist every TRANSIENT frame for `spark`, keeping pinned
    * substrates cached. Call after a query's result has materialized.
    */
  def clearTransients(spark: SparkSession): Unit =
    caches.get(spark).foreach { buf =>
      buf.synchronized {
        val (keep, drop) = buf.partition(_.pinned)
        drop.foreach(_.release())
        buf.clear()
        buf ++= keep
      }
    }

  /** Unpersist every tracked frame for `spark` (pinned included). */
  def clear(spark: SparkSession): Unit =
    caches.remove(spark).foreach { buf =>
      buf.synchronized(buf.foreach(_.release()))
    }

  /** Test hook: number of tracked frames for `spark`. */
  private[operators] def trackedCount(spark: SparkSession): Int =
    caches.get(spark).map(b => b.synchronized(b.size)).getOrElse(0)

  /** Test hook: whether `spark` has (exactly) its one cleanup
    * listener installed — the guard clear()/add() cycles must not
    * defeat.
    */
  private[operators] def hasListener(spark: SparkSession): Boolean =
    listenerInstalled.contains(spark)
}
