package graft.operators

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry for the operators' internal persisted frames (dedup
  * substrates, candidate sets, pre-sort results). Spark's CacheManager
  * holds persisted frames until spark.stop(), so a long-lived session
  * repeatedly calling the dedup/ANN operators would otherwise
  * accumulate cache entries without bound; `clear` (or
  * DedupOps.clearCaches, which also drops its memo) releases them.
  */
private[operators] object OpCaches {

  private val caches =
    scala.collection.concurrent.TrieMap.empty[SparkSession, ListBuffer[DataFrame]]

  /** Persist `df` (memory+disk) and remember it for `clear`. */
  def track(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val buf = caches.getOrElseUpdate(p.sparkSession, ListBuffer.empty)
    buf.synchronized { buf += p }
    p
  }

  /** Unpersist every tracked frame for `spark`. */
  def clear(spark: SparkSession): Unit =
    caches.remove(spark).foreach(_.foreach(_.unpersist(blocking = false)))
}
