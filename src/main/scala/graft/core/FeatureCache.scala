package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache of computed feature tables — the engine-side
  * analogue of the reference's Redis cache-aside tier (cache.py:85-165):
  * feature tables are computed once per (session, corpus) and served from
  * Spark block storage until invalidated. Downstream consumers (the wide
  * view, lookups, validation jobs) share the cached plan instead of
  * recomputing the aggregation chain per query.
  */
object FeatureCache {

  private val memo = TrieMap.empty[(Int, String, String), DataFrame]

  def cached(spark: SparkSession, dir: String, name: String)
            (build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((System.identityHashCode(spark), dir, name),
      build.persist(StorageLevel.MEMORY_AND_DISK))

  /** Invalidate (TTL expiry / upstream change): unpersist + forget. */
  def invalidate(spark: SparkSession, dir: String, name: String): Unit =
    memo.remove((System.identityHashCode(spark), dir, name)).foreach(_.unpersist())
}
