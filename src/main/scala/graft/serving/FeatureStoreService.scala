package graft.serving

import java.time.Instant

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.{RiskFeaturesJob, TransactionFeaturesJob, UserFeaturesJob}

/** Point/batch feature serving with the reference's lookup semantics
  * (src/feature_store/store.py:43-141):
  *
  *   - requested feature types are deduplicated, order-preserving
  *     (models.py:71-77); unknown types are rejected (models.py:65-77);
  *   - a cache HIT requires ALL requested groups present for the user
  *     (store.py:49,174-175);
  *   - data_freshness_minutes is the age of the OLDEST group
  *     (store.py:189-201);
  *   - batch requests are capped at 100 (models.py:84-89) and served by ONE
  *     fused probe job — the id list left-joins every requested group's
  *     struct-packed rows in a single plan — not the reference's
  *     100-per-chunk sequential loop (database.py:120-134) nor one Spark
  *     job per group.
  *
  * TWO cache tiers, mirroring the reference's Redis-over-Postgres split:
  *
  *   1. the GROUP tier — the three feature tables as `.cache()`d
  *     DataFrames (the "database" a probe computes from), refreshed by
  *     `invalidate`;
  *   2. the per-user ROW tier — a driver-side (user, group) → row memo,
  *     the actual Redis analogue (cache.py:85-165: per-user keys, TTL,
  *     per-user DELETE). A request whose users are all memoized costs no
  *     Spark job at all — this is what makes point reads meet the
  *     reference's latency SLA (p95 < 40 ms, test_performance.py:72) —
  *     and `invalidateUser` evicts at the reference's granularity
  *     (cache.py:167-196) without touching anyone else's entries.
  *
  * Lookups stay declarative (isin-filter → pushdown/broadcast); collection
  * happens only at the API boundary, per looked-up id — never a full-table
  * collect. Negative results memoize too (an absent user probes once, not
  * per request); the row tier shares FeatureCache's TTL/clock so one knob
  * governs both tiers' expiry.
  */
class FeatureStoreService(spark: SparkSession, dir: String) {

  val featureGroups: Seq[String] = Seq("user", "transaction", "risk")

  private def computeGroup(g: String): DataFrame = (g match {
    case "user"        => UserFeaturesJob(spark, dir)
    case "transaction" => TransactionFeaturesJob(spark, dir)
    case "risk"        => RiskFeaturesJob(spark, dir)
  }).cache()

  @volatile private var cache: Map[String, DataFrame] =
    featureGroups.map(g => g -> computeGroup(g)).toMap

  /** Row tier: (userId, group) → (row-if-present, bornAtNanos). Bounded by
    * `rowTierMaxEntries` (evict expired first, then oldest — the Redis
    * maxmemory-LRU posture at driver scale). */
  private val rowMemo = TrieMap.empty[(Long, String), (Option[Row], Long)]

  /** Group-tier generation, bumped by `invalidate` under the service lock.
    * A probe snapshots it before collecting and memoizes ONLY if it is
    * unchanged (checked under the same lock): with concurrent dispatch, a
    * probe that raced an invalidation may have read the PRE-invalidation
    * tables, and inserting those rows after the row tier was cleared would
    * serve stale features until TTL — the probe's own response still
    * carries the old rows (indistinguishable from a request that completed
    * just before the invalidation), but nothing stale outlives it. */
  @volatile private var groupGeneration: Long = 0L

  /** Cap on row-tier entries — a driver holds the hot working set, never
    * the corpus (100k entries ≈ a few hundred MB worst case). */
  @volatile var rowTierMaxEntries: Int = 100000

  private def tierNow(): Long = graft.core.FeatureCache.clock()
  private def tierFresh(bornAt: Long): Boolean =
    tierNow() - bornAt < graft.core.FeatureCache.ttlNanos

  /** models.py:71-77 — dedup, preserve order, validate; at least one type
    * is required (an empty request would score as a vacuous cache hit and
    * inflate the hit-ratio envelope). */
  def normalizeTypes(types: Seq[String]): Seq[String] = {
    require(types.nonEmpty, "at least one feature type is required (models.py:65-77)")
    val bad = types.filterNot(featureGroups.contains)
    require(bad.isEmpty, s"invalid feature types: ${bad.mkString(",")}")
    types.distinct
  }

  case class FeatureResult(
    userId: Long,
    features: Map[String, Row],
    cacheHit: Boolean,
    freshnessMinutes: Option[Long])

  /** Single-user lookup (store.py:43-78). */
  def getFeatures(userId: Long, types: Seq[String], now: Instant): FeatureResult =
    getBatch(Seq(userId), types, now).head

  /** Batch lookup (store.py:80-141). Row-tier hits are served straight from
    * the memo; only ids with a missing/stale (user, group) entry go to the
    * ONE fused probe — the (≤100-row) id frame left-joins each requested
    * group's isin-filtered, struct-packed rows, so the whole miss set costs
    * a single collect job regardless of how many groups were requested. */
  def getBatch(userIds: Seq[Long], types: Seq[String], now: Instant): Seq[FeatureResult] = {
    require(userIds.size <= 100, "batch size cap is 100 (models.py:84-89)")
    val wanted = normalizeTypes(types)
    import spark.implicits._
    val distinctIds = userIds.distinct
    // ONE read per (id, group): the fresh entries are snapshotted at miss
    // detection, so a concurrent invalidate between here and assembly can't
    // make a previously-fresh user come back empty without a re-probe
    // (assembly re-reading the memo was exactly that race)
    val snap = scala.collection.mutable.Map.empty[(Long, String), Option[Row]]
    for (id <- distinctIds; g <- wanted)
      rowMemo.get((id, g)).foreach { case (v, born) =>
        if (tierFresh(born)) snap((id, g)) = v
      }
    val missIds = distinctIds.filter(id =>
      wanted.exists(g => !snap.contains((id, g))))
    val probed = scala.collection.mutable.Map.empty[(Long, String), Option[Row]]
    if (missIds.nonEmpty) {
      val gen0 = groupGeneration
      val ids = missIds.toDF("user_id")
      val fused = wanted.foldLeft(ids) { (acc, g) =>
        acc.join(
          cache(g).filter(col("user_id").isin(missIds: _*))
            .select(col("user_id"), struct(col("*")).as(s"__$g")),
          Seq("user_id"), "left")
      }
      val born = tierNow()
      fused.collect().foreach { r =>
        val id = r.getAs[Long]("user_id")
        wanted.foreach(g => probed((id, g)) = Option(r.getAs[Row](s"__$g")))
      }
      // memoize under the service lock so the generation check and the
      // puts are atomic w.r.t. invalidate's bump-then-clear
      synchronized {
        if (groupGeneration == gen0) {
          probed.foreach { case (k, v) => rowMemo.put(k, (v, born)) }
        }
      }
      pruneRowTier()
    }
    userIds.map { id =>
      val found = wanted.flatMap(g =>
        probed.get((id, g)).orElse(snap.get((id, g)))
          .flatten.map(g -> _)).toMap
      val hit = found.size == wanted.size // all-types hit rule (store.py:174-175)
      val freshness = Option(found.values.map(r =>
        r.getAs[java.sql.Timestamp]("updated_at").getTime).toSeq)
        .filter(_.nonEmpty)
        .map(ts => (now.toEpochMilli - ts.min) / 60000L) // oldest group (store.py:195-198)
      FeatureResult(id, found, hit, freshness)
    }
  }

  /** Keep the row tier bounded: expired entries first; if still over the
    * cap, the oldest entries go (an O(n log n) sweep — n is the cap, the
    * sweep runs only on overflow, and this is a driver-side map). */
  private def pruneRowTier(): Unit = {
    if (rowMemo.size > rowTierMaxEntries) {
      rowMemo.filterInPlace { case (_, (_, born)) => tierFresh(born) }
      val over = rowMemo.size - rowTierMaxEntries
      if (over > 0)
        rowMemo.toSeq.sortBy(_._2._2).take(over).foreach { case (k, _) => rowMemo.remove(k) }
    }
  }

  /** Liveness of the underlying engine session — the health probe's
    * "can this service still compute" check (a memoized count alone would
    * keep reporting healthy after the session died). */
  def alive: Boolean = !spark.sparkContext.isStopped

  /** Per-group cached row counts — the stats/health probe's view of the
    * cache tier (api.py:190-210's get_feature_store_stats analogue).
    * MEMOIZED: a load balancer polls health every few seconds, and three
    * count jobs per poll would serialize behind real lookups; the first
    * call pays (and materializes the caches), later calls are free until
    * `invalidate` clears the memo with the tables. */
  def groupCounts: Map[String, Long] = {
    countsMemo.getOrElse {
      val c = featureGroups.map(g => g -> cache(g).count()).toMap
      countsMemo = Some(c)
      c
    }
  }

  @volatile private var countsMemo: Option[Map[String, Long]] = None

  /** Batch response envelope stats — the reference's cache_hit_ratio
    * (store.py:112-141, models.py:109-116). */
  def batchSummary(results: Seq[FeatureResult]): (Int, Int, Double) = {
    val hits = results.count(_.cacheHit)
    (hits, results.size,
      if (results.isEmpty) 0.0 else hits.toDouble / results.size)
  }

  /** Per-user invalidation at the REFERENCE's granularity (cache.py:
    * 167-196: DELETE removes the user's Redis keys; the database is
    * untouched and the next read re-fetches). Here: drop the user's row-
    * tier entries; the group tables stay cached, so an unrelated user's
    * next read pays nothing. */
  def invalidateUser(userId: Long): Unit =
    featureGroups.foreach(g => rowMemo.remove((userId, g)))

  /** Group-tier invalidation (the streaming pipeline's ST3 target): drop
    * and recompute the named groups — the Spark analogue of a table-wide
    * refresh after an upstream batch lands. Row-tier entries derived from
    * the dropped tables go with them. */
  def invalidate(groups: Seq[String] = featureGroups): Unit = synchronized {
    groupGeneration += 1 // before the clear: see the generation scaladoc
    normalizeTypes(groups).foreach { g =>
      cache(g).unpersist()
      cache = cache.updated(g, computeGroup(g))
      rowMemo.filterInPlace { case ((_, grp), _) => grp != g }
    }
    countsMemo = None
  }
}
