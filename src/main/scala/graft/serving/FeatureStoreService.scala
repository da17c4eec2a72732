package graft.serving

import java.time.Instant

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
  * The cache tier is Spark's: the three feature tables are `.cache()`d
  * DataFrames (the Redis stand-in), refreshed by `invalidate`. Lookups stay
  * declarative (isin-filter → pushdown/broadcast); collection happens only
  * at the API boundary, per looked-up id — never a full-table collect.
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

  /** Batch lookup (store.py:80-141): one fused probe — the (≤100-row) id
    * frame left-joins each requested group's isin-filtered, struct-packed
    * rows, so the whole batch costs a single collect job regardless of how
    * many groups were requested. */
  def getBatch(userIds: Seq[Long], types: Seq[String], now: Instant): Seq[FeatureResult] = {
    require(userIds.size <= 100, "batch size cap is 100 (models.py:84-89)")
    val wanted = normalizeTypes(types)
    import spark.implicits._
    val ids = userIds.distinct.toDF("user_id")
    val fused = wanted.foldLeft(ids) { (acc, g) =>
      acc.join(
        cache(g).filter(col("user_id").isin(userIds: _*))
          .select(col("user_id"), struct(col("*")).as(s"__$g")),
        Seq("user_id"), "left")
    }
    val byId: Map[Long, Row] =
      fused.collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    userIds.map { id =>
      val probed = byId(id)
      val found = wanted.flatMap(g =>
        Option(probed.getAs[Row](s"__$g")).map(g -> _)).toMap
      val hit = found.size == wanted.size // all-types hit rule (store.py:174-175)
      val freshness = Option(found.values.map(r =>
        r.getAs[java.sql.Timestamp]("updated_at").getTime).toSeq)
        .filter(_.nonEmpty)
        .map(ts => (now.toEpochMilli - ts.min) / 60000L) // oldest group (store.py:195-198)
      FeatureResult(id, found, hit, freshness)
    }
  }

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

  /** Cache invalidation (the streaming pipeline's ST3 target): drop and
    * recompute the named groups — the Spark analogue of Redis DELETE +
    * recompute-on-next-read (cache.py:167-196). */
  def invalidate(groups: Seq[String] = featureGroups): Unit = synchronized {
    normalizeTypes(groups).foreach { g =>
      cache(g).unpersist()
      cache = cache.updated(g, computeGroup(g))
    }
    countsMemo = None
  }
}
