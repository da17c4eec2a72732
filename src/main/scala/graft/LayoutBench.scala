package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.{AsOf, Roles}
import graft.jobs.{FeatureViewJob, RiskFeaturesJob, TransactionFeaturesJob, UserFeaturesJob}

/** Dev measurement main: the cold point-lookup story of the clustered
  * layout (VERDICT r11 missing #5 / next #3). Three serving postures for
  * the same S2 probe, with task-metric records beside each time — records
  * are the number that transfers to 100 TB (local wall-clock is page-cache
  * flattered; rows READ are not):
  *
  *   - cold_flat: no cache tier, no layout — the full feature-view
  *     compute (3 jobs over the base tables) filtered to the key: what a
  *     cold lookup costs today without BucketedLayout;
  *   - cold_clustered: no cache tier, bucketed+sorted table — bucket
  *     pruning opens 1/n of the files, row-group stats prune inside;
  *   - warm_cached: the FeatureCache steady state (the reference's Redis
  *     analog) — the number Bench's point_lookup reports.
  *
  * The one-off layout build cost is reported alongside (it amortizes over
  * every subsequent cold probe — the same trade the reference makes by
  * CLUSTERing its feature tables). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.LayoutBench"
  */
object LayoutBench {

  private def viewUncached(spark: SparkSession, dir: String): DataFrame =
    FeatureViewJob.compute(
      UserFeaturesJob.compute(
        Roles.transactions(spark, dir), Roles.users(spark, dir), AsOf.orders),
      TransactionFeaturesJob.compute(
        Roles.transactions(spark, dir), Roles.users(spark, dir), AsOf.orders),
      RiskFeaturesJob.compute(
        Roles.payments(spark, dir), Roles.userLogins(spark, dir),
        Roles.velocityAlerts(spark, dir), Roles.creditReports(spark, dir),
        Roles.riskScores(spark, dir), Roles.users(spark, dir),
        AsOf.lineitem, AsOf.events))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    val sm = core.StageMetrics.attach(spark)

    def timedRecs(body: => Unit): (Double, Long) = {
      var dt = 0.0
      val recs = sm.measure {
        val t0 = System.nanoTime(); body
        dt = (System.nanoTime() - t0) / 1e9
      }.inputRecords
      (dt, recs)
    }
    def median3(f: Long => (Double, Long), ids: Seq[Long]): (Double, Long) = {
      val rs = ids.map(f)
      (rs.map(_._1).sorted.apply(1), rs.map(_._2).max)
    }

    // one-off layout build (forces the table write; FeatureCache warm
    // rides along exactly once, like any daily-batch publish would)
    val t0 = System.nanoTime()
    sinks.BucketedLayout.featureViewClustered(spark, sfDir).count()
    val buildS = (System.nanoTime() - t0) / 1e9

    // present keys, spread across buckets
    val ids = sinks.BucketedLayout.featureViewClustered(spark, sfDir)
      .select(col("user_id")).orderBy(col("user_id")).limit(50)
      .collect().map(_.getLong(0))
    val probeIds = Seq(ids(0), ids(ids.length / 2), ids(ids.length - 1))

    // JIT/codegen warm (one probe each flavor), then timed per-id
    sinks.BucketedLayout.pointLookupClustered(spark, sfDir, Seq(probeIds.head)).count()
    serving.Lookups.pointLookup(spark, sfDir, Seq(probeIds.head)).count()

    val (clS, clR) = median3(id => timedRecs(
      sinks.BucketedLayout.pointLookupClustered(spark, sfDir, Seq(id)).count(): Unit),
      probeIds)
    val (waS, waR) = median3(id => timedRecs(
      serving.Lookups.pointLookup(spark, sfDir, Seq(id)).count(): Unit),
      probeIds)

    // flat-cold LAST, behind clearCache(): CacheManager substitutes any
    // logical subtree matching a persisted plan, so with the feature
    // cache alive the "uncached" compute silently reads InMemoryRelations
    // (records ≈ 0 — caught by this bench's own records column on its
    // first run). One post-clear warm run re-JITs the now-different
    // (scan-backed) plan; viewUncached never persists, so every timed
    // probe re-reads the base tables — the genuine cold posture.
    spark.catalog.clearCache()
    viewUncached(spark, sfDir).filter(col("user_id") === probeIds.head).count()
    val (flS, flR) = median3(id => timedRecs(
      viewUncached(spark, sfDir).filter(col("user_id") === id).count(): Unit),
      probeIds)

    def f(d: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    println(s"""{"metric":"layout_lookup","sf":"$sfDir","build_s":${f(buildS)},""" +
      s""""cold_clustered_s":${f(clS)},"cold_clustered_records":$clR,""" +
      s""""cold_flat_s":${f(flS)},"cold_flat_records":$flR,""" +
      s""""warm_cached_s":${f(waS)},"warm_cached_records":$waR}""")
    spark.stop()
  }
}
