package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.FeatureViewJob
import graft.core.Tables

/** Lookup/export query shapes of the serving + migration layers.
  *
  * Point and batch lookups (S2/S3 — src/feature_store/database.py:53-134)
  * are predicate probes against the wide feature view: an `isin` filter
  * compiles to a parquet pushdown, and for large probe sets Spark flips to a
  * broadcast semi-join — either way no driver-side chunking loop (the
  * reference's 100-per-chunk pagination, database.py:120-134, is an asyncpg
  * artifact Spark doesn't need).
  */
object Lookups {

  /** PK point lookup over the feature view (S2/P2). */
  def pointLookup(spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame =
    FeatureViewJob(spark, dir).filter(col("user_id").isin(ids: _*))

  /** Batch lookup, ≤100 ids per the reference's API cap (S3/models.py:84-89).
    * The id list arrives as a literal set — `WHERE user_id = ANY($1)`. */
  def batchLookup(spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame = {
    require(ids.size <= 100, "batch lookups are capped at 100 ids (models.py:84-89)")
    FeatureViewJob(spark, dir).filter(col("user_id").isin(ids: _*))
  }

  /** Deterministic ordered export (O1 — sql/migration_queries.sql:59-104's
    * ORDER BY user_id projections), with an explicit projection list so
    * column pruning reaches the scan. */
  def orderedExport(spark: SparkSession, dir: String, limit: Int = 1000): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
      .limit(limit)

  /** Percentile profile per status group (O4 — the reference computes p95
    * client-side over sorted latencies, scripts/benchmark.py:101; here it is
    * a distributed exact percentile). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50_amount"),
        round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95_amount"),
        count(lit(1)).as("n"))
}
