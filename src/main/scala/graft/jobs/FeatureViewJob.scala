package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical one-row-per-user wide serving view — spec
  * sql/migration_queries.sql:143-166 and the user_risk_summary view
  * (sql/bigquery_schema.sql:75-94): user_features LEFT JOIN
  * transaction_features LEFT JOIN risk_features on user_id (J7), plus the
  * Low/Medium/High risk bucketing CASE (F2, sql/bigquery_schema.sql:86-89).
  *
  * Scale: all three inputs are already one-row-per-user aggregates hashed on
  * user_id; the 3-way join re-uses that partitioning (no fan-out possible —
  * each side is unique on the key). This is the table the serving layer
  * caches; at 100 TB it would be written bucketed by user_id so point lookups
  * prune to a single bucket.
  */
object FeatureViewJob {

  /** Session-cached like its three inputs: every serving query (point/batch
    * lookups, bundles) probes this view, and without the cache each probe
    * re-plans and re-joins the 3-way tree it sits on. */
  def apply(spark: SparkSession, dir: String): DataFrame =
    graft.core.FeatureCache.cached(spark, dir, "feature_view")(
      compute(
        UserFeaturesJob(spark, dir),
        TransactionFeaturesJob(spark, dir),
        RiskFeaturesJob(spark, dir)))

  /** Dynamic join assembly (J8 — docs/ADVANCED.md:321-391's per-request
    * query builder): only the requested feature groups are joined; Catalyst
    * prunes and plans the reduced tree, replacing the reference's manual
    * materialized-view-vs-inline heuristic. */
  def assemble(spark: SparkSession, dir: String, groups: Set[String]): DataFrame = {
    require(groups.nonEmpty && groups.subsetOf(Set("user", "transaction", "risk")))
    val parts = Seq(
      "user"        -> (() => UserFeaturesJob(spark, dir)),
      "transaction" -> (() => TransactionFeaturesJob(spark, dir)
        .drop("created_at", "updated_at")),
      "risk"        -> (() => RiskFeaturesJob(spark, dir)
        .drop("created_at", "updated_at")))
    parts.collect { case (g, build) if groups(g) => build() }
      .reduce(_.join(_, Seq("user_id"), "left"))
  }

  def compute(uf: DataFrame, tf: DataFrame, rf: DataFrame): DataFrame =
    uf.select("user_id", "age", "location_country", "total_orders", "avg_order_value",
        "days_since_first_order", "preferred_payment_method", "account_verified")
      .join(tf.select("user_id", "total_transactions_30d", "total_amount_30d",
        "avg_transaction_amount", "transactions_declined_30d",
        "weekend_transaction_ratio"), Seq("user_id"), "left")
      .join(rf.select("user_id", "risk_score", "credit_utilization_ratio",
        "payment_delays_30d", "velocity_alerts_30d"), Seq("user_id"), "left")
      // NULL risk_score (no risk row for the user) falls to the ELSE branch
      // and is labeled High — deliberately mirroring the reference view's
      // CASE (sql/bigquery_schema.sql:86-89), which has the same fail-unsafe
      // default; in the canonical pipeline rf's active set covers uf's base,
      // so the branch is unreachable there.
      .withColumn("risk_category",
        when(col("risk_score") <= 0.3, "Low")
          .when(col("risk_score") <= 0.7, "Medium")
          .otherwise("High"))
}
