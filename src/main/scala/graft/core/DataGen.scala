package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic data generator (S13 — scripts/seed_data.py:28-155's
  * 10k-users-with-weighted-segments generator, Spark-native): spark.range →
  * pure column expressions over rand(seed), no driver-side loops, no UDFs.
  * Deterministic for a fixed (seed, partition count); used by tests and as
  * the load-generator face of the engine (the corpus itself comes from the
  * driver and is never regenerated).
  */
object DataGen {

  /** Weighted-choice ladder (seed_data.py:46-58's segment distribution):
    * premium 20% / regular 60% / new 20%. */
  def users(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n)
      // bind the uniform draw ONCE: two rand(seed) expressions inside a
      // lazily-evaluated CASE are independent streams that desynchronize on
      // the non-first branches, skewing the ladder's probabilities
      .withColumn("__r", rand(seed))
      .select(
        col("id").as("user_id"),
        (lit(18) + pmod(col("id"), lit(60))).cast("int").as("age"),
        when(col("__r") < 0.2, "premium")
          .when(col("__r") < 0.8, "regular")
          .otherwise("new").as("segment"),
        (rand(seed + 1) < 0.85).as("account_verified"),
        expr("uuid()").as("registration_token")) // F16: uuid per row

  /** Orders: ~perOrders per user, lognormal-ish amounts, weighted status
    * (seed_data.py:88-136). */
  def orders(spark: SparkSession, nUsers: Long, perUser: Int,
             seed: Long = 42L): DataFrame =
    spark.range(nUsers * perUser)
      .withColumn("__r", rand(seed + 2)) // single bound draw (see users)
      .select(
        col("id").as("order_id"),
        pmod(col("id"), lit(nUsers)).as("user_id"),
        round(exp(randn(seed) * 0.8 + 4.0), 2).as("amount"),
        when(col("__r") < 0.8, "completed")
          .when(col("__r") < 0.95, "pending")
          .otherwise("declined").as("status"),
        expr(s"timestampadd(SECOND, CAST(rand(${seed + 3}) * 86400 * 30 AS INT), " +
          "timestamp'2024-01-01 00:00:00')").as("created_at"))
}
