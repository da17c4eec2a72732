package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Synthetic near-dup corpus with KNOWN duplicate structure: documents
    * come in clusters of `clusterSize`, each member sharing all but one of
    * `tokens` md5-derived words with its cluster (distinct token at
    * position variant % tokens). Cluster count scales with `n` while
    * cluster SIZE stays fixed — the corpus shape under which a scale-safe
    * candidate generator must produce O(n) pairs (quadratic blowup shows
    * up immediately as O(n²/clusters)). Pure column expressions, fully
    * deterministic (md5, no rand), so counts are exactly reproducible. */
  def nearDupCorpus(spark: SparkSession, n: Long, clusterSize: Int = 5,
                    tokens: Int = 12): DataFrame = {
    val cl = floor(col("id") / clusterSize).cast("long").cast("string")
    val variant = pmod(col("id"), lit(clusterSize.toLong))
    val words = (0 until tokens).map { k =>
      when(pmod(variant, lit(tokens.toLong)) === k,
        substring(md5(concat(cl, lit(s"|$k|v"), variant.cast("string"))), 1, 8))
        .otherwise(substring(md5(concat(cl, lit(s"|$k"))), 1, 8))
    }
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
  }

  /** Clustered embedding corpus, same shape as nearDupCorpus: per-cluster
    * base vector (md5-derived uniforms in [-0.5, 0.5]) plus a ±0.5%
    * per-member perturbation — members sit at cosine ≥ 0.99 of each other,
    * distinct clusters are near-orthogonal in 64-dim. */
  def clusteredVectors(spark: SparkSession, n: Long, clusterSize: Int = 5,
                       dim: Int = 64): DataFrame = {
    val cl = floor(col("id") / clusterSize).cast("long").cast("string")
    val variant = pmod(col("id"), lit(clusterSize.toLong)).cast("string")
    def u(key: Column) = // md5 hex → uniform in [-0.5, 0.5]
      conv(substring(md5(key), 1, 4), 16, 10).cast("double") / 65535.0 - 0.5
    val vec = transform(sequence(lit(1), lit(dim)), i =>
      u(concat(cl, lit("|"), i.cast("string"))) +
        u(concat(cl, lit("|"), variant, lit("|"), i.cast("string"))) * 0.01)
      .cast("array<float>")
    spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

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
