package graft

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.jobs._

/** Feature-job goldens over the FIXTURES.md §A archetypes: new user (all
  * COALESCE defaults), high-value user (precision path), and the windowing/
  * active-set semantics of sql/transaction_features.sql. */
class FeatureJobsSpec extends SparkSpec {
  import spark.implicits._

  private val asOf = Instant.parse("2024-02-01T00:00:00Z")

  // (order_id, user_id, merchant_id, amount, status, payment_method, created_at)
  private def tx(rows: (Long, Long, Long, Double, String, String, String)*) =
    rows.toDF("order_id", "user_id", "merchant_id", "amount", "status", "payment_method", "created_at")
      .withColumn("created_at", to_timestamp($"created_at"))

  private def users(rows: (Long, Boolean)*) =
    rows.toDF("user_id", "recently_updated")
      .select($"user_id", lit(30).as("age"), lit("AE").as("location_country"),
        lit("CITY").as("location_city"), lit(true).as("account_verified"),
        $"recently_updated")

  test("transaction features: edge_case_new_user gets all DDL defaults") {
    val t = tx((1L, 99L, 1L, 50.0, "O", "1-URGENT", "2024-01-20 00:00:00"))
    val u = users((7L, true)) // user 7: recently updated, zero orders
    val out = TransactionFeaturesJob.compute(t, u, asOf)
      .filter($"user_id" === 7L).collect()(0)
    assert(out.getAs[Long]("total_transactions_30d") == 0L)
    assert(out.getAs[Double]("total_amount_30d") == 0.0)
    assert(out.getAs[Double]("weekend_transaction_ratio") == 0.0)
  }

  test("transaction features: 31d scan buffer vs 30d window (S1)") {
    val t = tx(
      (1L, 1L, 1L, 100.0, "O", "1-URGENT", "2024-01-01 12:00:00"), // 30.5d back: in scan, out of window
      (2L, 1L, 2L, 200.0, "O", "1-URGENT", "2024-01-20 00:00:00")) // in window
    val out = TransactionFeaturesJob.compute(t, users(), asOf)
      .filter($"user_id" === 1L).collect()(0)
    assert(out.getAs[Long]("total_transactions_30d") == 1L)
    assert(out.getAs[Double]("total_amount_30d") == 200.0)
  }

  test("transaction features: declined count and weekend ratio semantics") {
    val t = tx(
      (1L, 1L, 1L, 100.0, "F", "1-URGENT", "2024-01-20 00:00:00"), // Saturday, declined
      (2L, 1L, 2L, 200.0, "O", "1-URGENT", "2024-01-22 00:00:00")) // Monday
    val out = TransactionFeaturesJob.compute(t, users(), asOf)
      .filter($"user_id" === 1L).collect()(0)
    assert(out.getAs[Long]("transactions_declined_30d") == 1L)
    assert(out.getAs[Double]("weekend_transaction_ratio") == 0.5)
    assert(out.getAs[Long]("unique_merchants_30d") == 2L)
  }

  test("user features: high-value archetype keeps decimal precision; mode is deterministic") {
    val rows = (1L to 500L).map(i =>
      (i, 42L, 1L, 2500.0, "O", if (i % 2 == 0) "bnpl" else "card", "2024-01-10 00:00:00"))
    val out = UserFeaturesJob.compute(tx(rows: _*), users((42L, true)), asOf)
      .filter($"user_id" === 42L).collect()(0)
    assert(out.getAs[Long]("total_orders") == 500L)
    assert(out.getAs[Double]("avg_order_value") == 2500.0)
    // 250/250 tie between bnpl and card → smallest value wins
    assert(out.getAs[String]("preferred_payment_method") == "bnpl")
    assert(out.getAs[Int]("days_since_first_order") == 22)
  }

  test("feature view: risk bucketing CASE thresholds (F2)") {
    val fv = FeatureViewJob(spark, sf0001)
    val cats = fv.select("risk_score", "risk_category").collect()
    cats.foreach { r =>
      val s = r.getDouble(0); val c = r.getString(1)
      val expect = if (s <= 0.3) "Low" else if (s <= 0.7) "Medium" else "High"
      assert(c == expect, s"risk_score=$s bucketed as $c")
    }
  }

  test("risk features: aggregate-then-join shape produces no fan-out (J4 trap)") {
    val rf = RiskFeaturesJob(spark, sf0001)
    val n = rf.count()
    assert(rf.select("user_id").distinct().count() == n, "one row per user — no cross-multiplication")
  }
}
