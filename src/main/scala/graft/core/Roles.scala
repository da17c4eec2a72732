package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Role-mapping: the reference's OLTP tables (sql/postgresql_schema.sql:8-122)
  * re-expressed over the driver's star schema (FIXTURES.md §C). Every derived
  * column is a deterministic pure function of source columns, so the DuckDB
  * oracle (graft.oracle.OracleSql) can reproduce it bit-for-bit.
  *
  * | reference table  | backing data                | key derivations |
  * |------------------|-----------------------------|-----------------|
  * | users            | customer ⋈ nation           | age = 18 + custkey % 60; verified = acctbal > 0; "recently updated" ≈ mktsegment = 'BUILDING' |
  * | orders (txns)    | orders                      | status O/P=completed-ish, F=declined; merchant_id = orderkey % 23; payment_method = orderpriority |
  * | payments         | lineitem ⋈ orders           | due = orderdate + 14d; paid = shipdate; failed = returnflag 'R' |
  * | user_logins      | events                      | device_id = props.k (JSON); ip = user_id '.' event_id % 17 |
  * | velocity_alerts  | events[event_type='error']  | alert_type = value ≥ 245 → 'velocity' else 'pattern' |
  * | credit_reports   | events[event_type='view']   | utilization = round(value/500, 4); report_date = ts |
  * | risk_scores      | events[event_type='purchase'] | risk_score = round(value/500, 4); computed_at = ts |
  *
  * Scale note: all fact-side roles keep their native partitioning; the only
  * join here (payments) is fact-to-fact on l_orderkey/o_orderkey, which at
  * 100 TB should be a co-partitioned sort-merge join — both sides bucketed by
  * order key at ingest. nation is a 25-row dim → always broadcast.
  */
object Roles {

  /** users: one row per customer. "Recently updated" (the reference's
    * `updated_at >= CURRENT_DATE - 1 day` activity filter,
    * sql/user_features.sql:25) has no timestamp analogue on customer, so the
    * deterministic stand-in is the BUILDING market segment (~20% of users). */
  def users(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey").as("user_id"),
        (lit(18) + col("c_custkey") % 60).cast("int").as("age"),
        col("n_name").as("location_country"),
        col("c_mktsegment").as("location_city"),
        (col("c_acctbal") > 0).as("account_verified"),
        (col("c_mktsegment") === "BUILDING").as("recently_updated"))

  /** orders-as-transactions: spec sql/postgresql_schema.sql:35-47 roles. */
  def transactions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("user_id"),
      (col("o_orderkey") % 23).as("merchant_id"),
      col("o_totalprice").as("amount"),
      col("o_orderstatus").as("status"), // 'O'/'P' ≈ completed/fulfilled, 'F' ≈ declined
      col("o_orderpriority").as("payment_method"),
      col("o_orderdate").as("created_at"))

  /** payments: one row per lineitem leg, joined to its order for the due
    * date. Fact-to-fact equi-join on the order key (see scaladoc above). */
  def payments(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        (col("l_orderkey") * 100 + col("l_linenumber")).as("payment_id"),
        col("o_custkey").as("user_id"),
        col("l_extendedprice").as("amount"),
        when(col("l_returnflag") === "R", "failed").otherwise("completed").as("status"),
        (col("o_orderdate") + expr("INTERVAL 14 DAYS")).as("due_date"),
        col("l_shipdate").as("payment_date"),
        col("l_shipdate").as("created_at"))

  /** user_logins: every event is a login; device/ip are deterministic
    * derivations so distinct-counts are stable across engines. */
  def userLogins(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id").as("login_id"),
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("int").as("device_id"),
      concat_ws(".", col("user_id"), col("event_id") % 17).as("ip_address"),
      col("ts").as("created_at"))

  /** velocity_alerts: error events; ~half are 'velocity' type. */
  def velocityAlerts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(
        col("event_id").as("alert_id"),
        col("user_id"),
        when(col("value") >= 245, "velocity").otherwise("pattern").as("alert_type"),
        col("ts").as("created_at"))

  /** credit_reports: view events; utilization normalized into [0,1). */
  def creditReports(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(
        col("event_id").as("report_id"),
        col("user_id"),
        graft.ops.Ops.rnd(col("value") / 500.0, 4).as("credit_utilization_ratio"),
        col("ts").as("report_date"))

  /** risk_scores: purchase events; score normalized into [0,1). */
  def riskScores(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("score_id"),
        col("user_id"),
        graft.ops.Ops.rnd(col("value") / 500.0, 4).as("risk_score"),
        col("ts").as("computed_at"))

  // ---- WIDE role records — the reference's feature groups are multi-field
  // records (src/feature_store/models.py:20-63), so the PIT matrix needs
  // record-valued fact tables, not scalars. Each extra field is a
  // deterministic derivation of (value, id) so the DuckDB oracle reproduces
  // it bit-for-bit; thresholds sit inside the observed value distribution
  // (median ~35, p90 ~110) so every CASE branch is exercised at every sf.
  //
  // The field derivations are defined ONCE here and shared with
  // TrainingSetJob.wideTimeline's conditional struct projections, so the
  // one-scan specialization cannot drift from the role frames (the DuckDB
  // oracle remains an intentionally independent third derivation).

  /** Risk-record fields: score + model version + risk band. */
  private[graft] def riskFields(value: Column, id: Column): Seq[Column] = Seq(
    graft.ops.Ops.rnd(value / 500.0, 4).as("risk_score"),
    (id % 5).as("risk_model_version"),
    when(value >= 100, "high").when(value >= 30, "medium")
      .otherwise("low").as("risk_band"))

  /** Credit-record fields: utilization + score + limit. */
  private[graft] def creditFields(value: Column): Seq[Column] = Seq(
    graft.ops.Ops.rnd(value / 500.0, 4).as("credit_utilization"),
    (lit(300L) + floor(value).cast("long") % 551).as("credit_score"),
    graft.ops.Ops.rnd(value * 40.0, 2).as("credit_limit"))

  /** Alert-record fields: type + severity + rule channel. */
  private[graft] def alertFields(value: Column, id: Column): Seq[Column] = Seq(
    when(value >= 245, "velocity").otherwise("pattern").as("alert_type"),
    when(value >= 150, 3).when(value >= 50, 2)
      .otherwise(1).as("alert_severity"),
    concat(lit("rule_"), (id % 7).cast("string")).as("alert_channel"))

  /** risk_scores as a 3-field record. */
  def riskScoresWide(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("score_id") +: col("user_id") +:
        riskFields(col("value"), col("event_id")) :+
        col("ts").as("computed_at"): _*)

  /** credit_reports as a 3-field record. */
  def creditReportsWide(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("report_id") +: col("user_id") +:
        creditFields(col("value")) :+
        col("ts").as("report_date"): _*)

  /** velocity_alerts as a 3-field record. */
  def velocityAlertsWide(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("alert_id") +: col("user_id") +:
        alertFields(col("value"), col("event_id")) :+
        col("ts").as("created_at"): _*)
}
