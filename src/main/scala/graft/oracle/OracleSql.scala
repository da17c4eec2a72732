package graft.oracle

import java.time.Instant

import graft.core.AsOf

/** DuckDB oracle SQL for every SQL-expressible SparkEntry query.
  *
  * These texts are the driver's independent re-execution of each query
  * (BASELINE.md gate t2): DuckDB runs them over the same parquet tables and
  * hash-compares against the Spark result. Determinism rules shared with the
  * Scala jobs:
  *   - every relative window anchors on graft.core.AsOf literals (never now());
  *   - money sums go through DECIMAL(12,2) so they are exact and
  *     order-independent, then CAST AS DOUBLE for the output;
  *   - averages/ratios are exact-sum-or-count divisions, never a double AVG;
  *   - timestamp outputs are rendered as 'yyyy-MM-dd HH:mm:ss' strings;
  *   - ties in top-1-per-key / mode are broken by a total order.
  *
  * The role-mapping CTEs mirror graft.core.Roles one-for-one (see its table).
  */
object OracleSql {

  private def T(s: String) = s"TIMESTAMP '$s'"
  private def lit(i: Instant): String = AsOf.ts(i)
  private def back(i: Instant, d: Long): String = T(AsOf.minusDays(i, d))

  // ---- role CTE bodies (keep in sync with graft.core.Roles) ----

  val roleTx: String =
    """SELECT o_custkey AS user_id, o_orderkey AS order_id,
      | o_orderkey % 23 AS merchant_id, o_totalprice AS amount,
      | o_orderstatus AS status, o_orderpriority AS payment_method,
      | o_orderdate AS created_at FROM orders""".stripMargin

  val roleUsers: String =
    """SELECT c_custkey AS user_id,
      | CAST(18 + c_custkey % 60 AS INTEGER) AS age,
      | n_name AS location_country, c_mktsegment AS location_city,
      | c_acctbal > 0 AS account_verified,
      | c_mktsegment = 'BUILDING' AS recently_updated
      |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  val rolePayments: String =
    """SELECT l_orderkey * 100 + l_linenumber AS payment_id,
      | o_custkey AS user_id, l_extendedprice AS amount,
      | CASE WHEN l_returnflag = 'R' THEN 'failed' ELSE 'completed' END AS status,
      | o_orderdate + INTERVAL 14 DAY AS due_date,
      | l_shipdate AS payment_date, l_shipdate AS created_at
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  val roleLogins: String =
    """SELECT event_id AS login_id, user_id,
      | CAST(json_extract_string(props, '$.k') AS INTEGER) AS device_id,
      | CONCAT(user_id, '.', event_id % 17) AS ip_address,
      | ts AS created_at FROM events""".stripMargin

  val roleAlerts: String =
    """SELECT event_id AS alert_id, user_id,
      | CASE WHEN value >= 245 THEN 'velocity' ELSE 'pattern' END AS alert_type,
      | ts AS created_at FROM events WHERE event_type = 'error'""".stripMargin

  val roleCredit: String =
    """SELECT event_id AS report_id, user_id,
      | ROUND(value / 500.0, 4) AS credit_utilization_ratio,
      | ts AS report_date FROM events WHERE event_type = 'view'""".stripMargin

  val roleScores: String =
    """SELECT event_id AS score_id, user_id,
      | ROUND(value / 500.0, 4) AS risk_score,
      | ts AS computed_at FROM events WHERE event_type = 'purchase'""".stripMargin

  // ---- shared SQL idioms ----

  /** COUNT(*) FILTER, written as portable conditional count. */
  private def cntIf(cond: String) = s"COUNT(CASE WHEN $cond THEN 1 END)"
  private def sumMoney(cond: String, x: String) =
    s"CAST(SUM(CASE WHEN $cond THEN CAST($x AS DECIMAL(12,2)) END) AS DOUBLE)"
  private def ratio(num: String, den: String) =
    s"CAST($num AS DOUBLE) / NULLIF(CAST($den AS DOUBLE), 0.0)"

  // ---- transaction_features (sql/transaction_features.sql) ----

  def transactionFeatures(asOf: Instant = AsOf.orders): String = {
    val in30 = s"created_at >= ${back(asOf, 30)}"
    val weekend = "EXTRACT(dow FROM created_at) IN (0, 6)"
    val night = "(EXTRACT(hour FROM created_at) >= 22 OR EXTRACT(hour FROM created_at) < 6)"
    s"""WITH tx AS ($roleTx),
       |scanned AS (SELECT * FROM tx WHERE created_at >= ${back(asOf, 31)}),
       |stats AS (
       |  SELECT user_id,
       |    ${cntIf(in30)} AS total_transactions_30d,
       |    ${sumMoney(in30, "amount")} AS total_amount_30d,
       |    ${ratio(sumMoney(in30, "amount"), cntIf(in30))} AS avg_transaction_amount,
       |    MAX(CASE WHEN $in30 THEN amount END) AS max_transaction_amount,
       |    ${cntIf(s"status = 'F' AND $in30")} AS transactions_declined_30d,
       |    COUNT(DISTINCT CASE WHEN $in30 THEN merchant_id END) AS unique_merchants_30d,
       |    ${ratio(cntIf(s"$weekend AND $in30"), cntIf(in30))} AS weekend_transaction_ratio,
       |    ${ratio(cntIf(s"$night AND $in30"), cntIf(in30))} AS night_transaction_ratio
       |  FROM scanned GROUP BY user_id),
       |active AS (
       |  SELECT user_id FROM ($roleUsers) WHERE recently_updated
       |  UNION
       |  SELECT user_id FROM scanned WHERE $in30)
       |SELECT a.user_id,
       |  COALESCE(s.total_transactions_30d, 0) AS total_transactions_30d,
       |  COALESCE(s.total_amount_30d, 0.0) AS total_amount_30d,
       |  COALESCE(s.avg_transaction_amount, 0.0) AS avg_transaction_amount,
       |  COALESCE(s.max_transaction_amount, 0.0) AS max_transaction_amount,
       |  COALESCE(s.transactions_declined_30d, 0) AS transactions_declined_30d,
       |  COALESCE(s.unique_merchants_30d, 0) AS unique_merchants_30d,
       |  COALESCE(s.weekend_transaction_ratio, 0.0) AS weekend_transaction_ratio,
       |  COALESCE(s.night_transaction_ratio, 0.0) AS night_transaction_ratio,
       |  '${lit(asOf)}' AS created_at, '${lit(asOf)}' AS updated_at
       |FROM active a LEFT JOIN stats s ON a.user_id = s.user_id""".stripMargin
  }

  // ---- user_features (sql/user_features.sql) ----

  def userFeatures(asOf: Instant = AsOf.orders): String = {
    s"""WITH tx AS ($roleTx),
       |completed AS (SELECT * FROM tx WHERE status IN ('O', 'P')),
       |stats AS (
       |  SELECT user_id, COUNT(order_id) AS total_orders,
       |    ${ratio(sumMoney("TRUE", "amount"), "COUNT(*)")} AS avg_order_value,
       |    MIN(created_at) AS first_order_date
       |  FROM completed GROUP BY user_id),
       |pm AS (SELECT user_id, payment_method, COUNT(*) AS c
       |       FROM completed GROUP BY user_id, payment_method),
       |pmr AS (SELECT user_id, payment_method, ROW_NUMBER() OVER (
       |          PARTITION BY user_id ORDER BY c DESC, payment_method ASC) AS rn
       |        FROM pm),
       |md AS (SELECT user_id, payment_method AS preferred_payment_method
       |       FROM pmr WHERE rn = 1),
       |base AS (SELECT * FROM ($roleUsers) WHERE recently_updated)
       |SELECT b.user_id, b.age, b.location_country, b.location_city,
       |  COALESCE(s.total_orders, 0) AS total_orders,
       |  COALESCE(s.avg_order_value, 0.0) AS avg_order_value,
       |  CAST(CASE WHEN s.first_order_date IS NOT NULL
       |    THEN date_diff('day', CAST(s.first_order_date AS DATE), DATE '${lit(asOf).take(10)}')
       |    END AS BIGINT) AS days_since_first_order,
       |  md.preferred_payment_method,
       |  b.account_verified,
       |  '${lit(asOf)}' AS created_at, '${lit(asOf)}' AS updated_at
       |FROM base b
       |LEFT JOIN stats s ON b.user_id = s.user_id
       |LEFT JOIN md ON b.user_id = md.user_id
       |WHERE b.user_id IS NOT NULL""".stripMargin
  }

  // ---- risk_features (sql/risk_features.sql) ----

  def riskFeatures(asOfPay: Instant = AsOf.lineitem,
                   asOfEv: Instant = AsOf.events): String = {
    val in30Ev = s"created_at >= ${back(asOfEv, 30)}"
    s"""WITH pay AS ($rolePayments),
       |lg AS ($roleLogins),
       |al AS ($roleAlerts),
       |cr AS ($roleCredit),
       |sc AS ($roleScores),
       |payment_history AS (
       |  SELECT user_id,
       |    ${cntIf(s"payment_date > due_date AND payment_date >= ${back(asOfPay, 30)}")} AS payment_delays_30d,
       |    ${cntIf(s"payment_date > due_date AND payment_date >= ${back(asOfPay, 90)}")} AS payment_delays_90d,
       |    ${cntIf(s"status = 'failed' AND created_at >= ${back(asOfPay, 90)}")} AS failed_payments_count
       |  FROM pay WHERE created_at >= ${back(asOfPay, 91)} GROUP BY user_id),
       |device_behavior AS (
       |  SELECT user_id,
       |    COUNT(DISTINCT CASE WHEN $in30Ev THEN device_id END) AS device_changes_30d,
       |    COUNT(DISTINCT CASE WHEN $in30Ev THEN ip_address END) AS login_locations_30d
       |  FROM lg WHERE created_at >= ${back(asOfEv, 31)} GROUP BY user_id),
       |velocity_patterns AS (
       |  SELECT user_id,
       |    ${cntIf(s"alert_type = 'velocity' AND $in30Ev")} AS velocity_alerts_30d
       |  FROM al WHERE created_at >= ${back(asOfEv, 31)} GROUP BY user_id),
       |credit_info AS (
       |  SELECT user_id, credit_utilization_ratio FROM (
       |    SELECT user_id, credit_utilization_ratio, ROW_NUMBER() OVER (
       |      PARTITION BY user_id ORDER BY report_date DESC, report_id DESC) AS rn
       |    FROM cr WHERE report_date >= ${back(asOfEv, 30)}) WHERE rn = 1),
       |latest_scores AS (
       |  SELECT user_id, risk_score FROM (
       |    SELECT user_id, risk_score, ROW_NUMBER() OVER (
       |      PARTITION BY user_id ORDER BY computed_at DESC, score_id DESC) AS rn
       |    FROM sc WHERE computed_at >= ${back(asOfEv, 7)}) WHERE rn = 1),
       |active AS (
       |  SELECT user_id FROM ($roleUsers) WHERE recently_updated
       |  UNION
       |  SELECT user_id FROM pay WHERE created_at >= ${back(asOfPay, 1)}
       |  UNION
       |  SELECT user_id FROM al WHERE created_at >= ${back(asOfEv, 1)})
       |SELECT a.user_id,
       |  COALESCE(ci.credit_utilization_ratio, 0.0) AS credit_utilization_ratio,
       |  COALESCE(ph.payment_delays_30d, 0) AS payment_delays_30d,
       |  COALESCE(ph.payment_delays_90d, 0) AS payment_delays_90d,
       |  COALESCE(ph.failed_payments_count, 0) AS failed_payments_count,
       |  COALESCE(db.device_changes_30d, 0) AS device_changes_30d,
       |  COALESCE(db.login_locations_30d, 0) AS login_locations_30d,
       |  COALESCE(vp.velocity_alerts_30d, 0) AS velocity_alerts_30d,
       |  COALESCE(ls.risk_score, 0.0) AS risk_score,
       |  '${lit(asOfPay)}' AS created_at, '${lit(asOfPay)}' AS updated_at
       |FROM active a
       |LEFT JOIN payment_history ph ON a.user_id = ph.user_id
       |LEFT JOIN device_behavior db ON a.user_id = db.user_id
       |LEFT JOIN velocity_patterns vp ON a.user_id = vp.user_id
       |LEFT JOIN credit_info ci ON a.user_id = ci.user_id
       |LEFT JOIN latest_scores ls ON a.user_id = ls.user_id""".stripMargin
  }

  // ---- feature_view (sql/migration_queries.sql:143-166 + risk bucketing) ----

  def featureView(): String =
    s"""WITH uf AS (${userFeatures()}),
       |tf AS (${transactionFeatures()}),
       |rf AS (${riskFeatures()})
       |SELECT uf.user_id, uf.age, uf.location_country, uf.total_orders,
       |  uf.avg_order_value, uf.days_since_first_order,
       |  uf.preferred_payment_method, uf.account_verified,
       |  tf.total_transactions_30d, tf.total_amount_30d,
       |  tf.avg_transaction_amount, tf.transactions_declined_30d,
       |  tf.weekend_transaction_ratio,
       |  rf.risk_score, rf.credit_utilization_ratio, rf.payment_delays_30d,
       |  rf.velocity_alerts_30d,
       |  CASE WHEN rf.risk_score <= 0.3 THEN 'Low'
       |       WHEN rf.risk_score <= 0.7 THEN 'Medium'
       |       ELSE 'High' END AS risk_category
       |FROM uf
       |LEFT JOIN tf ON uf.user_id = tf.user_id
       |LEFT JOIN rf ON uf.user_id = rf.user_id""".stripMargin
}
