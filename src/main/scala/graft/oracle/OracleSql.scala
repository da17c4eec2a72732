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
      | floor((value / 500.0) * 10000.0 + 0.5) / 10000.0 AS credit_utilization_ratio,
      | ts AS report_date FROM events WHERE event_type = 'view'""".stripMargin

  val roleScores: String =
    """SELECT event_id AS score_id, user_id,
      | floor((value / 500.0) * 10000.0 + 0.5) / 10000.0 AS risk_score,
      | ts AS computed_at FROM events WHERE event_type = 'purchase'""".stripMargin

  // Wide (multi-field) role records — mirror Roles.{riskScoresWide,
  // creditReportsWide, velocityAlertsWide} term for term.
  val roleScoresWide: String =
    """SELECT event_id AS score_id, user_id,
      | floor((value / 500.0) * 10000.0 + 0.5) / 10000.0 AS risk_score,
      | event_id % 5 AS risk_model_version,
      | CASE WHEN value >= 100 THEN 'high' WHEN value >= 30 THEN 'medium'
      |   ELSE 'low' END AS risk_band,
      | ts AS computed_at FROM events WHERE event_type = 'purchase'""".stripMargin

  val roleCreditWide: String =
    """SELECT event_id AS report_id, user_id,
      | floor((value / 500.0) * 10000.0 + 0.5) / 10000.0 AS credit_utilization,
      | 300 + CAST(FLOOR(value) AS BIGINT) % 551 AS credit_score,
      | floor((value * 40.0) * 100.0 + 0.5) / 100.0 AS credit_limit,
      | ts AS report_date FROM events WHERE event_type = 'view'""".stripMargin

  val roleAlertsWide: String =
    """SELECT event_id AS alert_id, user_id,
      | CASE WHEN value >= 245 THEN 'velocity' ELSE 'pattern' END AS alert_type,
      | CAST(CASE WHEN value >= 150 THEN 3 WHEN value >= 50 THEN 2
      |   ELSE 1 END AS INT) AS alert_severity,
      | 'rule_' || CAST(event_id % 7 AS VARCHAR) AS alert_channel,
      | ts AS created_at FROM events WHERE event_type = 'error'""".stripMargin

  // ---- shared SQL idioms ----

  /** COUNT(*) FILTER, written as portable conditional count. */
  private def cntIf(cond: String) = s"COUNT(CASE WHEN $cond THEN 1 END)"

  /** Cross-engine-exact HALF_UP rounding (mirror of Ops.rnd — see its
    * scaladoc for why builtin round() diverges between engines). */
  private def rnd(expr: String, digits: Int): String = {
    val p = "1" + ("0" * digits)
    s"floor(($expr) * $p.0 + 0.5) / $p.0"
  }
  private def sumMoney(cond: String, x: String) =
    s"CAST(SUM(CASE WHEN $cond THEN CAST($x AS DECIMAL(12,2)) END) AS DOUBLE)"

  /** Sample stddev from exact decimal sums (mirror of DataQualityJob.
    * exactStddev — stddev_samp's moment-merge is order/engine-dependent). */
  private def exactStddev(x: String) =
    s"""sqrt((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(($x) * ($x) AS DECIMAL(30,10))) AS DOUBLE)
       |  - CAST(SUM(CAST($x AS DECIMAL(20,2))) AS DOUBLE) * CAST(SUM(CAST($x AS DECIMAL(20,2))) AS DOUBLE))
       |  / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0)))""".stripMargin
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

  // ---- migration validation (sql/migration_queries.sql:8-137) ----

  /** Dup-PK checks exclude null keys on BOTH sides (engine mirror:
    * MigrationValidationJob.checks' not-null PK filters) — PKs are NOT
    * NULL by the reference's DDL, so a null key can never be a
    * "duplicate"; null-key anomalies surface through the orphan/null
    * checks, not the dup counters. */
  val migrationChecks: String =
    """SELECT 'dup_user_pk' AS check_name, COUNT(*) AS violation_count
      |  FROM (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL
      |        GROUP BY c_custkey HAVING COUNT(*) > 1)
      |UNION ALL SELECT 'dup_order_pk', COUNT(*)
      |  FROM (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
      |        GROUP BY o_orderkey HAVING COUNT(*) > 1)
      |UNION ALL SELECT 'multi_line_orders', COUNT(*)
      |  FROM (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1)
      |UNION ALL SELECT 'orphan_orders', COUNT(*)
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NULL
      |UNION ALL SELECT 'orphan_lineitems', COUNT(*)
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderkey IS NULL
      |UNION ALL SELECT 'null_user_orders', COUNT(*)
      |  FROM orders WHERE o_custkey IS NULL""".stripMargin

  val countReconciliation: String =
    """SELECT
      |  (SELECT COUNT(*) FROM customer) AS users_count,
      |  (SELECT COUNT(*) FROM orders) AS orders_count,
      |  (SELECT COUNT(*) FROM lineitem) AS payments_count,
      |  (SELECT COUNT(*) FROM events) AS events_count,
      |  (SELECT COUNT(*) FROM documents) AS documents_count,
      |  (SELECT COUNT(*) FROM embeddings) AS embeddings_count""".stripMargin

  def sampleCompare(): String =
    s"""WITH uf AS (${userFeatures()}),
       |tx AS ($roleTx),
       |smp AS (SELECT c_custkey AS user_id FROM customer WHERE c_custkey % 37 = 0),
       |st AS (SELECT user_id, COUNT(*) AS order_count,
       |         ${sumMoney("TRUE", "amount")} AS total_spend
       |       FROM tx GROUP BY user_id),
       |u AS ($roleUsers)
       |SELECT s.user_id, u.location_country,
       |  COALESCE(st.order_count, 0) AS order_count,
       |  COALESCE(st.total_spend, 0.0) AS total_spend,
       |  COALESCE(uf.user_id IS NOT NULL, FALSE) AS has_user_features
       |FROM smp s
       |JOIN u ON s.user_id = u.user_id
       |LEFT JOIN st ON s.user_id = st.user_id
       |LEFT JOIN uf ON s.user_id = uf.user_id""".stripMargin

  // ---- data quality (src/pipelines/data_quality.py) ----

  val dqCompleteness: String =
    """SELECT
      |  CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*) AS o_custkey_completeness,
      |  CAST(COUNT(o_totalprice) AS DOUBLE) / COUNT(*) AS o_totalprice_completeness,
      |  CAST(COUNT(o_orderdate) AS DOUBLE) / COUNT(*) AS o_orderdate_completeness,
      |  CAST(COUNT(o_orderstatus) AS DOUBLE) / COUNT(*) AS o_orderstatus_completeness,
      |  CAST(COUNT(o_orderpriority) AS DOUBLE) / COUNT(*) AS o_orderpriority_completeness,
      |  COUNT(*) AS row_count
      |FROM orders""".stripMargin

  /** Per-feature-table completeness — mirrors DataQualityJob
    * .featureCompleteness over the same column lists (shared constant). One
    * aggregate CTE per feature table, unpivoted by a UNION ALL of one-row
    * selects. */
  val dqFeatureCompleteness: String = {
    val specs = graft.jobs.DataQualityJob.featureCompletenessColumns
    val ctes = Seq(
      s"uf AS (${userFeatures()})",
      s"tf AS (${transactionFeatures()})",
      s"rf AS (${riskFeatures()})") ++
      specs.map { case (name, cols) =>
        val src = name match {
          case "user_features" => "uf"; case "transaction_features" => "tf"
          case _ => "rf"
        }
        val nns = cols.map(c => s"COUNT($c) AS nn_$c").mkString(", ")
        s"${name}_agg AS (SELECT COUNT(*) AS total_rows, $nns FROM $src)"
      }
    val rows = specs.flatMap { case (name, cols) =>
      cols.map { c =>
        s"""SELECT '$name' AS feature_table, '$c' AS column_name,
           |  total_rows, nn_$c AS nonnull_rows,
           |  ${rnd(s"CAST(nn_$c AS DOUBLE) / CAST(total_rows AS DOUBLE)", 4)}
           |    AS completeness_ratio
           |FROM ${name}_agg""".stripMargin
      }
    }
    s"WITH ${ctes.mkString(",\n")}\n${rows.mkString("\nUNION ALL ")}"
  }

  def dqFreshness(asOf: Instant = AsOf.events): String = {
    val twoHoursAgo = T(AsOf.ts(asOf.minus(java.time.Duration.ofHours(2))))
    s"""SELECT strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest_event,
       |  ${cntIf(s"ts >= $twoHoursAgo")} AS fresh_events_2h,
       |  COUNT(*) AS total_events,
       |  ${asOf.getEpochSecond} - CAST(epoch(date_trunc('second', MAX(ts))) AS BIGINT)
       |    AS staleness_seconds
       |FROM events WHERE ts < ${T(AsOf.ts(asOf))}""".stripMargin
  }

  val dqProfile: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  COUNT(*) AS line_count,
       |  SUM(l_quantity) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       |  SUM(l_quantity) / COUNT(*) AS avg_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       |  MIN(l_extendedprice) AS min_price,
       |  MAX(l_extendedprice) AS max_price,
       |  ${rnd(exactStddev("l_quantity"), 2)} AS stddev_qty
       |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  val dqOutliers: String =
    s"""WITH stats AS (
       |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS m,
       |         ${exactStddev("o_totalprice")} AS sd
       |  FROM orders)
      |SELECT floor(s.m * 100.0 + 0.5) / 100.0 AS mean_amount, floor(s.sd * 100.0 + 0.5) / 100.0 AS stddev_amount,
      |  COUNT(CASE WHEN o.o_totalprice < s.m - 3 * s.sd
      |               OR o.o_totalprice > s.m + 3 * s.sd THEN 1 END) AS outlier_count,
      |  COUNT(*) AS total_count
      |FROM orders o, stats s GROUP BY s.m, s.sd""".stripMargin

  def dqAlerts(asOf: Instant = AsOf.events): String =
    s"""WITH f AS (${dqFreshness(asOf)}), c AS ($dqCompleteness), o AS ($dqOutliers)
       |SELECT 'data_freshness' AS alert_type, 'critical' AS severity,
       |  CAST(staleness_seconds AS DOUBLE) AS metric_value, 7200.0 AS threshold,
       |  staleness_seconds > 7200 AS triggered FROM f
       |UNION ALL
       |SELECT 'completeness_custkey', 'warning', o_custkey_completeness, 0.95,
       |  o_custkey_completeness < 0.95 FROM c
       |UNION ALL
       |SELECT 'amount_outliers', 'warning',
       |  CAST(outlier_count AS DOUBLE) / total_count, 0.01,
       |  CAST(outlier_count AS DOUBLE) / total_count > 0.01 FROM o""".stripMargin

  def dqRowValidation(): String =
    s"""WITH u AS ($roleUsers),
       |tx AS ($roleTx),
       |tf AS (${transactionFeatures()}),
       |rf AS (${riskFeatures()})
       |SELECT
       |  (SELECT ${cntIf("age < 18 OR age > 100")} FROM u) AS age_out_of_range,
       |  (SELECT ${cntIf("amount < 0")} FROM tx) AS negative_amounts,
       |  (SELECT ${cntIf("weekend_transaction_ratio < 0 OR weekend_transaction_ratio > 1")}
       |     FROM tf) AS ratio_out_of_range,
       |  (SELECT ${cntIf("transactions_declined_30d > total_transactions_30d")}
       |     FROM tf) AS declined_gt_total,
       |  (SELECT ${cntIf("payment_delays_30d > payment_delays_90d")}
       |     FROM rf) AS delays_30d_gt_90d""".stripMargin

  // ---- serving lookups / export / percentiles ----

  def pointLookup(ids: Seq[Long]): String =
    s"""WITH fv AS (${featureView()})
       |SELECT * FROM fv WHERE user_id IN (${ids.mkString(", ")})""".stripMargin

  val orderedExport: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin

  /** Deterministic uniform sample — mirrors serving/Lookups.randomSample:
    * the engine's shared Knuth unit-hash order over c_custkey. Cross-engine
    * reproducible (unlike ORDER BY RANDOM(), which this replaces), so the
    * migration spot-check sample is fully oracle-checkable. */
  /** `seed` mirrors Lookups.randomSample's XOR-folded draw selector;
    * seed 0 (the driver-contract default) emits the byte-identical SQL the
    * r7 gate checked. */
  def randomSample(n: Int, seed: Long = 0L): String = {
    val hashExpr = if (seed == 0L) "" else s"xor(c_custkey, $seed)"
    s"""WITH ${unitHashCtes(", c_name, c_mktsegment", "customer", "c_custkey", hashExpr)}
       |SELECT c_custkey, c_name, c_mktsegment FROM u
       |ORDER BY unit_hash, c_custkey LIMIT $n""".stripMargin
  }

  def keysetPage(afterKey: Long, pageSize: Int): String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
       |FROM orders WHERE o_orderkey > $afterKey
       |ORDER BY o_orderkey LIMIT $pageSize""".stripMargin

  def featureBundles(): String =
    s"""WITH fv AS (${featureView()})
       |SELECT user_id, to_json(struct_pack(
       |  user_id := user_id,
       |  total_orders := total_orders,
       |  total_transactions_30d := total_transactions_30d,
       |  preferred_payment_method := COALESCE(preferred_payment_method, 'none'),
       |  risk_category := risk_category))::VARCHAR AS bundle
       |FROM fv""".stripMargin

  val percentiles: String =
    """SELECT o_orderstatus,
      |  floor(quantile_cont(o_totalprice, 0.5) * 100.0 + 0.5) / 100.0 AS p50_amount,
      |  floor(quantile_cont(o_totalprice, 0.95) * 100.0 + 0.5) / 100.0 AS p95_amount,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Distribution drift — mirrors jobs/DataQualityJob.distributionDrift:
    * reference-period equi-depth boundaries (per-bucket max, all but the
    * last), bucket = count of boundaries strictly below the value, chi²
    * terms in rational arithmetic (no PSI logarithm — libm-free). */
  def distributionDrift(splitDate: String = "1998-07-01",
                        buckets: Int = 10): String =
    s"""WITH cb AS (SELECT
       |    CASE WHEN o_orderdate < TIMESTAMP '$splitDate 00:00:00'
       |      THEN 1 ELSE 0 END AS is_ref,
       |    o_totalprice AS v, COUNT(*) AS c
       |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2),
       |c AS (SELECT v, SUM(c) AS c FROM cb WHERE is_ref = 1 GROUP BY 1),
       |m AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS hi FROM c),
       |t AS (SELECT SUM(c) AS n FROM c),
       |h AS (SELECT CAST(((hi - c) * $buckets) // n AS INT) AS bucket,
       |    MAX(v) AS hi_v FROM m, t GROUP BY 1),
       |b AS (SELECT list_slice(list(hi_v ORDER BY bucket), 1,
       |    GREATEST(len(list(hi_v ORDER BY bucket)) - 1, 0)) AS bnds FROM h),
       |a AS (SELECT CAST(len(list_filter(bnds, x -> v > x)) AS INT) AS bucket,
       |    is_ref, c FROM cb, b),
       |g AS (SELECT bucket,
       |    CAST(SUM(CASE WHEN is_ref = 1 THEN c ELSE 0 END) AS BIGINT) AS n_ref,
       |    CAST(SUM(CASE WHEN is_ref = 0 THEN c ELSE 0 END) AS BIGINT) AS n_cur
       |  FROM a GROUP BY 1),
       |p AS (SELECT bucket, n_ref, n_cur,
       |    CASE WHEN SUM(n_ref) OVER () > 0 THEN
       |      CAST(n_ref AS DOUBLE) / CAST(SUM(n_ref) OVER () AS DOUBLE) END AS pr,
       |    CASE WHEN SUM(n_cur) OVER () > 0 THEN
       |      CAST(n_cur AS DOUBLE) / CAST(SUM(n_cur) OVER () AS DOUBLE) END AS pc
       |  FROM g)
       |SELECT bucket, n_ref, n_cur,
       |  ${rnd("pr", 6)} AS p_ref, ${rnd("pc", 6)} AS p_cur,
       |  ${rnd("CASE WHEN pr > 0 THEN (pc - pr) * (pc - pr) / pr END", 6)} AS chi2_term
       |FROM p""".stripMargin

  /** MAD robust outliers — mirrors jobs/DataQualityJob.robustOutliers:
    * interpolated medians at the same fixed round points, one shared
    * double formula for the modified z, MAD-0 groups abstain (CASE gate
    * mirrors the Spark `when`). NULL values are excluded everywhere and
    * `n` counts non-null rows — countByValue's contract (an all-NULL
    * group is absent from BOTH engines' output). Joins on the GROUP key
    * are NULL-SAFE (IS NOT DISTINCT FROM), mirroring the Spark side's
    * <=> joins: groupBy keeps a NULL group key, and a plain equi-join
    * here would silently drop it while Spark preserved it. */
  def robustOutliers(zCut: Double = 3.5): String =
    s"""WITH med AS (SELECT o_orderstatus,
       |    ${rnd("quantile_cont(o_totalprice, 0.5)", 2)} AS med
       |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
       |d AS (SELECT o.o_orderstatus, o.o_totalprice, m.med,
       |    abs(o.o_totalprice - m.med) AS dev
       |  FROM orders o JOIN med m
       |    ON o.o_orderstatus IS NOT DISTINCT FROM m.o_orderstatus
       |  WHERE o.o_totalprice IS NOT NULL),
       |ma AS (SELECT o_orderstatus, ${rnd("quantile_cont(dev, 0.5)", 4)} AS mad
       |  FROM d GROUP BY 1)
       |SELECT d.o_orderstatus, MIN(d.med) AS med, MIN(ma.mad) AS mad,
       |  COUNT(CASE WHEN ma.mad > 0
       |    AND abs(0.6745 * (d.o_totalprice - d.med) / ma.mad) > $zCut
       |    THEN 1 END) AS n_outliers,
       |  COUNT(*) AS n
       |FROM d JOIN ma
       |  ON d.o_orderstatus IS NOT DISTINCT FROM ma.o_orderstatus
       |GROUP BY 1""".stripMargin

  /** Equi-depth histogram — mirrors jobs/DataQualityJob.equiDepthHistogram.
    * The whole-value bucket rule (`(lo*B) // n`, exact integer division)
    * keeps both engines deterministic; SUM of BIGINT counts pinned back to
    * BIGINT (DuckDB widens to HUGEINT). */
  def equiDepthHistogram(buckets: Int = 10): String =
    s"""WITH c AS (SELECT o_totalprice AS v, COUNT(*) AS c FROM orders
       |    WHERE o_totalprice IS NOT NULL GROUP BY 1),
       |  cum AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS hi FROM c),
       |  t AS (SELECT SUM(c) AS n FROM c)
       |SELECT CAST(((hi - c) * $buckets) // n AS INT) AS bucket,
       |  CAST(SUM(c) AS BIGINT) AS n_rows,
       |  MIN(v) AS lo_value, MAX(v) AS hi_value
       |FROM cum, t GROUP BY 1""".stripMargin

  /** Error-envelope oracle for the HLL distinct counts — the sketch value
    * is engine-specific, so the checked claim is "within 3x rsd of the
    * exact witness": Spark computes the boolean, the oracle asserts TRUE
    * (mirrors jobs/StreamAnalogJobs.approxDistinct). */
  val approxDistinct: String =
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS exact_users,
      |  COUNT(*) AS n_orders,
      |  TRUE AS approx_within_3rsd
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Rank-envelope oracle for the KLL approximate quantiles — exact
    * percentiles plus TRUE for each envelope boolean Spark computes
    * against its own sketch (mirrors serving/Lookups.percentilesApprox). */
  val percentilesApprox: String =
    """SELECT o_orderstatus,
      |  floor(quantile_cont(o_totalprice, 0.5) * 100.0 + 0.5) / 100.0 AS p50_exact,
      |  floor(quantile_cont(o_totalprice, 0.95) * 100.0 + 0.5) / 100.0 AS p95_exact,
      |  COUNT(*) AS n,
      |  TRUE AS p50_in_envelope,
      |  TRUE AS p95_in_envelope
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // ---- ext/: dedup, similarity, text analysis, multimodal ----

  /** Distinct 3-token shingles of a pre-split token list column `t`
    * (mirror of graft.ext.Dedup.shingles). */
  private def shingleExpr(t: String, text: String): String =
    s"""CASE WHEN len($t) >= 3 THEN list_distinct(list_transform(
       |  generate_series(1, len($t) - 2),
       |  i -> $t[i] || ' ' || $t[i+1] || ' ' || $t[i+2]))
       |ELSE [$text] END""".stripMargin

  val dedupExact: String =
    """SELECT md5(text) AS content_hash, COUNT(*) AS dup_count,
      |  MIN(doc_id) AS keeper_doc_id
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** Same candidates→verify pipeline as graft.ext.Dedup.jaccardPairs:
    * MinHash band candidates, then Jaccard verification on those pairs. */
  /** Shared CTE chain ending in jp(doc_a, doc_b, jaccard) — the verified
    * near-dup pairs at `threshold`; reused verbatim by the clusters oracle
    * so both gates see the identical pair set. */
  private def jaccardCtes(threshold: Double): String = {
    val sigs = (0 until 4).map(i => s"min(md5('$i|' || sh)) AS h$i").mkString(", ")
    val bands = (0 until 4).map(i => s"SELECT doc_id, $i AS band, h$i AS h FROM sig")
      .mkString("\n  UNION ALL ")
    val inter = "len(list_intersect(a.sh, b.sh))"
    s"""shl AS (SELECT doc_id,
       |    ${shingleExpr("string_split(text, ' ')", "text")} AS sh
       |  FROM documents),
       |t AS (SELECT doc_id, unnest(sh) AS sh FROM shl),
       |sig AS (SELECT doc_id, $sigs FROM t GROUP BY doc_id),
       |bands AS ($bands),
       |ok AS (SELECT band, h FROM bands GROUP BY band, h
       |  HAVING COUNT(*) <= ${graft.ext.Dedup.MaxBucket}),
       |kept AS (SELECT b.* FROM bands b JOIN ok
       |  ON b.band = ok.band AND b.h = ok.h),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM kept x JOIN kept y
       |  ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id),
       |jp AS (SELECT * FROM (
       |  SELECT c.doc_a, c.doc_b,
       |    floor((CAST($inter AS DOUBLE) / (len(a.sh) + len(b.sh) - $inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
       |  FROM cand c
       |  JOIN shl a ON c.doc_a = a.doc_id
       |  JOIN shl b ON c.doc_b = b.doc_id)
       |WHERE jaccard >= $threshold)""".stripMargin
  }

  def dedupJaccard(threshold: Double): String =
    s"""WITH ${jaccardCtes(threshold)}
       |SELECT doc_a, doc_b, jaccard FROM jp""".stripMargin

  /** Duplicate clusters over the verified pairs — mirrors ext/Dedup
    * .clusters. The oracle computes components by transitive closure
    * (recursive CTE: reach = all nodes reachable from s), then keeper =
    * MIN(reachable) — quadratic within a component, fine at oracle scale;
    * the engine side runs the O(log d)-round label propagation instead. */
  /** Shared connected-components CTE block (transitive closure over the
    * verified pairs; `lab` labels each clustered doc with its component's
    * MIN doc_id as `$labelAs`) — ONE definition for both cluster oracles,
    * so they can never check against different clusterings (code-review
    * finding: the block was copy-pasted). Quadratic within a component,
    * fine at oracle scale; the engine runs O(log d) label propagation. */
  private def ccCtes(threshold: Double, labelAs: String): String =
    s"""${jaccardCtes(threshold)},
       |edges AS (SELECT doc_a AS s, doc_b AS t FROM jp
       |  UNION SELECT doc_b, doc_a FROM jp),
       |reach(s, t) AS (
       |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
       |lab AS (SELECT s AS doc_id, MIN(t) AS $labelAs FROM reach GROUP BY s)""".stripMargin

  /** Duplicate clusters over the verified pairs — mirrors ext/Dedup
    * .clusters (see ccCtes for the closure form). */
  def dedupClusters(threshold: Double): String =
    s"""WITH RECURSIVE ${ccCtes(threshold, "keeper_doc_id")},
       |sz AS (SELECT keeper_doc_id, COUNT(*) AS cluster_size FROM lab
       |  GROUP BY keeper_doc_id)
       |SELECT l.doc_id, l.keeper_doc_id, s.cluster_size
       |FROM lab l JOIN sz s ON l.keeper_doc_id = s.keeper_doc_id""".stripMargin

  /** Quality-aware cluster keepers — mirrors ext/Dedup.clusterKeepers over
    * the same recursive-CC clustering: per cluster (identified by its
    * stable min-id label), the member with the greatest n_chars, doc_id
    * ASC breaking ties. */
  def dedupClusterKeepers(threshold: Double): String =
    s"""WITH RECURSIVE ${ccCtes(threshold, "cluster_id")},
       |ranked AS (SELECT l.cluster_id, d.doc_id, d.n_chars,
       |    COUNT(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
       |    ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |      ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
       |  FROM lab l JOIN documents d ON l.doc_id = d.doc_id)
       |SELECT cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
       |  doc_id AS keeper_doc_id, n_chars AS keeper_score
       |FROM ranked WHERE rn = 1""".stripMargin

  /** SimHash near-dup pairs — mirrors ext/Dedup.simhashPairs: 64-bit
    * fingerprint over distinct 3-shingles (two keyed md5 halves), 4 bands
    * of 16 bits for candidates with a bucket-size cap, exact positional
    * hamming verify. */
  def dedupSimhashPairs(maxHamming: Int, maxBucket: Int = 256): String = {
    val votes = (0 until 64).map { j =>
      val h = if (j < 32) "md5(tok)" else "md5('x:' || tok)"
      s"SUM(CASE WHEN substr($h, ${(j % 32) + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v$j"
    }.mkString(", ")
    val bits = (0 until 64).map(j => s"(CASE WHEN v$j > 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    val bands = (0 until 4).map(i =>
      s"SELECT doc_id, simhash64, $i AS band, substr(simhash64, ${i * 16 + 1}, 16) AS bb FROM s64")
      .mkString("\n  UNION ALL ")
    val ham = (1 to 64).map(j =>
      s"(CASE WHEN substr(sa, $j, 1) <> substr(sb, $j, 1) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id,
       |    unnest(${shingleExpr("string_split(text, ' ')", "text")}) AS tok
       |  FROM documents),
       |v AS (SELECT doc_id, $votes FROM t GROUP BY doc_id),
       |s64 AS (SELECT doc_id, $bits AS simhash64 FROM v),
       |bands AS ($bands),
       |ok AS (SELECT band, bb FROM bands GROUP BY band, bb
       |  HAVING COUNT(*) <= $maxBucket),
       |kept AS (SELECT b.* FROM bands b JOIN ok
       |  ON b.band = ok.band AND b.bb = ok.bb),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, x.simhash64 AS sa,
       |    y.doc_id AS doc_b, y.simhash64 AS sb
       |  FROM kept x JOIN kept y
       |  ON x.band = y.band AND x.bb = y.bb AND x.doc_id < y.doc_id)
       |SELECT * FROM (SELECT doc_a, doc_b, $ham AS hamming FROM cand)
       |WHERE hamming <= $maxHamming""".stripMargin
  }

  val dedupMinhashPairs: String = {
    val sigs = (0 until 4).map(i => s"min(md5('$i|' || sh)) AS h$i").mkString(", ")
    val bands = (0 until 4).map(i => s"SELECT doc_id, $i AS band, h$i AS h FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH t AS (SELECT doc_id,
       |    unnest(${shingleExpr("string_split(text, ' ')", "text")}) AS sh
       |  FROM documents),
       |sig AS (SELECT doc_id, $sigs FROM t GROUP BY doc_id),
       |bands AS ($bands),
       |ok AS (SELECT band, h FROM bands GROUP BY band, h
       |  HAVING COUNT(*) <= ${graft.ext.Dedup.MaxBucket}),
       |kept AS (SELECT b.* FROM bands b JOIN ok
       |  ON b.band = ok.band AND b.h = ok.h)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |FROM kept x JOIN kept y
       |  ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id""".stripMargin
  }

  val dedupSimhash: String = {
    val votes = (0 until 32).map(j =>
      s"SUM(CASE WHEN substr(md5(tok), ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v$j")
      .mkString(", ")
    val bits = (0 until 32).map(j => s"(CASE WHEN v$j > 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
       |  FROM documents),
       |v AS (SELECT doc_id, $votes FROM t GROUP BY doc_id)
       |SELECT doc_id, $bits AS simhash FROM v""".stripMargin
  }

  def similarityTopK(numQueries: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    floor((list_dot_product(qe, emb)
       |      / sqrt(list_dot_product(qe, qe) * list_dot_product(emb, emb))) * 1000000.0 + 0.5) / 1000000.0 AS cosine
       |  FROM e, q WHERE e.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, cosine, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= $k""".stripMargin

  // ---- banded hyperplane LSH (keep in sync with graft.ext.Similarity) ----
  // The plane-sign matrix is the SAME driver-side constant both engines see:
  // Similarity.planeSigns injected as literal lists (no per-row hashing).

  private def lshBucketExpr(t: Int): String = {
    import graft.ext.Similarity.{PlanesPerTable => P}
    (0 until P).map { j =>
      val signs = graft.ext.Similarity.planeSigns(t * P + j)
        .map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(emb, $signs) > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
  }

  /** Long-form (vec_id, table_id, bucket) CTE body over `e`. */
  private def lshLongForm: String =
    (0 until graft.ext.Similarity.NumTables)
      .map(t => s"SELECT vec_id, $t AS table_id, ${lshBucketExpr(t)} AS bucket FROM e")
      .mkString("\n  UNION ALL ")

  val annBuckets: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |b AS (${lshLongForm})
       |SELECT table_id, bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
       |FROM b GROUP BY table_id, bucket""".stripMargin

  def cosineNearDups(topN: Int, maxBucket: Int = graft.ext.Similarity.MaxBucketSize): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |b AS (${lshLongForm}),
       |sz AS (SELECT table_id, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2),
       |capped AS (SELECT b.* FROM b JOIN sz USING (table_id, bucket) WHERE sz.n <= $maxBucket),
       |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM capped x JOIN capped y
       |    ON x.table_id = y.table_id AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |scored AS (
       |  SELECT c.vec_a, c.vec_b,
       |    floor((list_dot_product(ea.emb, eb.emb)
       |      / sqrt(list_dot_product(ea.emb, ea.emb) * list_dot_product(eb.emb, eb.emb)))
       |      * 1000000.0 + 0.5) / 1000000.0 AS cosine
       |  FROM cand c JOIN e ea ON c.vec_a = ea.vec_id JOIN e eb ON c.vec_b = eb.vec_id),
       |r AS (SELECT vec_a, vec_b, cosine, ROW_NUMBER() OVER (
       |    ORDER BY cosine DESC, vec_a ASC, vec_b ASC) AS rank FROM scored)
       |SELECT vec_a, vec_b, cosine, rank FROM r WHERE rank <= $topN""".stripMargin

  /** Semantic clusters — mirrors ext/Similarity.semanticClusters: LSH
    * candidates, thresholded cosine edges, connected components with the
    * min vec_id as keeper (the same recursive-closure oracle shape as
    * dedupClusters). */
  def semanticClusters(minCosine: Double,
                       maxBucket: Int = graft.ext.Similarity.MaxBucketSize): String =
    s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |b AS (${lshLongForm}),
       |sz AS (SELECT table_id, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2),
       |capped AS (SELECT b.* FROM b JOIN sz USING (table_id, bucket) WHERE sz.n <= $maxBucket),
       |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM capped x JOIN capped y
       |    ON x.table_id = y.table_id AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |jp AS (
       |  SELECT c.vec_a, c.vec_b FROM cand c
       |    JOIN e ea ON c.vec_a = ea.vec_id JOIN e eb ON c.vec_b = eb.vec_id
       |  WHERE floor((list_dot_product(ea.emb, eb.emb)
       |      / sqrt(list_dot_product(ea.emb, ea.emb) * list_dot_product(eb.emb, eb.emb)))
       |      * 1000000.0 + 0.5) / 1000000.0 >= $minCosine),
       |edges AS (SELECT vec_a AS s, vec_b AS t FROM jp UNION SELECT vec_b, vec_a FROM jp),
       |reach(s, t) AS (
       |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
       |  UNION
       |  SELECT r.s, e2.t FROM reach r JOIN edges e2 ON r.t = e2.s),
       |lab AS (SELECT s AS vec_id, MIN(t) AS keeper_vec_id FROM reach GROUP BY s),
       |csz AS (SELECT keeper_vec_id, COUNT(*) AS cluster_size FROM lab
       |  GROUP BY keeper_vec_id)
       |SELECT l.vec_id, l.keeper_vec_id, c2.cluster_size
       |FROM lab l JOIN csz c2 ON l.keeper_vec_id = c2.keeper_vec_id""".stripMargin

  /** Embedding-space split leakage — mirrors
    * ext/Similarity.semanticSplitLeakage: the thresholded cosine pair set
    * (same LSH candidate CTEs as semanticClusters) joined against the
    * Knuth unit-hash split assignment on both endpoints, counted per
    * unordered split pair. */
  def semanticSplitLeakage(minCosine: Double, trainFrac: Double,
                           valFrac: Double,
                           maxBucket: Int = graft.ext.Similarity.MaxBucketSize): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |b AS (${lshLongForm}),
       |sz AS (SELECT table_id, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2),
       |capped AS (SELECT b.* FROM b JOIN sz USING (table_id, bucket) WHERE sz.n <= $maxBucket),
       |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM capped x JOIN capped y
       |    ON x.table_id = y.table_id AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |jp AS (
       |  SELECT c.vec_a, c.vec_b FROM cand c
       |    JOIN e ea ON c.vec_a = ea.vec_id JOIN e eb ON c.vec_b = eb.vec_id
       |  WHERE floor((list_dot_product(ea.emb, eb.emb)
       |      / sqrt(list_dot_product(ea.emb, ea.emb) * list_dot_product(eb.emb, eb.emb)))
       |      * 1000000.0 + 0.5) / 1000000.0 >= $minCosine),
       |${unitHashCtes("", "embeddings", "vec_id")},
       |sp AS (SELECT vec_id,
       |    CASE WHEN unit_hash < $trainFrac THEN 'train'
       |         WHEN unit_hash < ${trainFrac + valFrac} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM u),
       |j AS (SELECT LEAST(sa.split, sb.split) AS split_lo,
       |    GREATEST(sa.split, sb.split) AS split_hi
       |  FROM jp JOIN sp sa ON jp.vec_a = sa.vec_id
       |    JOIN sp sb ON jp.vec_b = sb.vec_id)
       |SELECT split_lo, split_hi, COUNT(*) AS pair_count,
       |  split_lo <> split_hi AS leaky
       |FROM j GROUP BY 1, 2""".stripMargin

  /** Top-k tokens per source — mirrors ext/TextAnalysis.topTermsPerSource. */
  def topTermsPerSource(k: Int): String =
    s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       |c AS (SELECT source, token, COUNT(*) AS n FROM t GROUP BY 1, 2),
       |r AS (SELECT source, token, n, ROW_NUMBER() OVER (
       |    PARTITION BY source ORDER BY n DESC, token ASC) AS rank FROM c)
       |SELECT source, token, n, rank FROM r WHERE rank <= $k""".stripMargin

  val textStats: String = {
    val stop = "('the','a','of','and','to','in','is')"
    s"""WITH d AS (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents)
       |SELECT doc_id, lang,
       |  len(t) AS token_count,
       |  len(list_distinct(t)) AS distinct_tokens,
       |  floor((CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) / len(t)) * 10000.0 + 0.5) / 10000.0
       |    AS avg_token_len,
       |  floor((CAST(len(list_filter(t, x -> x IN $stop)) AS DOUBLE) / len(t)) * 10000.0 + 0.5) / 10000.0
       |    AS stopword_ratio,
       |  floor((LEAST(1.0, CAST(len(t) AS DOUBLE) / 100) * 0.4
       |    + (1.0 - CAST(len(list_filter(t, x -> x IN $stop)) AS DOUBLE) / len(t)) * 0.3
       |    + CAST(len(list_distinct(t)) AS DOUBLE) / len(t) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality_score
       |FROM d""".stripMargin
  }

  val langId: String = {
    val en = "('the','a','of','and','to','in','is')"
    val es = "('el','la','de','que','y')"
    s"""WITH d AS (SELECT lang,
       |    len(list_filter(string_split(text, ' '), x -> x IN $en)) AS en_hits,
       |    len(list_filter(string_split(text, ' '), x -> x IN $es)) AS es_hits
       |  FROM documents)
       |SELECT lang,
       |  CASE WHEN en_hits > es_hits AND en_hits > 0 THEN 'en'
       |       WHEN es_hits > en_hits THEN 'es' ELSE 'und' END AS detected,
       |  COUNT(*) AS doc_count
       |FROM d GROUP BY 1, 2""".stripMargin
  }

  val docFingerprints: String =
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
       |SELECT doc_id,
       |  md5(concat_ws(' ', t[1], t[2], t[3], t[4], t[5])) AS prefix_fp,
       |  list_min(list_transform(${shingleExpr("t", "text")}, x -> md5(x)))
       |    AS min_shingle_fp
       |FROM d""".stripMargin

  val mediaStats: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
      |  'text/plain' AS mime, CAST(n_chars AS BIGINT) AS content_length
      |FROM documents""".stripMargin

  // ---- streaming batch-analogs (ST1/ST6/S9 over the static events table) ----

  val eventParseStats: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 END)
      |    AS valid_props,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type""".stripMargin

  def velocityWindows(asOf: Instant = AsOf.events): String = {
    def b(d: java.time.Duration) = T(AsOf.ts(asOf.minus(d)))
    val m5 = b(java.time.Duration.ofMinutes(5))
    val h1 = b(java.time.Duration.ofHours(1))
    val h24 = b(java.time.Duration.ofHours(24))
    s"""SELECT user_id,
       |  ${cntIf(s"ts >= $m5")} AS transaction_velocity_5m,
       |  COALESCE(${sumMoney(s"ts >= $m5", "value")}, 0.0) AS spending_velocity_5m,
       |  ${cntIf(s"ts >= $h1")} AS transactions_last_hour,
       |  COUNT(DISTINCT CASE WHEN ts >= $h1
       |    THEN json_extract_string(props, '$$.k') END) AS unique_merchants_last_hour,
       |  ${ratio(cntIf("event_type <> 'error'"), "COUNT(*)")} AS payment_success_rate_24h
       |FROM events WHERE ts >= $h24 AND ts < ${T(AsOf.ts(asOf))}
       |GROUP BY user_id""".stripMargin
  }

  def mergeUpsert(asOf: Instant = AsOf.events): String = {
    val cut = T(AsOf.minusDays(asOf, 7))
    s"""WITH sc AS ($roleScores),
       |old AS (SELECT user_id, risk_score, computed_at FROM (
       |  SELECT user_id, risk_score, computed_at, ROW_NUMBER() OVER (
       |    PARTITION BY user_id ORDER BY computed_at DESC, score_id DESC) AS rn
       |  FROM sc WHERE computed_at < $cut) WHERE rn = 1),
       |upd AS (SELECT user_id, risk_score, computed_at FROM (
       |  SELECT user_id, risk_score, computed_at, ROW_NUMBER() OVER (
       |    PARTITION BY user_id ORDER BY computed_at DESC, score_id DESC) AS rn
       |  FROM sc WHERE computed_at >= $cut) WHERE rn = 1)
       |SELECT user_id, risk_score, strftime(computed_at, '%Y-%m-%d %H:%M:%S') AS computed_at
       |FROM (SELECT * FROM upd
       |      UNION ALL
       |      SELECT o.* FROM old o LEFT JOIN upd u ON o.user_id = u.user_id
       |      WHERE u.user_id IS NULL)""".stripMargin
  }

  /** As-of join emulated with the identical window idiom (DuckDB's native
    * ASOF JOIN would also work; the row_number form guarantees the same
    * tie-break as the Spark implementation). The lookback band is the
    * SHARED constant (StreamAnalogJobs.asOfRiskLookbackDays) — the band is
    * semantic, so job and oracle must never drift apart. */
  val asOfRisk: String =
    s"""WITH sc AS ($roleScores),
       |probes AS (SELECT event_id AS probe_id, user_id, ts AS probe_ts
       |  FROM events WHERE event_type = 'click'),
       |j AS (SELECT p.probe_id, p.user_id, p.probe_ts,
       |    s.risk_score, s.computed_at, s.score_id
       |  FROM probes p LEFT JOIN sc s
       |  ON p.user_id = s.user_id AND s.computed_at <= p.probe_ts
       |    AND s.computed_at >= p.probe_ts
       |      - INTERVAL ${graft.jobs.StreamAnalogJobs.asOfRiskLookbackDays} DAY),
       |r AS (SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY computed_at DESC NULLS LAST, score_id DESC NULLS LAST) AS rn
       |  FROM j)
       |SELECT probe_id, user_id,
       |  strftime(probe_ts, '%Y-%m-%d %H:%M:%S') AS probe_ts,
       |  COALESCE(risk_score, 0.0) AS risk_score_asof
       |FROM r WHERE rn = 1""".stripMargin

  /** Training/serving skew — mirrors jobs/SkewMonitorJob: per user, the
    * banded top-1 fact at the user's LAST click (offline) vs at asOf
    * (online), per role; then per-feature agreement counts. The banded
    * top-1 row_number form is the oracle-side equivalent of the engine's
    * forward-fill (PitJoin's documented equivalence, incl. the value IS NOT
    * NULL join mirror of the fill's ignoreNulls); raw values compared
    * — no serving defaults. */
  val trainingServingSkew: String = {
    val band = graft.jobs.TrainingSetJob.lookbackDays
    val asOf = s"TIMESTAMP '${graft.jobs.SkewMonitorJob.defaultAsOf}'"
    def side(role: String, cte: String, ts: String, id: String, v: String,
             ref: String, alias: String): String =
      s"""$alias AS (SELECT u.user_id, x.$v, ROW_NUMBER() OVER (
         |    PARTITION BY u.user_id
         |    ORDER BY x.$ts DESC NULLS LAST, x.$id DESC NULLS LAST) AS rn
         |  FROM probes u LEFT JOIN $cte x ON u.user_id = x.user_id
         |    AND x.$v IS NOT NULL
         |    AND x.$ts <= $ref AND x.$ts >= $ref - INTERVAL $band DAY)""".stripMargin
    def feat(name: String, offA: String, onA: String, v: String): String =
      s"""SELECT '$name' AS feature, (SELECT COUNT(*) FROM probes) AS n_users,
         |  COUNT(o.$v) AS n_offline, COUNT(n.$v) AS n_online,
         |  ${cntIf(s"o.$v IS NOT NULL AND n.$v IS NOT NULL")} AS n_both,
         |  ${cntIf(s"o.$v IS NOT NULL AND o.$v = n.$v")} AS n_equal,
         |  CASE WHEN ${cntIf(s"o.$v IS NOT NULL AND n.$v IS NOT NULL")} > 0
         |    THEN ${rnd(s"1.0 - ${cntIf(s"o.$v IS NOT NULL AND o.$v = n.$v")} * 1.0 / ${cntIf(s"o.$v IS NOT NULL AND n.$v IS NOT NULL")}", 6)}
         |  END AS skew_rate
         |FROM probes p
         |LEFT JOIN (SELECT user_id, $v FROM $offA WHERE rn = 1) o
         |  ON p.user_id = o.user_id
         |LEFT JOIN (SELECT user_id, $v FROM $onA WHERE rn = 1) n
         |  ON p.user_id = n.user_id""".stripMargin
    s"""WITH probes AS (
       |  SELECT user_id, ts AS probe_ts FROM events
       |  WHERE event_type = 'click' AND ts <= $asOf
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
       |    ORDER BY ts DESC, event_id DESC) = 1),
       |sc AS ($roleScores),
       |cr AS ($roleCredit),
       |al AS ($roleAlerts),
       |${side("risk", "sc", "computed_at", "score_id", "risk_score", "u.probe_ts", "offr")},
       |${side("risk", "sc", "computed_at", "score_id", "risk_score", asOf, "onr")},
       |${side("credit", "cr", "report_date", "report_id", "credit_utilization_ratio", "u.probe_ts", "offc")},
       |${side("credit", "cr", "report_date", "report_id", "credit_utilization_ratio", asOf, "onc")},
       |${side("alert", "al", "created_at", "alert_id", "alert_type", "u.probe_ts", "offa")},
       |${side("alert", "al", "created_at", "alert_id", "alert_type", asOf, "ona")}
       |${feat("risk_score", "offr", "onr", "risk_score")}
       |UNION ALL
       |${feat("credit_utilization_ratio", "offc", "onc", "credit_utilization_ratio")}
       |UNION ALL
       |${feat("alert_type", "offa", "ona", "alert_type")}""".stripMargin
  }

  /** PIT training set — mirrors jobs/TrainingSetJob.pitTrainingSet: for
    * each click probe, the latest in-band NON-NULL fact per role table
    * (banded left join + top-1 by (ts DESC, id DESC), once per role — the
    * row_number form is the deterministic ASOF; the value IS NOT NULL in
    * the join mirrors PitJoin.fill's ignoreNulls contract: a null-valued
    * fact must not mask an older value). The band is the SAME shared
    * constant as asOfRisk; defaults mirror serving (risk 0.0, credit
    * NULL, alert 'none'). */
  val pitTrainingSet: String = {
    val band = graft.jobs.TrainingSetJob.lookbackDays
    s"""WITH probes AS (SELECT event_id AS probe_id, user_id,
       |    ts AS probe_ts, value >= 250 AS label
       |  FROM events WHERE event_type = 'click'),
       |sc AS ($roleScores),
       |cr AS ($roleCredit),
       |al AS ($roleAlerts),
       |r1 AS (SELECT p.probe_id, s.risk_score, ROW_NUMBER() OVER (
       |    PARTITION BY p.probe_id
       |    ORDER BY s.computed_at DESC NULLS LAST, s.score_id DESC NULLS LAST) AS rn
       |  FROM probes p LEFT JOIN sc s ON p.user_id = s.user_id
       |    AND s.risk_score IS NOT NULL
       |    AND s.computed_at <= p.probe_ts
       |    AND s.computed_at >= p.probe_ts - INTERVAL $band DAY),
       |r2 AS (SELECT p.probe_id, c.credit_utilization_ratio, ROW_NUMBER() OVER (
       |    PARTITION BY p.probe_id
       |    ORDER BY c.report_date DESC NULLS LAST, c.report_id DESC NULLS LAST) AS rn
       |  FROM probes p LEFT JOIN cr c ON p.user_id = c.user_id
       |    AND c.credit_utilization_ratio IS NOT NULL
       |    AND c.report_date <= p.probe_ts
       |    AND c.report_date >= p.probe_ts - INTERVAL $band DAY),
       |r3 AS (SELECT p.probe_id, a.alert_type, ROW_NUMBER() OVER (
       |    PARTITION BY p.probe_id
       |    ORDER BY a.created_at DESC NULLS LAST, a.alert_id DESC NULLS LAST) AS rn
       |  FROM probes p LEFT JOIN al a ON p.user_id = a.user_id
       |    AND a.alert_type IS NOT NULL
       |    AND a.created_at <= p.probe_ts
       |    AND a.created_at >= p.probe_ts - INTERVAL $band DAY)
       |SELECT p.probe_id, p.user_id,
       |  strftime(p.probe_ts, '%Y-%m-%d %H:%M:%S') AS probe_ts, p.label,
       |  COALESCE(r1.risk_score, 0.0) AS risk_score_asof,
       |  r2.credit_utilization_ratio AS credit_utilization_asof,
       |  COALESCE(r3.alert_type, 'none') AS last_alert_type
       |FROM probes p
       |LEFT JOIN (SELECT probe_id, risk_score FROM r1 WHERE rn = 1) r1
       |  ON p.probe_id = r1.probe_id
       |LEFT JOIN (SELECT probe_id, credit_utilization_ratio FROM r2 WHERE rn = 1) r2
       |  ON p.probe_id = r2.probe_id
       |LEFT JOIN (SELECT probe_id, alert_type FROM r3 WHERE rn = 1) r3
       |  ON p.probe_id = r3.probe_id""".stripMargin
  }

  /** WIDE PIT training matrix — mirrors jobs/TrainingSetJob.
    * pitTrainingMatrixWide: per probe and per role, the latest in-band fact
    * ROW (record-level ASOF — deliberately NO value-null filter: the whole
    * record arrives from one row, PitJoin.WideFact's contract), each role
    * under its OWN staleness band (riskBandDays/creditBandDays/
    * alertBandDays). Outputs stay raw — null means no record in band. */
  val pitTrainingMatrixWide: String = {
    def side(alias: String, cte: String, ts: String, id: String,
             cols: Seq[String], band: Int): String =
      s"""$alias AS (SELECT p.probe_id, ${cols.map("x." + _).mkString(", ")},
         |    ROW_NUMBER() OVER (PARTITION BY p.probe_id
         |      ORDER BY x.$ts DESC NULLS LAST, x.$id DESC NULLS LAST) AS rn
         |  FROM probes p LEFT JOIN $cte x ON p.user_id = x.user_id
         |    AND x.$ts <= p.probe_ts
         |    AND x.$ts >= p.probe_ts - INTERVAL $band DAY)""".stripMargin
    val riskCols = Seq("risk_score", "risk_model_version", "risk_band")
    val creditCols = Seq("credit_utilization", "credit_score", "credit_limit")
    val alertCols = Seq("alert_type", "alert_severity", "alert_channel")
    s"""WITH probes AS (SELECT event_id AS probe_id, user_id,
       |    ts AS probe_ts, value >= 250 AS label
       |  FROM events WHERE event_type = 'click'),
       |sc AS ($roleScoresWide),
       |cr AS ($roleCreditWide),
       |al AS ($roleAlertsWide),
       |${side("r1", "sc", "computed_at", "score_id", riskCols,
                graft.jobs.TrainingSetJob.riskBandDays)},
       |${side("r2", "cr", "report_date", "report_id", creditCols,
                graft.jobs.TrainingSetJob.creditBandDays)},
       |${side("r3", "al", "created_at", "alert_id", alertCols,
                graft.jobs.TrainingSetJob.alertBandDays)}
       |SELECT p.probe_id, p.user_id,
       |  strftime(p.probe_ts, '%Y-%m-%d %H:%M:%S') AS probe_ts, p.label,
       |  ${riskCols.map("r1." + _).mkString(", ")},
       |  ${creditCols.map("r2." + _).mkString(", ")},
       |  ${alertCols.map("r3." + _).mkString(", ")}
       |FROM probes p
       |LEFT JOIN (SELECT * FROM r1 WHERE rn = 1) r1 ON p.probe_id = r1.probe_id
       |LEFT JOIN (SELECT * FROM r2 WHERE rn = 1) r2 ON p.probe_id = r2.probe_id
       |LEFT JOIN (SELECT * FROM r3 WHERE rn = 1) r3 ON p.probe_id = r3.probe_id""".stripMargin
  }

  /** warehouse_pointered_day: one day's per-user aggregate. The engine
    * side reads through the POINTERED day-partitioned warehouse
    * (sinks/Compaction.readPointered over per-partition pointer stores,
    * post-compaction); the oracle is the plain semantic query — layout
    * indirection must never change results. */
  val warehousePointeredDay: String =
    s"""SELECT user_id, COUNT(*) AS n_events,
       |  COALESCE(${sumMoney("TRUE", "value")}, 0.0) AS total_value
       |FROM events
       |WHERE CAST(ts AS DATE) = DATE '2024-01-10'
       |GROUP BY 1""".stripMargin

  val tumblingCounts: String =
    s"""SELECT user_id,
       |  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       |  COUNT(*) AS n_events,
       |  COALESCE(${sumMoney("TRUE", "value")}, 0.0) AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin

  val eventSessions: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(epoch(date_trunc('second', ts)) AS BIGINT)
      |            - CAST(epoch(date_trunc('second', lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g),
      |per_session AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events,
      |    CAST(epoch(date_trunc('second', MAX(ts))) AS BIGINT)
      |      - CAST(epoch(date_trunc('second', MIN(ts))) AS BIGINT) AS duration_secs
      |  FROM s GROUP BY user_id, session_id)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(n_events) AS BIGINT) AS total_events,
      |  MAX(n_events) AS max_session_events,
      |  CAST(SUM(duration_secs) AS BIGINT) AS total_session_secs
      |FROM per_session GROUP BY user_id""".stripMargin

  /** BPE-ish token counting — mirrors ext/TextAnalysis.tokenCounts. The
    * pattern is ASCII-only with no lookarounds, so DuckDB's RE2 and Spark's
    * Java regex tokenize identically; single quotes doubled for the SQL
    * literal (backslashes are literal in DuckDB single-quoted strings). */
  val tokenCounts: String = {
    val pat = graft.ext.TextAnalysis.bpePattern.replace("'", "''")
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS ws_tokens,
       |  len(regexp_extract_all(text, '$pat', 0)) AS bpe_tokens,
       |  ${rnd(
        s"CAST(len(regexp_extract_all(text, '$pat', 0)) AS DOUBLE)" +
          " / CAST(len(string_split(text, ' ')) AS DOUBLE)", 4)} AS subword_ratio
       |FROM documents""".stripMargin
  }

  /** Frame sampling over the media table — mirrors
    * ext/Multimodal.frameSample (payload = utf-8 text bytes; ASCII corpus,
    * so char-based substring/length here equals Spark's byte-based ones). */
  def frameSample(frameBytes: Int, stride: Int): String =
    s"""WITH f AS (SELECT doc_id AS media_id, text,
       |    CAST(ceil(CAST(length(text) AS DOUBLE) / $frameBytes) AS BIGINT) AS n
       |  FROM documents),
       |idx AS (SELECT media_id, text, unnest(range(0, n)) AS frame_no FROM f)
       |SELECT media_id, frame_no,
       |  length(substring(text, CAST(frame_no * $frameBytes + 1 AS INT), $frameBytes))
       |    AS frame_bytes,
       |  md5(substring(text, CAST(frame_no * $frameBytes + 1 AS INT), $frameBytes))
       |    AS frame_md5
       |FROM idx WHERE frame_no % $stride = 0""".stripMargin

  /** Bigram repetition signals — mirrors ext/TextAnalysis.repetitionStats. */
  val repetitionStats: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |n AS (SELECT doc_id, len(toks) AS n_tokens,
       |        unnest(list_transform(range(1, len(toks)),
       |          i -> toks[i] || ' ' || toks[i+1])) AS bigram
       |      FROM t WHERE len(toks) >= 2),
       |c AS (SELECT doc_id, n_tokens, bigram, COUNT(*) AS c FROM n GROUP BY 1, 2, 3),
       |a AS (SELECT doc_id, n_tokens, MAX(c) AS top_c, COUNT(*) AS dist FROM c GROUP BY 1, 2)
       |SELECT doc_id,
       |  ${rnd("CAST(top_c AS DOUBLE) / (n_tokens - 1)", 4)} AS top_bigram_ratio,
       |  ${rnd("CAST(dist AS DOUBLE) / (n_tokens - 1)", 4)} AS distinct_bigram_ratio
       |FROM a""".stripMargin

  /** Stratified sample — mirrors ext/Corpus.stratifiedSample term for term,
    * including the overflow-safe split-multiply (16-bit halves of the low
    * 32 bits), so neither engine ever overflows int64 on large ids. */
  /** Benchmark decontamination — mirrors ext/Corpus.contamination: distinct
    * word n-grams (whole-text fallback under n tokens), probe set = doc_id
    * < probeMax, overlap counted on the joined distinct grams. */
  def contamination(probeMax: Long, n: Int, minFrac: Double): String = {
    val grams =
      s"""CASE WHEN len(toks) >= $n
         |  THEN list_distinct(list_transform(range(1, len(toks) - $n + 2),
         |    i -> array_to_string(list_slice(toks, i, i + $n - 1), ' ')))
         |  ELSE [text] END""".stripMargin
    s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS toks
       |  FROM documents),
       |pg AS (SELECT doc_id AS probe_id, unnest($grams) AS g
       |  FROM tok WHERE doc_id < $probeMax),
       |cg AS (SELECT doc_id, unnest($grams) AS g FROM tok),
       |psize AS (SELECT probe_id, COUNT(*) AS probe_ngrams FROM pg GROUP BY probe_id),
       |ov AS (SELECT pg.probe_id, cg.doc_id, COUNT(*) AS overlap_ngrams
       |  FROM pg JOIN cg ON pg.g = cg.g AND cg.doc_id <> pg.probe_id
       |  GROUP BY pg.probe_id, cg.doc_id)
       |SELECT * FROM (
       |  SELECT ov.probe_id, ov.doc_id, ov.overlap_ngrams,
       |    ${rnd("CAST(ov.overlap_ngrams AS DOUBLE) / CAST(p.probe_ngrams AS DOUBLE)", 4)}
       |      AS overlap_frac
       |  FROM ov JOIN psize p ON ov.probe_id = p.probe_id)
       |WHERE overlap_frac >= $minFrac""".stripMargin
  }

  /** Sequence packing — mirrors ext/Corpus.packSequences: exclusive
    * per-source cumulative whitespace-token sum in doc_id order, sliced
    * into `budget`-token bins. */
  def packSequences(budget: Int): String =
    s"""WITH s AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_tokens
       |  FROM s)
       |SELECT doc_id, source, n_tokens,
       |  CAST(floor(prior_tokens / $budget) AS BIGINT) AS bin,
       |  CAST(prior_tokens % $budget AS BIGINT) AS bin_offset
       |FROM c""".stripMargin

  /** Token-budget mixture sampling — mirrors ext/Corpus.mixtureSample. The
    * oracle uses the plain per-source window cumsum in (unit_hash, doc_id)
    * order; the engine's chunked two-phase prefix sum computes the same
    * exclusive cumsum (chunks partition the hash order). Window SUM(BIGINT)
    * is pinned back to BIGINT (DuckDB widens to HUGEINT). */
  def mixtureSample(budgets: Seq[(String, Long)], defaultBudget: Long): String = {
    val cases = budgets.map { case (s, b) => s"WHEN '$s' THEN $b" }.mkString(" ")
    s"""WITH d0 AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ((doc_id % 4294967296) + 4294967296) % 4294967296 AS a
       |  FROM documents),
       |d AS (SELECT *, CAST(floor(a / 65536) AS BIGINT) AS h FROM d0),
       |u AS (SELECT doc_id, source, n_tokens,
       |    CAST((((h * 2654435761) % 65536) * 65536
       |      + (a - h * 65536) * 2654435761) % 4294967296 AS DOUBLE)
       |      / 4294967296.0 AS unit_hash
       |  FROM d),
       |c AS (SELECT doc_id, source, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (
       |      PARTITION BY source ORDER BY unit_hash, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS prior_tokens
       |  FROM u)
       |SELECT doc_id, source, n_tokens, prior_tokens FROM c
       |WHERE prior_tokens < (CASE source $cases ELSE $defaultBudget END)""".stripMargin
  }

  /** Shared first-occurrence packing for the span/substring elections:
    * doc_id·10⁹ + pos orders identically to the engine's lexicographic
    * MIN(STRUCT(doc_id, pos)) while pos < 10⁹ — a BILLION-token document —
    * and the CASE raises (DuckDB error()) instead of silently electing
    * wrong past that bound (r12 ADVICE). Why packed and not MIN(ROW(...)):
    * a struct MIN over the ~90M-group election at the ×30 rung allocates
    * far past DuckDB's memory limit (untracked, OOM-killed, measured r13);
    * the BIGINT form is what the ×30 focused runs passed with. */
  private val PackStride = 1000000000L
  private def packedKey(doc: String, pos: String): String =
    s"CASE WHEN $pos >= $PackStride THEN error('$pos overflows the " +
      s"(doc_id, pos) packing stride $PackStride — widen it') " +
      s"ELSE $doc * $PackStride + $pos END"

  /** Span-level exact dedup — mirrors ext/Dedup.spanDedup. First occurrence
    * = MIN over the guarded packed (doc_id, span_idx) key (see packedKey). */
  def spanDedup(spanTokens: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |e AS (SELECT doc_id, i AS span_idx,
       |    md5(array_to_string(toks[i*$spanTokens+1 : i*$spanTokens+$spanTokens], ' ')) AS h
       |  FROM t, unnest(generate_series(0,
       |    CAST(ceil(CAST(len(toks) AS DOUBLE) / $spanTokens) AS BIGINT) - 1)) AS u(i)),
       |f AS (SELECT h, MIN(${packedKey("doc_id", "span_idx")}) AS first_key FROM e GROUP BY h),
       |j AS (SELECT e.doc_id,
       |    CASE WHEN e.doc_id * $PackStride + e.span_idx > f.first_key THEN 1 ELSE 0 END AS dup
       |  FROM e JOIN f ON e.h = f.h)
       |SELECT doc_id, COUNT(*) AS n_spans,
       |  CAST(SUM(dup) AS BIGINT) AS dup_spans,
       |  ${rnd("CAST(SUM(dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 4)} AS dup_frac
       |FROM j GROUP BY doc_id""".stripMargin

  /** Shared CTE spine of the substring_dedup / substring_clean oracles:
    * stride-1 windows, ≥2× first-occurrence election, LEFT-join dup flags,
    * and the preceding-dup-ends running max (mirrors Dedup.substringFlagged). */
  private def substrCtes(k: Int): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |e AS (SELECT doc_id, i AS pos, md5(array_to_string(toks[i+1 : i+$k], ' ')) AS h
       |  FROM t, unnest(generate_series(0, len(toks) - $k)) AS u(i)
       |  WHERE len(toks) >= $k),
       |f AS (SELECT h, MIN(${packedKey("doc_id", "pos")}) AS first_key FROM e
       |  GROUP BY h HAVING COUNT(*) > 1),
       |j AS (SELECT e.doc_id, e.pos, e.pos + $k AS e_end,
       |    CASE WHEN f.first_key IS NOT NULL
       |      AND e.doc_id * $PackStride + e.pos > f.first_key THEN 1 ELSE 0 END AS dup
       |  FROM e LEFT JOIN f ON e.h = f.h),
       |x AS (SELECT doc_id, pos, e_end, dup,
       |    MAX(CASE WHEN dup = 1 THEN e_end END) OVER (PARTITION BY doc_id
       |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM j)""".stripMargin

  /** Cross-document exact-substring dedup — mirrors ext/Dedup.substringDedup
    * (overlapping stride-1 windows, first occurrence by packed (doc_id, pos)
    * key, per-doc streaming interval union via the preceding-dup-ends
    * running max). SUMs cast to BIGINT (DuckDB widens to HUGEINT). */
  def substringDedup(k: Int): String =
    s"""WITH ${substrCtes(k)}
       |SELECT doc_id, COUNT(*) AS n_windows,
       |  CAST(SUM(dup) AS BIGINT) AS dup_windows,
       |  CAST(SUM(CASE WHEN dup = 1 AND (prev_end IS NULL OR pos > prev_end)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
       |  CAST(SUM(CASE WHEN dup = 1
       |    THEN e_end - GREATEST(COALESCE(prev_end, pos), pos) ELSE 0 END) AS BIGINT)
       |    AS removable_tokens,
       |  ${rnd(s"CAST(SUM(CASE WHEN dup = 1 THEN e_end - GREATEST(COALESCE(prev_end, pos), pos) ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) + $k - 1 AS DOUBLE)", 4)}
       |    AS removable_frac
       |FROM x GROUP BY doc_id""".stripMargin

  /** ExactSubstr applied — mirrors ext/Dedup.substringClean: merged spans
    * from the shared spine, then token-position anti-join and ordered
    * re-assembly. Every doc returns (verbatim when untouched, empty when
    * wholly duplicated elsewhere). */
  def substringClean(k: Int): String =
    s"""WITH ${substrCtes(k)},
       |g AS (SELECT doc_id, pos, e_end, dup,
       |    SUM(CASE WHEN dup = 1 AND (prev_end IS NULL OR pos > prev_end)
       |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM x),
       |sp AS (SELECT doc_id, grp, MIN(pos) AS s, MAX(e_end) AS e
       |  FROM g WHERE dup = 1 GROUP BY doc_id, grp),
       |tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
       |  FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
       |keep AS (SELECT tok.doc_id, tok.pos, tok.tok
       |  FROM tok LEFT JOIN sp
       |    ON tok.doc_id = sp.doc_id AND tok.pos >= sp.s AND tok.pos < sp.e
       |  WHERE sp.doc_id IS NULL),
       |ka AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept,
       |    string_agg(tok, ' ' ORDER BY pos) AS txt FROM keep GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  COALESCE(ka.kept, 0) AS kept_tokens,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) - COALESCE(ka.kept, 0)
       |    AS removed_tokens,
       |  COALESCE(ka.txt, '') AS clean_text
       |FROM documents d LEFT JOIN ka ON d.doc_id = ka.doc_id""".stripMargin

  /** PII scan + redaction — mirrors ext/TextAnalysis.piiScan, including the
    * deterministic augmentation. Patterns live in the RE2∩Java subset so
    * DuckDB (RE2) and Spark (java.util.regex) match byte-identically; the
    * 'g' flag makes DuckDB's regexp_replace global like Spark's. */
  val piiScan: String = {
    val email = graft.ext.TextAnalysis.emailPattern
    val idnum = graft.ext.TextAnalysis.idNumberPattern
    s"""WITH a AS (SELECT doc_id,
       |    text ||
       |    CASE WHEN doc_id % 3 = 0
       |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0
       |      THEN ' id '
       |        || lpad(CAST((doc_id % 1000) * 7 % 900 + 100 AS VARCHAR), 3, '0') || '-'
       |        || lpad(CAST((doc_id % 1000) * 13 % 90 + 10 AS VARCHAR), 2, '0') || '-'
       |        || lpad(CAST((doc_id % 1000) * 17 % 9000 + 1000 AS VARCHAR), 4, '0')
       |      ELSE '' END AS aug
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(aug, '$email', 0)) AS BIGINT) AS email_hits,
       |  CAST(len(regexp_extract_all(aug, '$idnum', 0)) AS BIGINT) AS id_hits,
       |  md5(regexp_replace(regexp_replace(aug, '$email', '<EMAIL>', 'g'),
       |    '$idnum', '<ID>', 'g')) AS redacted_fp
       |FROM a""".stripMargin
  }

  /** Interval-join rollup — mirrors jobs/StreamAnalogJobs.intervalAgg. The
    * oracle joins on the raw range predicate; the engine's day-bucketized
    * equi-join computes the same match set by construction. */
  val intervalAgg: String =
    s"""WITH w AS (SELECT i AS window_id,
       |    TIMESTAMP '2024-01-01 00:00:00' + to_days(CAST(i * 7 AS INTEGER)) AS w_start,
       |    TIMESTAMP '2024-01-01 00:00:00' + to_days(CAST(i * 7 + 3 AS INTEGER)) AS w_end
       |  FROM generate_series(0, 4) AS t(i))
       |SELECT w.window_id, COUNT(*) AS n_events,
       |  COUNT(DISTINCT e.user_id) AS n_users,
       |  COALESCE(${sumMoney("TRUE", "e.value")}, 0.0) AS total_value
       |FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
       |GROUP BY w.window_id""".stripMargin

  /** Direct recompute at the serving grain — the witness that
    * jobs/StreamAnalogJobs.incrementalUserStats' partial-merge is exact
    * (algebraic aggregates over DECIMAL sums compose bit-identically). */
  val incrementalUserStats: String =
    s"""SELECT user_id, COUNT(*) AS n_events,
       |  ${sumMoney("TRUE", "value")} AS total_value,
       |  ${rnd(s"${sumMoney("TRUE", "value")} / CAST(COUNT(*) AS DOUBLE)", 4)} AS avg_value,
       |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
       |FROM events GROUP BY user_id""".stripMargin

  def stratifiedSample(rates: Seq[(String, Double)], defaultRate: Double): String = {
    val cases = rates.map { case (s, r) => s"WHEN '$s' THEN $r" }.mkString(" ")
    s"""WITH ${unitHashCtes(", source, lang")}
       |SELECT doc_id, source, lang FROM u
       |WHERE unit_hash < (CASE source $cases ELSE $defaultRate END)""".stripMargin
  }

  /** Deterministic train/val/test assignment — mirrors ext/Corpus.
    * splitAssign (the shared Knuth unit-hash CTE chain; the val threshold
    * is computed in Scala so both engines embed the identical double
    * literal). */
  def splitAssign(trainFrac: Double, valFrac: Double): String =
    s"""WITH ${unitHashCtes(", source")}
       |SELECT doc_id, source,
       |  CASE WHEN unit_hash < $trainFrac THEN 'train'
       |       WHEN unit_hash < ${trainFrac + valFrac} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM u""".stripMargin

  /** Per-source median quality filter — mirrors ext/TextAnalysis.
    * qualityFilter (textStats' quality expression, quantile_cont median
    * per source, keep >= median). */
  val qualityFilter: String = {
    val stop = "('the','a','of','and','to','in','is')"
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       |q AS (SELECT doc_id, source,
       |    floor((LEAST(1.0, CAST(len(t) AS DOUBLE) / 100) * 0.4
       |      + (1.0 - CAST(len(list_filter(t, x -> x IN $stop)) AS DOUBLE) / len(t)) * 0.3
       |      + CAST(len(list_distinct(t)) AS DOUBLE) / len(t) * 0.3) * 10000.0 + 0.5) / 10000.0
       |      AS quality_score
       |  FROM d),
       |m AS (SELECT source,
       |    floor(quantile_cont(quality_score, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS source_median
       |  FROM q GROUP BY source)
       |SELECT q.doc_id, q.source, q.quality_score, m.source_median
       |FROM q JOIN m USING (source)
       |WHERE q.quality_score >= m.source_median""".stripMargin
  }

  /** OOV rate vs the corpus top-N vocabulary — mirrors
    * ext/TextAnalysis.oovRate (SUM pinned to BIGINT against DuckDB's
    * HUGEINT widening). */
  def oovRate(vocabSize: Int): String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY 1),
       |v AS (SELECT token FROM c ORDER BY n DESC, token ASC LIMIT $vocabSize),
       |a AS (SELECT t.doc_id, COUNT(*) AS token_count,
       |    CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_count
       |  FROM t LEFT JOIN v ON t.token = v.token GROUP BY 1)
       |SELECT doc_id, token_count, oov_count,
       |  ${rnd("CAST(oov_count AS DOUBLE) / token_count", 4)} AS oov_rate
       |FROM a""".stripMargin

  /** Per-label centroid bottom-k cosine outliers — mirrors
    * ext/Similarity.embeddingOutliers (decimal-pinned element sums; DuckDB
    * lists are 1-based so the 0-based pos indexes at pos+1). */
  def embeddingOutliers(k: Int, dim: Int = 64): String =
    s"""WITH p AS (SELECT vec_id, label, i.range AS pos,
       |    CAST(embedding[CAST(i.range AS INT) + 1] AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN range($dim) i),
       |cent AS (SELECT label, pos,
       |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS c
       |  FROM p GROUP BY 1, 2),
       |s AS (SELECT p.vec_id, p.label,
       |    CAST(SUM(CAST(p.x * cent.c AS DECIMAL(30,15))) AS DOUBLE) AS dot,
       |    CAST(SUM(CAST(p.x * p.x AS DECIMAL(30,15))) AS DOUBLE) AS nx,
       |    CAST(SUM(CAST(cent.c * cent.c AS DECIMAL(30,15))) AS DOUBLE) AS nc
       |  FROM p JOIN cent ON p.label = cent.label AND p.pos = cent.pos
       |  GROUP BY 1, 2),
       |r AS (SELECT vec_id, label,
       |    ${rnd("dot / sqrt(nx * nc)", 6)} AS cos_to_centroid
       |  FROM s),
       |w AS (SELECT vec_id, label, cos_to_centroid, ROW_NUMBER() OVER (
       |    PARTITION BY label ORDER BY cos_to_centroid ASC, vec_id ASC) AS outlier_rank
       |  FROM r)
       |SELECT vec_id, label, cos_to_centroid, outlier_rank FROM w
       |WHERE outlier_rank <= $k""".stripMargin

  /** Feature-snapshot diff between two as-of cutoffs — mirrors
    * jobs/MigrationValidationJob.snapshotDiff. */
  def snapshotDiff(cutOld: String, cutNew: String): String =
    s"""WITH o AS (SELECT o_custkey AS user_id, COUNT(*) AS old_orders,
       |    ${sumMoney("TRUE", "o_totalprice")} AS old_spend
       |  FROM orders WHERE o_orderdate < TIMESTAMP '$cutOld' GROUP BY 1),
       |n AS (SELECT o_custkey AS user_id, COUNT(*) AS new_orders,
       |    ${sumMoney("TRUE", "o_totalprice")} AS new_spend
       |  FROM orders WHERE o_orderdate < TIMESTAMP '$cutNew' GROUP BY 1),
       |j AS (SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       |    o.old_orders, n.new_orders, o.old_spend, n.new_spend
       |  FROM o FULL JOIN n ON o.user_id = n.user_id),
       |s AS (SELECT user_id,
       |    CASE WHEN old_orders IS NULL THEN 'added'
       |         WHEN new_orders IS NULL THEN 'removed'
       |         WHEN old_orders <> new_orders OR old_spend <> new_spend THEN 'changed'
       |         ELSE 'unchanged' END AS status,
       |    COALESCE(old_orders, 0) AS old_orders,
       |    COALESCE(new_orders, 0) AS new_orders,
       |    COALESCE(old_spend, 0.0) AS old_spend,
       |    COALESCE(new_spend, 0.0) AS new_spend
       |  FROM j)
       |SELECT * FROM s WHERE status <> 'unchanged'""".stripMargin

  /** Cleaning-funnel survivor counts — mirrors ext/Corpus.cleaningFunnel
    * (quality gate over the textStats score, then exact dedup). */
  def corpusFunnel(minQuality: Double, minTokens: Int, maxTokens: Int): String =
    s"""WITH s AS ($textStats),
       |q AS (SELECT doc_id FROM s
       |      WHERE quality_score >= $minQuality
       |        AND token_count BETWEEN $minTokens AND $maxTokens),
       |qd AS (SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)),
       |k AS (SELECT md5(text) AS h, MIN(doc_id) AS keeper FROM qd GROUP BY 1)
       |SELECT '1_raw' AS stage, COUNT(*) AS docs FROM documents
       |UNION ALL SELECT '2_quality', COUNT(*) FROM q
       |UNION ALL SELECT '3_dedup', COUNT(*) FROM k""".stripMargin

  /** TF-IDF top terms — mirrors ext/TextAnalysis.tfidfTopTerms. idf is the
    * rational (N+1)/(df+1) (no libm log — see the Scala scaladoc); every
    * arithmetic step is the same IEEE op sequence as the Spark side. */
  def tfidfTopTerms(k: Int): String =
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, COUNT(*) AS doc_len FROM toks GROUP BY 1),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
       |    ${rnd(
        "(CAST(tf.tf AS DOUBLE) / CAST(dl.doc_len AS DOUBLE))" +
          " * ((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(dfreq.df AS DOUBLE) + 1.0))",
        4)} AS tfidf
       |  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n),
       |r AS (SELECT doc_id, term, tf, df, tfidf,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
       |  FROM scored)
       |SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= $k""".stripMargin

  /** Token-length histogram — mirrors ext/TextAnalysis.lengthHistogram. */
  def lengthHistogram(width: Int): String =
    s"""WITH b AS (SELECT source,
       |    CAST(floor(len(string_split(text, ' ')) / $width) * $width AS BIGINT) AS bucket_lo
       |  FROM documents),
       |c AS (SELECT source, bucket_lo, COUNT(*) AS n_docs FROM b GROUP BY 1, 2)
       |SELECT source, bucket_lo, n_docs,
       |  ${rnd(
        "CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE)",
        4)} AS share
       |FROM c""".stripMargin

  /** ROLLUP corpus accounting — mirrors ext/Corpus.sourceRollup. SUM(BIGINT)
    * pinned back to BIGINT (DuckDB widens to HUGEINT; the width-sensitive
    * driver hash would flag it — the event_sessions/pack_sequences bug
    * class). */
  val sourceRollup: String =
    s"""WITH d AS (SELECT source, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents)
       |SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  ${rnd("CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 4)} AS avg_tokens
       |FROM d GROUP BY ROLLUP (source, lang)""".stripMargin

  /** CUBE corpus accounting — mirrors ext/Corpus.sourceCube. Same BIGINT
    * pin as sourceRollup; lvl = 2*GROUPING(source)+GROUPING(lang) (the
    * GROUPING_ID encoding, spelled out so both engines agree on type). */
  val sourceCube: String =
    s"""WITH d AS (SELECT source, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents)
       |SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
       |  CAST(2 * GROUPING(source) + GROUPING(lang) AS INT) AS lvl,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM d GROUP BY CUBE (source, lang)""".stripMargin

  /** Event-type pivot — mirrors StreamAnalogJobs.eventTypePivot (pivot with
    * a pinned value list = one combinable pass of CASE aggregates). */
  val eventPivot: String = {
    val cols = graft.jobs.StreamAnalogJobs.EventTypes
      .map(t => s"  ${cntIf(s"event_type = '$t'")} AS n_$t")
      .mkString(",\n")
    s"""SELECT user_id,
       |$cols
       |FROM events GROUP BY user_id""".stripMargin
  }

  /** A/B experiment readout — mirrors StreamAnalogJobs.abMetric: the
    * shared Knuth unit-hash arm assignment over per-user aggregates,
    * DECIMAL-exact spend accumulation at both levels, lift computed from
    * the ROUNDED rates via a 2-row first_value window (identical to the
    * Spark side's __r staging). */
  def abMetric(controlFrac: Double = 0.5): String =
    s"""WITH pu AS (SELECT user_id,
       |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
       |    COALESCE(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS spend
       |  FROM events GROUP BY 1),
       |${unitHashCtes(", purchases, spend", "pu", "user_id")},
       |arms AS (SELECT
       |    CASE WHEN unit_hash < $controlFrac THEN 'A' ELSE 'B' END AS arm,
       |    purchases, spend FROM u),
       |g AS (SELECT arm, COUNT(*) AS n_users,
       |    COUNT(CASE WHEN purchases > 0 THEN 1 END) AS converted_users,
       |    CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS ss
       |  FROM arms GROUP BY 1),
       |g2 AS (SELECT arm, n_users, converted_users,
       |    ${rnd("CAST(converted_users AS DOUBLE) / CAST(n_users AS DOUBLE)", 6)}
       |      AS conversion_rate,
       |    ${rnd("ss / CAST(n_users AS DOUBLE)", 6)} AS avg_spend
       |  FROM g)
       |SELECT arm, n_users, converted_users, conversion_rate, avg_spend,
       |  ${rnd("conversion_rate - FIRST_VALUE(conversion_rate) OVER " +
      "(ORDER BY arm ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)", 6)}
       |    AS lift
       |FROM g2""".stripMargin

  /** Strict-ordered conversion funnel — mirrors
    * StreamAnalogJobs.eventFunnel: each stage joins the previous stage's
    * first-occurrence timestamps and keeps strictly-later events only;
    * conversion is against the first stage via a 3-row first_value
    * window. */
  def eventFunnel(steps: Seq[String] = Seq("view", "click", "purchase")): String = {
    val ctes = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"""s0 AS (SELECT user_id, MIN(ts) AS t FROM events
           |  WHERE event_type = '$step' GROUP BY 1)""".stripMargin
      else
        s"""s$i AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           |  JOIN s${i - 1} p ON e.user_id = p.user_id
           |  WHERE e.event_type = '$step' AND e.ts > p.t GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val counts = steps.zipWithIndex.map { case (step, i) =>
      s"SELECT $i AS stage_idx, '$step' AS stage, COUNT(*) AS n_users FROM s$i"
    }.mkString("\n  UNION ALL ")
    s"""WITH $ctes,
       |c AS ($counts)
       |SELECT stage_idx, stage, n_users,
       |  ${rnd("CASE WHEN FIRST_VALUE(n_users) OVER w > 0 THEN " +
      "CAST(n_users AS DOUBLE) / CAST(FIRST_VALUE(n_users) OVER w AS DOUBLE) END", 4)}
       |    AS pct_of_first
       |FROM c
       |WINDOW w AS (ORDER BY stage_idx
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin
  }

  /** Token-weighted systematic sample — mirrors ext/Corpus.weightedSample:
    * cumulative token spans in unit-hash order, a doc is picked iff its
    * span contains a sampling point (exact integer division; DuckDB's
    * windowed SUM widens to HUGEINT, pinned back to BIGINT). */
  def weightedSample(k: Int): String =
    s"""WITH ${unitHashCtes(", source, text")},
       |base AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, unit_hash
       |  FROM u),
       |c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY unit_hash, doc_id) AS hi FROM base),
       |t AS (SELECT SUM(n_tokens) AS w FROM base)
       |SELECT doc_id, source, n_tokens,
       |  CAST((hi * $k) // w - ((hi - n_tokens) * $k) // w AS BIGINT) AS n_picks
       |FROM c, t
       |WHERE (hi * $k) // w > ((hi - n_tokens) * $k) // w""".stripMargin

  /** Quantile normalization — mirrors ext/Corpus.quantileNormalize:
    * mid-rank quantile per distinct value from the count-by-value cumsum,
    * joined back to the corpus (ties share one quantile; n=1 pins 0.5). */
  def quantileNormalize(valueCol: String = "n_chars"): String =
    s"""WITH c AS (SELECT CAST($valueCol AS DOUBLE) AS v, COUNT(*) AS c
       |  FROM documents WHERE $valueCol IS NOT NULL GROUP BY 1),
       |m AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS hi FROM c),
       |t AS (SELECT SUM(c) AS n FROM c),
       |q AS (SELECT v,
       |    CASE WHEN n > 1 THEN
       |      CAST((hi - c) + hi - 1 AS DOUBLE) / (2.0 * CAST(n - 1 AS DOUBLE))
       |    ELSE 0.5 END AS qv
       |  FROM m, t)
       |SELECT d.doc_id, CAST(d.$valueCol AS DOUBLE) AS $valueCol,
       |  ${rnd("q.qv", 6)} AS quantile
       |FROM documents d JOIN q ON CAST(d.$valueCol AS DOUBLE) = q.v""".stripMargin

  /** Vocabulary growth (Heaps' law) — mirrors ext/Corpus.vocabGrowth:
    * 0-based doc position in doc_id order, exact-integer prefix bucket,
    * tokens counted at their first-appearance bucket, ≤B-row cumsum. */
  def vocabGrowth(buckets: Int = 10): String =
    s"""WITH p AS (SELECT doc_id, text,
       |    ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS pos FROM documents),
       |t AS (SELECT COUNT(*) AS n FROM documents),
       |b AS (SELECT CAST((p.pos * $buckets) // t.n AS INT) AS bucket,
       |    unnest(string_split(text, ' ')) AS token
       |  FROM p, t),
       |f AS (SELECT token, MIN(bucket) AS bucket FROM b GROUP BY 1),
       |c AS (SELECT bucket, COUNT(*) AS new_tokens FROM f GROUP BY 1)
       |SELECT bucket, new_tokens,
       |  CAST(SUM(new_tokens) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       |    AS BIGINT) AS cum_vocab
       |FROM c""".stripMargin

  /** Rolling z-score daily anomalies — mirrors
    * StreamAnalogJobs.dailyAnomalies: DECIMAL-exact daily totals cast
    * once to exactly-representable doubles, trailing sums as the SAME
    * fixed-association 7-term lag chain (a windowed SUM of the wide
    * squares diverges by an ulp across engines — decimal→double
    * double-rounding / window association order; see the job scaladoc),
    * full-week gate, zero-variance clamp, anomaly NULL coalesced to
    * FALSE on both sides. */
  def dailyAnomalies(zThreshold: Double = 2.0): String = {
    val lagTerms = (1 to 7)
    val cntExpr = lagTerms.map(i =>
      s"(CASE WHEN LAG(td, $i) OVER win IS NOT NULL THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val s1Expr = lagTerms.map(i => s"COALESCE(LAG(td, $i) OVER win, 0.0)")
      .mkString(" + ")
    val s2Expr = lagTerms.map(i =>
      s"COALESCE(LAG(td, $i) OVER win * LAG(td, $i) OVER win, 0.0)")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS t
       |  FROM orders GROUP BY 1),
       |d2 AS (SELECT order_date, CAST(t AS DOUBLE) AS td FROM daily),
       |w AS (
       |  SELECT order_date, td AS daily_total,
       |    CAST($cntExpr AS BIGINT) AS trailing_days,
       |    CAST($cntExpr AS DOUBLE) AS cnt,
       |    $s1Expr AS s1,
       |    $s2Expr AS s2
       |  FROM d2
       |  WINDOW win AS (ORDER BY order_date)),
       |z AS (
       |  SELECT order_date, daily_total, trailing_days,
       |    CASE WHEN trailing_days >= 1 THEN s1 / cnt END AS m,
       |    CASE WHEN trailing_days >= 2 THEN
       |      sqrt(GREATEST((cnt * s2 - s1 * s1) / (cnt * (cnt - 1.0)), 0.0))
       |    END AS sd
       |  FROM w)
       |SELECT order_date, daily_total, trailing_days,
       |  ${rnd("m", 4)} AS trailing_mean,
       |  ${rnd("sd", 4)} AS trailing_sd,
       |  ${rnd("CASE WHEN trailing_days = 7 AND sd > 0 THEN (daily_total - m) / sd END", 4)} AS z_score,
       |  COALESCE(CASE WHEN trailing_days = 7 AND sd > 0
       |    THEN abs((daily_total - m) / sd) > $zThreshold END, FALSE) AS is_anomaly
       |FROM z""".stripMargin
  }

  /** Daily totals + 7-row moving average + running total — mirrors
    * StreamAnalogJobs.movingDailyTotals (exact DECIMAL sums through the
    * frames, exact-sum ÷ exact-count average). */
  val movingDailyTotals: String =
    s"""WITH daily AS (
       |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       |    COUNT(*) AS n_orders,
       |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s
       |  FROM orders GROUP BY 1)
       |SELECT order_date, n_orders,
       |  CAST(s AS DOUBLE) AS daily_total,
       |  ${rnd("CAST(SUM(s) OVER w7 AS DOUBLE) / CAST(COUNT(*) OVER w7 AS DOUBLE)", 4)} AS avg_7d,
       |  CAST(SUM(s) OVER wcum AS DOUBLE) AS cum_total
       |FROM daily
       |WINDOW w7 AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       |  wcum AS (ORDER BY order_date ROWS UNBOUNDED PRECEDING)""".stripMargin

  def wordCounts(topN: Int): String =
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY token),
       |r AS (SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank
       |      FROM c)
       |SELECT token, n, rank FROM r WHERE rank <= $topN""".stripMargin

  /** Compat-mode transaction features: replicates the reference's vacuous
    * night predicate (BETWEEN 22 AND 6 ⇒ always false) byte-for-byte. */
  def transactionFeaturesCompat(asOf: Instant = AsOf.orders): String = {
    val base = transactionFeatures(asOf)
    base.replace(
      "(EXTRACT(hour FROM created_at) >= 22 OR EXTRACT(hour FROM created_at) < 6)",
      "(EXTRACT(hour FROM created_at) >= 22 AND EXTRACT(hour FROM created_at) <= 6)")
  }

  /** Knuth unitHash CTE chain (mirrors ext/Corpus.unitHash term for term;
    * same split-multiply overflow guard). Emits `u(doc_id, ..., unit_hash)`
    * carrying `extraCols` through from documents. `hashExpr` overrides the
    * hashed input (the seeded-sample XOR fold) while `idCol` stays the
    * carried-through key column. */
  private def unitHashCtes(extraCols: String, table: String = "documents",
                           idCol: String = "doc_id",
                           hashExpr: String = ""): String = {
    val hx = if (hashExpr.isEmpty) idCol else hashExpr
    s"""uh0 AS (SELECT $idCol$extraCols,
       |    ((($hx) % 4294967296) + 4294967296) % 4294967296 AS a
       |  FROM $table),
       |uh1 AS (SELECT *, CAST(floor(a / 65536) AS BIGINT) AS h FROM uh0),
       |u AS (SELECT * EXCLUDE (a, h),
       |    CAST((((h * 2654435761) % 65536) * 65536
       |      + (a - h * 65536) * 2654435761) % 4294967296 AS DOUBLE)
       |      / 4294967296.0 AS unit_hash
       |  FROM uh1)""".stripMargin
  }

  /** Per-source document quota — mirrors ext/Corpus.sourceQuota (unitHash
    * admission order with doc_id tie-break; `prior_docs` < cap membership;
    * the oracle's global ROW_NUMBER equals the engine's two-phase chunked
    * prefix because floor(h·64) chunk order is consistent with h order). */
  def sourceQuota(caps: Seq[(String, Long)], defaultCap: Long): String = {
    val capExpr = caps.map { case (s, c) => s"WHEN source = '$s' THEN $c" }
      .mkString("CASE ", " ", s" ELSE $defaultCap END")
    s"""WITH ${unitHashCtes(", source")},
       |r AS (SELECT doc_id, source, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY source ORDER BY unit_hash, doc_id) - 1 AS BIGINT)
       |    AS prior_docs FROM u)
       |SELECT doc_id, source, prior_docs FROM r
       |WHERE prior_docs < $capExpr""".stripMargin
  }

  /** BPE first-round merge candidates — mirrors ext/Vocab.charPairStats
    * (occurrence-weighted adjacent char pairs over the distinct-word frame;
    * top-k with the (count desc, pair asc) total-order tie-break; SUM
    * pinned to BIGINT). */
  def bpeMergePairs(k: Int): String =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |wf AS (SELECT word, COUNT(*) AS wcount FROM w WHERE len(word) > 0 GROUP BY 1),
       |p AS (SELECT substr(word, i, 2) AS pair, wcount
       |  FROM wf CROSS JOIN UNNEST(generate_series(1, len(word) - 1)) AS t(i)
       |  WHERE len(word) >= 2),
       |agg AS (SELECT pair, CAST(SUM(wcount) AS BIGINT) AS pair_count
       |  FROM p GROUP BY 1)
       |SELECT pair, pair_count FROM agg
       |ORDER BY pair_count DESC, pair ASC LIMIT $k""".stripMargin

  /** Model-based quality score — mirrors ext/TextAnalysis.modelQualityScore
    * (integer weak label by cross-multiplication, label-split dfs from the
    * one tf grain, integer evidence sums, single rounded division; BIGINT
    * pins on every SUM). */
  val qualityModel: String = {
    val stop = "('the','a','of','and','to','in','is')"
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents WHERE doc_id IS NOT NULL),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM t WHERE term IS NOT NULL GROUP BY 1, 2),
       |lab AS (SELECT doc_id, CASE WHEN 5 * COALESCE(SUM(CASE WHEN term IN
       |    $stop THEN tf END), 0) >= SUM(tf) THEN 1 ELSE 0 END AS is_pos
       |  FROM tf GROUP BY 1),
       |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_all,
       |    CAST(SUM(is_pos) AS BIGINT) AS df_pos
       |  FROM tf JOIN lab USING (doc_id) GROUP BY 1),
       |agg AS (SELECT tf.doc_id,
       |    CAST(SUM(df.df_pos) AS BIGINT) AS pos_evidence,
       |    CAST(SUM(df.df_all) AS BIGINT) AS total_evidence
       |  FROM tf JOIN df USING (term) GROUP BY 1)
       |SELECT doc_id, pos_evidence, total_evidence,
       |  ${rnd("CAST(pos_evidence AS DOUBLE) / total_evidence", 6)} AS model_score,
       |  2 * pos_evidence >= total_evidence AS model_keep
       |FROM agg""".stripMargin
  }

  /** Hot-key certainty envelope — mirrors jobs/StreamAnalogJobs.hotKeys
    * (deterministic hot-entity overlay on the uniform event stream; exact
    * counts for true hot keys; the sketch booleans are theorems of the
    * SpaceSaving summary, so TRUE here). */
  def heavyHitters(capacity: Int): String =
    s"""WITH k AS (SELECT CASE WHEN event_id % 4 < 3
       |    THEN 'u' || CAST(user_id % 4 AS VARCHAR)
       |    ELSE 'u' || CAST(user_id + 100 AS VARCHAR) END AS entity
       |  FROM events),
       |c AS (SELECT entity, CAST(COUNT(*) AS BIGINT) AS n_events FROM k GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM k)
       |SELECT entity, n_events, TRUE AS sketch_found, TRUE AS est_within_bounds
       |FROM c, n WHERE n_events * $capacity > n""".stripMargin

  /** Cohort retention — mirrors jobs/StreamAnalogJobs.cohortRetention
    * (distinct (user, day) activity, min-day cohorts, integer counts,
    * one rounded division; BIGINT pins). */
  val cohortRetention: String =
    s"""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
       |coh AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1),
       |sizes AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
       |  FROM coh GROUP BY 1),
       |r AS (SELECT coh.cohort_day,
       |    CAST(act.day - coh.cohort_day AS BIGINT) AS day_offset,
       |    CAST(COUNT(*) AS BIGINT) AS active_users
       |  FROM act JOIN coh USING (user_id) GROUP BY 1, 2)
       |SELECT CAST(r.cohort_day AS VARCHAR) AS cohort_day, day_offset,
       |  active_users, cohort_size,
       |  ${rnd("CAST(active_users AS DOUBLE) / cohort_size", 6)} AS retention_rate
       |FROM r JOIN sizes USING (cohort_day)""".stripMargin

  /** Per-group k-sample — mirrors ext/Corpus.groupSample (unitHash order
    * with doc_id tie-break inside each source; BIGINT rank pin). */
  def groupSample(k: Int): String =
    s"""WITH ${unitHashCtes(", source")},
       |r AS (SELECT doc_id, source,
       |    CAST(row_number() OVER (
       |      PARTITION BY source ORDER BY unit_hash, doc_id) AS BIGINT)
       |      AS sample_rank
       |  FROM u)
       |SELECT doc_id, source, sample_rank FROM r
       |WHERE sample_rank <= $k""".stripMargin

  /** Click→purchase attribution — mirrors jobs/StreamAnalogJobs
    * .clickAttribution (left interval join on user within 1h, argmax-free
    * aggregates; second-truncated epoch diff per the F7 idiom; BIGINT
    * count pin). */
  val clickAttribution: String =
    """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
      |    value AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id,
      |  strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  p.purchase_value,
      |  CAST(COUNT(c.click_id) AS BIGINT) AS n_clicks_1h,
      |  CAST(epoch(date_trunc('second', p.purchase_ts)) AS BIGINT)
      |    - CAST(epoch(date_trunc('second', MAX(c.click_ts))) AS BIGINT)
      |    AS last_click_gap_s,
      |  COUNT(c.click_id) > 0 AS attributed
      |FROM p LEFT JOIN c ON c.user_id = p.user_id
      |  AND c.click_ts <= p.purchase_ts
      |  AND c.click_ts > p.purchase_ts - INTERVAL '1 hour'
      |GROUP BY p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value""".stripMargin

  /** Rolling-distinct envelope — mirrors jobs/StreamAnalogJobs
    * .rollingDistinctUsers (exact 7-day distinct users per day; the merged
    * HLL estimate is engine-specific, so the oracle-visible column is the
    * envelope boolean, TRUE here — the approxDistinct pattern). */
  val rollingDistinct: String =
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day AS d FROM e)
      |SELECT CAST(d AS VARCHAR) AS day,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_users_7d,
      |  CAST(COUNT(DISTINCT e.day) AS BIGINT) AS days_merged,
      |  TRUE AS approx_within_bound
      |FROM days JOIN e ON e.day BETWEEN d - 6 AND d
      |GROUP BY d""".stripMargin

  /** Near-dup leakage across splits — mirrors ext/Corpus.splitLeakage
    * (verified Jaccard pairs ⋈ splitAssign on both endpoints). */
  def splitLeakage(threshold: Double, trainFrac: Double, valFrac: Double): String =
    s"""WITH ${jaccardCtes(threshold)},
       |${unitHashCtes(", source")},
       |sp AS (SELECT doc_id,
       |    CASE WHEN unit_hash < $trainFrac THEN 'train'
       |         WHEN unit_hash < ${trainFrac + valFrac} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM u),
       |e AS (SELECT LEAST(sa.split, sb.split) AS split_lo,
       |    GREATEST(sa.split, sb.split) AS split_hi
       |  FROM jp JOIN sp sa ON jp.doc_a = sa.doc_id
       |  JOIN sp sb ON jp.doc_b = sb.doc_id)
       |SELECT split_lo, split_hi, COUNT(*) AS pair_count,
       |  split_lo <> split_hi AS leaky
       |FROM e GROUP BY 1, 2""".stripMargin

  /** Shard manifest — mirrors ext/Corpus.shardManifest (unitHash shard,
    * SUMs pinned to BIGINT against DuckDB's HUGEINT widening). */
  def shardManifest(shards: Int): String =
    s"""WITH ${unitHashCtes(", n_chars, len(string_split(text, ' ')) AS n_tokens")},
       |s AS (SELECT CAST(floor(unit_hash * $shards) AS BIGINT) AS shard,
       |    n_chars, n_tokens FROM u),
       |per AS (SELECT shard, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |  FROM s GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs FROM per)
       |SELECT shard, n_docs, total_tokens, total_chars,
       |  ${rnd(s"CAST(n_docs AS DOUBLE) * $shards / CAST(all_docs AS DOUBLE)", 4)}
       |    AS load_factor
       |FROM per CROSS JOIN tot""".stripMargin

  /** Bigram familiarity — mirrors ext/TextAnalysis.bigramFamiliarity
    * (distinct bigrams per doc via the n=2 ngram rule incl. the short-doc
    * whole-text degrade; document frequency joined back; SUMs pinned). */
  val bigramFamiliarity: String = {
    val bigrams =
      """CASE WHEN len(t) >= 2 THEN list_distinct(list_transform(
        |  generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1]))
        |ELSE [text] END""".stripMargin
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
       |bg AS (SELECT doc_id, unnest($bigrams) AS bigram FROM d),
       |dfreq AS (SELECT bigram, COUNT(*) AS df FROM bg GROUP BY 1),
       |a AS (SELECT bg.doc_id, COUNT(*) AS n_bigrams,
       |    CAST(SUM(df) AS BIGINT) AS df_sum,
       |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rare_count
       |  FROM bg JOIN dfreq USING (bigram) GROUP BY 1)
       |SELECT doc_id, n_bigrams,
       |  ${rnd("CAST(df_sum AS DOUBLE) / n_bigrams", 4)} AS avg_df,
       |  ${rnd("CAST(rare_count AS DOUBLE) / n_bigrams", 4)} AS rare_ratio
       |FROM a""".stripMargin
  }

  /** Incremental near-dup candidates — mirrors ext/Dedup.incrementalPairs
    * (unitHash tail = the new batch; index side capped, intra self-join
    * capped on the new side; cross pairs canonicalized LEAST/GREATEST). */
  def incrementalPairs(newFrac: Double): String = {
    val sigs = (0 until 4).map(i => s"min(md5('$i|' || sh)) AS h$i").mkString(", ")
    val bandSel = (0 until 4).map(i => s"SELECT doc_id, $i AS band, h$i AS h FROM sig")
      .mkString("\n  UNION ALL ")
    val cut = 1.0 - newFrac
    val cap = graft.ext.Dedup.MaxBucket
    s"""WITH t AS (SELECT doc_id,
       |    unnest(${shingleExpr("string_split(text, ' ')", "text")}) AS sh
       |  FROM documents),
       |sig AS (SELECT doc_id, $sigs FROM t GROUP BY doc_id),
       |bands AS ($bandSel),
       |${unitHashCtes("")},
       |nb AS (SELECT b.* FROM bands b JOIN u USING (doc_id)
       |  WHERE u.unit_hash >= $cut),
       |ob AS (SELECT b.* FROM bands b JOIN u USING (doc_id)
       |  WHERE u.unit_hash < $cut),
       |okO AS (SELECT band, h FROM ob GROUP BY band, h HAVING COUNT(*) <= $cap),
       |keptO AS (SELECT ob.* FROM ob JOIN okO USING (band, h)),
       |okN AS (SELECT band, h FROM nb GROUP BY band, h HAVING COUNT(*) <= $cap),
       |keptN AS (SELECT nb.* FROM nb JOIN okN USING (band, h)),
       |xp AS (SELECT DISTINCT LEAST(x.doc_id, y.doc_id) AS doc_a,
       |    GREATEST(x.doc_id, y.doc_id) AS doc_b, 'cross' AS kind
       |  FROM nb x JOIN keptO y ON x.band = y.band AND x.h = y.h),
       |ip AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    'intra' AS kind
       |  FROM keptN x JOIN keptN y
       |  ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id)
       |SELECT * FROM xp UNION ALL SELECT * FROM ip""".stripMargin
  }

  /** Gopher-style composite curation gate — mirrors ext/TextAnalysis.
    * curationGate (stats + bigram repetition + OOV joined on doc_id; the
    * repetition side is a LEFT join with COALESCE 0 for <2-token docs). */
  def curationGate(minTokens: Int, maxTokens: Int, minQuality: Double,
                   maxTopBigram: Double, vocabSize: Int, maxOov: Double): String = {
    val stop = "('the','a','of','and','to','in','is')"
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |st AS (SELECT doc_id, len(t) AS token_count,
       |    floor((LEAST(1.0, CAST(len(t) AS DOUBLE) / 100) * 0.4
       |      + (1.0 - CAST(len(list_filter(t, x -> x IN $stop)) AS DOUBLE) / len(t)) * 0.3
       |      + CAST(len(list_distinct(t)) AS DOUBLE) / len(t) * 0.3) * 10000.0 + 0.5) / 10000.0
       |      AS quality_score
       |  FROM d),
       |bgr AS (SELECT doc_id, len(t) AS n_tokens,
       |    unnest(list_transform(range(1, len(t)),
       |      i -> t[i] || ' ' || t[i+1])) AS bigram
       |  FROM d WHERE len(t) >= 2),
       |bc AS (SELECT doc_id, n_tokens, bigram, COUNT(*) AS c FROM bgr GROUP BY 1, 2, 3),
       |rep AS (SELECT doc_id,
       |    ${rnd("CAST(MAX(c) AS DOUBLE) / (n_tokens - 1)", 4)} AS top_bigram_ratio
       |  FROM bc GROUP BY doc_id, n_tokens),
       |tok AS (SELECT doc_id, unnest(t) AS token FROM d),
       |tc AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
       |v AS (SELECT token FROM tc ORDER BY n DESC, token ASC LIMIT $vocabSize),
       |ov AS (SELECT tok.doc_id, COUNT(*) AS token_count,
       |    CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov
       |  FROM tok LEFT JOIN v ON tok.token = v.token GROUP BY 1),
       |oo AS (SELECT doc_id,
       |    ${rnd("CAST(oov AS DOUBLE) / token_count", 4)} AS oov_rate
       |  FROM ov),
       |g AS (SELECT st.doc_id,
       |    st.token_count < $minTokens AS too_short,
       |    st.token_count > $maxTokens AS too_long,
       |    st.quality_score < $minQuality AS low_quality,
       |    COALESCE(rep.top_bigram_ratio, 0.0) > $maxTopBigram AS repetitive,
       |    oo.oov_rate > $maxOov AS high_oov
       |  FROM st LEFT JOIN rep USING (doc_id) JOIN oo USING (doc_id))
       |SELECT *, NOT (too_short OR too_long OR low_quality OR repetitive OR high_oov)
       |  AS keep
       |FROM g""".stripMargin
  }

  /** Overlapping token-window chunking — mirrors ext/Corpus.chunkWindows
    * (stride-multiple starts below doc length, end-truncated windows,
    * md5 fingerprints; DuckDB lists slice 1-based inclusive). */
  def chunkWindows(chunk: Int, stride: Int): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |d2 AS (SELECT doc_id, t, len(t) AS n FROM d),
       |g AS (SELECT doc_id, t, n,
       |    unnest(generate_series(0, (n - 1) // $stride)) AS chunk_idx
       |  FROM d2)
       |SELECT doc_id, chunk_idx,
       |  chunk_idx * $stride AS chunk_start,
       |  LEAST($chunk, n - chunk_idx * $stride) AS n_tokens,
       |  md5(array_to_string(
       |    t[chunk_idx * $stride + 1 : chunk_idx * $stride + $chunk], ' ')) AS chunk_fp
       |FROM g""".stripMargin

  /** DSIR importance weights — mirrors ext/Corpus.dsirWeights term for
    * term: 256 hash buckets from the first two md5 hex nibbles (ascii
    * arithmetic, no conv()), raw-occurrence bigram counts, add-one-smoothed
    * integer masses, and the SAME fixed-shape double expression for the
    * score (association order matters for cross-engine bit-equality).
    * SUMs cast to BIGINT (DuckDB widens to HUGEINT). */
  def dsirWeights(targetPred: String): String = {
    def nib(i: Int) =
      s"""(CASE WHEN substr(h, $i, 1) <= '9' THEN ascii(substr(h, $i, 1)) - 48
         | ELSE ascii(substr(h, $i, 1)) - 87 END)""".stripMargin.replace("\n", "")
    s"""WITH t AS (SELECT doc_id, ($targetPred) AS is_target,
       |    string_split(text, ' ') AS toks FROM documents),
       |bg AS (SELECT doc_id, is_target,
       |    md5(toks[i+1] || ' ' || toks[i+2]) AS h
       |  FROM t, unnest(generate_series(0, len(toks) - 2)) AS u(i)
       |  WHERE len(toks) >= 2),
       |pd AS (SELECT doc_id, is_target, ${nib(1)} * 16 + ${nib(2)} AS bucket,
       |    COUNT(*) AS cnt FROM bg GROUP BY 1, 2, 3),
       |g AS (SELECT bucket, SUM(cnt) AS r_cnt,
       |    SUM(CASE WHEN is_target THEN cnt ELSE 0 END) AS t_cnt
       |  FROM pd GROUP BY 1),
       |tot AS (SELECT SUM(r_cnt) AS r_tot, SUM(t_cnt) AS t_tot FROM g),
       |agg AS (SELECT doc_id, is_target, r_tot, t_tot,
       |    CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(cnt * (t_cnt + 1)) AS BIGINT) AS t_mass,
       |    CAST(SUM(cnt * (r_cnt + 1)) AS BIGINT) AS r_mass
       |  FROM pd JOIN g USING (bucket), tot
       |  GROUP BY doc_id, is_target, r_tot, t_tot)
       |SELECT doc_id, is_target, n_bigrams, t_mass, r_mass,
       |  ${rnd("(CAST(t_mass AS DOUBLE) * CAST(r_tot + 256 AS DOUBLE)) / (CAST(r_mass AS DOUBLE) * CAST(t_tot + 256 AS DOUBLE))", 4)} AS dsir_score
       |FROM agg""".stripMargin
  }

  /** DSIR resampling — mirrors ext/Corpus.dsirResample: the dsirWeights
    * output quantized to an integer weight (floor(score·10⁴+0.5)), then
    * the SAME systematic span sampler as weighted_sample (global cumsum
    * over (unit_hash, doc_id) order ≡ the engine's chunked two-phase
    * prefix, the sourceQuota/weightedSample equivalence). */
  def dsirResample(targetPred: String, k: Int): String =
    s"""WITH d AS (SELECT * FROM (${dsirWeights(targetPred)}) dw),
       |w0 AS (SELECT doc_id, dsir_score,
       |    CAST(floor(dsir_score * 10000.0 + 0.5) AS BIGINT) AS w_int FROM d),
       |${unitHashCtes(", dsir_score, w_int", "w0", "doc_id")},
       |c AS (SELECT *, SUM(w_int) OVER (ORDER BY unit_hash, doc_id) AS hi FROM u),
       |t AS (SELECT SUM(w_int) AS wt FROM w0)
       |SELECT doc_id, dsir_score, w_int,
       |  CAST((hi * $k) // wt - ((hi - w_int) * $k) // wt AS BIGINT) AS n_picks
       |FROM c, t
       |WHERE (hi * $k) // wt > ((hi - w_int) * $k) // wt""".stripMargin

  /** Temperature-smoothed mixture weights — mirrors ext/Corpus.
    * mixtureWeights (α=1/2 via correctly-rounded sqrt; Σ√tokens as a
    * DECIMAL sum; boost from the rounded shares; SUMs pinned to BIGINT). */
  val mixtureWeights: String =
    s"""WITH per AS (SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS all_tokens,
       |    SUM(CAST(sqrt(CAST(total_tokens AS DOUBLE)) AS DECIMAL(27,10))) AS sqrt_sum
       |  FROM per),
       |s AS (SELECT source, n_docs, total_tokens,
       |    ${rnd("CAST(total_tokens AS DOUBLE) / CAST(all_tokens AS DOUBLE)", 6)}
       |      AS natural_share,
       |    ${rnd("sqrt(CAST(total_tokens AS DOUBLE)) / CAST(sqrt_sum AS DOUBLE)", 6)}
       |      AS smoothed_share
       |  FROM per CROSS JOIN tot)
       |SELECT source, n_docs, total_tokens, natural_share, smoothed_share,
       |  ${rnd("smoothed_share / natural_share", 4)} AS boost
       |FROM s""".stripMargin

  /** Quality-decile tiers — mirrors ext/TextAnalysis.qualityTiers. The
    * oracle uses the single global rank window (fine at oracle scale); the
    * engine's two-phase offset+local-rank decomposition produces the
    * identical total order (score, doc_id), so the tiers agree exactly. */
  def qualityTiers(tiers: Int): String = {
    val stop = "('the','a','of','and','to','in','is')"
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |q0 AS (SELECT doc_id, len(t) AS n_tokens,
       |    floor((LEAST(1.0, CAST(len(t) AS DOUBLE) / 100) * 0.4
       |      + (1.0 - CAST(len(list_filter(t, x -> x IN $stop)) AS DOUBLE) / len(t)) * 0.3
       |      + CAST(len(list_distinct(t)) AS DOUBLE) / len(t) * 0.3) * 10000.0 + 0.5) / 10000.0 AS q
       |  FROM d),
       |r AS (SELECT doc_id, n_tokens, q,
       |    ROW_NUMBER() OVER (ORDER BY q, doc_id) AS rank,
       |    COUNT(*) OVER () AS n
       |  FROM q0),
       |tiered AS (SELECT *,
       |    CAST(floor(((rank - 1) * $tiers) / CAST(n AS DOUBLE)) AS INT) + 1 AS tier
       |  FROM r)
       |SELECT tier, COUNT(*) AS n_docs, MIN(q) AS min_quality, MAX(q) AS max_quality,
       |  ${rnd("CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE) / COUNT(*)", 4)} AS avg_tokens
       |FROM tiered GROUP BY 1""".stripMargin
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
