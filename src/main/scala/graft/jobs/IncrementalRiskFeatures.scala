package graft.jobs

import java.time.{Instant, LocalDate}
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{AsOf, Roles}
import graft.ops.Ops._

/** Incremental maintenance of RiskFeaturesJob — the THIRD and widest
  * incremental family: the 5-way fan (sql/risk_features.sql:1-110). The
  * other two families maintain ONE aggregate's state; here every CTE gets
  * its own day-grained state and the fan-in replays unchanged on top —
  * incrementalizing a multi-source job is per-source state maintenance,
  * nothing more. The reference recomputes all five scans nightly
  * (src/pipelines/batch_pipeline.py:192-199); at 100 TB that is re-reading
  * ~91 days of payments and ~31 days of four event roles for a result that
  * changed by one day. Here the daily work is five day-partition-pruned
  * delta scans plus merges into summary tables bounded by active users ×
  * their per-day entity fan.
  *
  * Per-CTE state shapes (each grain contains its day, so a day's re-run
  * REPLACES its own buckets — the idempotent day-bucket family):
  *
  *   - payments → (user_id, created_day, payment_day): delayed/failed/row
  *     counts. TWO day columns because the job cuts on BOTH clocks
  *     (created_at for the 91d scan + failed_payments window, payment_date
  *     for the 30/90d delay windows); the delayed flag compares against the
  *     row-level due_date, folded into the bucket count at summarize time.
  *   - logins → (user_id, day, kind, entity): COUNT(DISTINCT device_id) and
  *     COUNT(DISTINCT ip_address) cannot be maintained as counters
  *     (distincts don't merge — the A6 analogue of the merchant trick), so
  *     the DISTINCT ENTITY lives in the grain, unpivoted to (kind, entity)
  *     rows so one state serves both columns. Null entities are dropped at
  *     summarize time: count_distinct skips them in the full job, and a
  *     null grain key would break MergeByKey's equality-join replacement.
  *   - alerts → (user_id, day): velocity count + total alert count (the
  *     total is load-bearing: the active-user UNION probes raw alerts at a
  *     1d horizon, so bucket EXISTENCE must cover all alerts, not just
  *     velocity ones).
  *   - credit/scores → (user_id, day) + the bucket's argmax row: DISTINCT
  *     ON (user) latest-row is hierarchically decomposable — the global
  *     argmax by (ts desc, id desc) is the argmax over per-day argmaxes —
  *     so each bucket keeps its winning row whole (max_by over the same
  *     (ts, id) total order; ids are unique, so the election is
  *     deterministic without a tie-break).
  *
  * EXACTNESS: both anchors are midnight UTC (checked, not assumed), so
  * every `ts >= anchor − Nd` timestamp cut is EXACTLY a day-grain cut and
  * the bucket predicates are the identical predicates. The ladder is
  * pinned cell-exact against the full recompute (IncrementalFeaturesSpec)
  * and against DuckDB's full recompute as the risk_features_incremental
  * oracle query — the same SQL as risk_features, because incremental ≡
  * full IS the claim.
  *
  * SCALE: every state hashes on user_id first; deltas are day-range
  * predicates (pushed to the scans — partition pruning once the logs are
  * date-partitioned); featuresFromState re-aggregates summary rows only.
  */
object IncrementalRiskFeatures {

  val paymentGrain: Seq[String] = Seq("user_id", "created_day", "payment_day")
  val loginGrain: Seq[String]   = Seq("user_id", "day", "kind", "entity")
  val dayGrain: Seq[String]     = Seq("user_id", "day")

  private def dayLit(d: LocalDate) = lit(java.sql.Date.valueOf(d))

  private def midnight(asOf: Instant): LocalDate = {
    require(asOf.truncatedTo(ChronoUnit.DAYS) == asOf,
      s"incremental day-grain state needs a midnight-aligned anchor: $asOf")
    AsOf.date(asOf)
  }

  // ---- per-CTE summarizers (ANY slice → state grain; slice boundaries
  // must fall on the slicing column's day boundaries) ----

  def summarizePayments(pay: DataFrame): DataFrame =
    pay.groupBy(col("user_id"),
        to_date(col("created_at")).as("created_day"),
        to_date(col("payment_date")).as("payment_day"))
      .agg(
        countIf(col("payment_date") > col("due_date")).as("delayed_cnt"),
        countIf(col("status") === "failed").as("failed_cnt"),
        count(lit(1)).as("pay_cnt"))

  def summarizeLogins(logins: DataFrame): DataFrame =
    logins.select(col("user_id"), to_date(col("created_at")).as("day"),
        explode(array(
          struct(lit("device").as("kind"), col("device_id").cast("string").as("entity")),
          struct(lit("ip").as("kind"), col("ip_address").cast("string").as("entity"))))
          .as("__e"))
      .select(col("user_id"), col("day"), col("__e.kind"), col("__e.entity"))
      .filter(col("entity").isNotNull)
      .groupBy(loginGrain.map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  def summarizeAlerts(alerts: DataFrame): DataFrame =
    alerts.groupBy(col("user_id"), to_date(col("created_at")).as("day"))
      .agg(
        countIf(col("alert_type") === "velocity").as("velocity_cnt"),
        count(lit(1)).as("alert_cnt"))

  def summarizeCredit(credit: DataFrame): DataFrame =
    credit.groupBy(col("user_id"), to_date(col("report_date")).as("day"))
      .agg(max_by(
        struct(col("report_date"), col("report_id"),
          col("credit_utilization_ratio")),
        struct(col("report_date"), col("report_id"))).as("__top"))
      .select(col("user_id"), col("day"), col("__top.report_date"),
        col("__top.report_id"), col("__top.credit_utilization_ratio"))

  def summarizeScores(scores: DataFrame): DataFrame =
    scores.groupBy(col("user_id"), to_date(col("computed_at")).as("day"))
      .agg(max_by(
        struct(col("computed_at"), col("score_id"), col("risk_score")),
        struct(col("computed_at"), col("score_id"))).as("__top"))
      .select(col("user_id"), col("day"), col("__top.computed_at"),
        col("__top.score_id"), col("__top.risk_score"))

  /** Fold a day delta into a state: day-in-grain makes this a replace of
    * the delta's own buckets — replays idempotent, same discipline as
    * IncrementalTransactionFeatures.applyDelta. */
  def applyDelta(state: DataFrame, delta: DataFrame,
                 grain: Seq[String]): DataFrame =
    graft.sinks.MergeByKey.merge(state, delta, grain)

  /** All five state tables, as one bundle. */
  final case class States(payments: DataFrame, logins: DataFrame,
                          alerts: DataFrame, credit: DataFrame,
                          scores: DataFrame)

  /** Output-identical to RiskFeaturesJob.compute at the same anchors:
    * each CTE replays from its state with day-grain cuts, then the same
    * 5-way left fan-in. */
  def featuresFromState(st: States, users: DataFrame,
                        asOfPay: Instant, asOfEv: Instant): DataFrame = {
    val dP = midnight(asOfPay)
    val dE = midnight(asOfEv)

    // payment_history: 91d scan cut on created_day; delay windows on
    // payment_day; failed window on created_day. countIf-over-rows becomes
    // sum-of-bucket-counts (sum() is null on all-null — coalesce restores
    // countIf's 0).
    val paymentHistory = st.payments
      .filter(col("created_day") >= dayLit(dP.minusDays(91)))
      .groupBy("user_id").agg(
        coalesce(sum(when(col("payment_day") >= dayLit(dP.minusDays(30)),
          col("delayed_cnt"))), lit(0L)).as("payment_delays_30d"),
        coalesce(sum(when(col("payment_day") >= dayLit(dP.minusDays(90)),
          col("delayed_cnt"))), lit(0L)).as("payment_delays_90d"),
        coalesce(sum(when(col("created_day") >= dayLit(dP.minusDays(90)),
          col("failed_cnt"))), lit(0L)).as("failed_payments_count"))

    // device_behavior: a device seen on several days appears in several
    // buckets — count_distinct over bucket rows collapses them, exactly
    // like the full job's distinct over raw rows.
    val in30E = col("day") >= dayLit(dE.minusDays(30))
    val deviceBehavior = st.logins
      .filter(col("day") >= dayLit(dE.minusDays(31)))
      .groupBy("user_id").agg(
        count_distinct(when(in30E && col("kind") === "device", col("entity")))
          .as("device_changes_30d"),
        count_distinct(when(in30E && col("kind") === "ip", col("entity")))
          .as("login_locations_30d"))

    val velocityPatterns = st.alerts
      .filter(col("day") >= dayLit(dE.minusDays(31)))
      .groupBy("user_id").agg(
        coalesce(sum(when(in30E, col("velocity_cnt"))), lit(0L))
          .as("velocity_alerts_30d"))

    // DISTINCT ON latest: global argmax = argmax over per-day bucket
    // argmaxes (same (ts desc, id desc) order the buckets were elected on)
    val creditInfo = topOnePerKey(
      st.credit.filter(col("day") >= dayLit(dE.minusDays(30))),
      Seq(col("user_id")), Seq(col("report_date").desc, col("report_id").desc))
      .select("user_id", "credit_utilization_ratio")

    val latestScores = topOnePerKey(
      st.scores.filter(col("day") >= dayLit(dE.minusDays(7))),
      Seq(col("user_id")), Seq(col("computed_at").desc, col("score_id").desc))
      .select("user_id", "risk_score")

    // active_risk_users: every payment bucket holds ≥1 row, and alert_cnt
    // covers ALL alert types — bucket existence at the 1d horizon is
    // exactly the raw-row existence the full job probes
    val active = unionDistinct(
      users.filter(col("recently_updated")).select("user_id"),
      st.payments.filter(col("created_day") >= dayLit(dP.minusDays(1)))
        .select("user_id"),
      st.alerts.filter(col("day") >= dayLit(dE.minusDays(1)))
        .select("user_id"))

    val asOfTs = to_timestamp(lit(AsOf.ts(asOfPay)))
    active
      .join(paymentHistory, Seq("user_id"), "left")
      .join(deviceBehavior, Seq("user_id"), "left")
      .join(velocityPatterns, Seq("user_id"), "left")
      .join(creditInfo, Seq("user_id"), "left")
      .join(latestScores, Seq("user_id"), "left")
      .select(
        col("user_id"),
        orZeroD(col("credit_utilization_ratio")).as("credit_utilization_ratio"),
        orZero(col("payment_delays_30d")).as("payment_delays_30d"),
        orZero(col("payment_delays_90d")).as("payment_delays_90d"),
        orZero(col("failed_payments_count")).as("failed_payments_count"),
        orZero(col("device_changes_30d")).as("device_changes_30d"),
        orZero(col("login_locations_30d")).as("login_locations_30d"),
        orZero(col("velocity_alerts_30d")).as("velocity_alerts_30d"),
        orZeroD(col("risk_score")).as("risk_score"),
        asOfTs.as("created_at"),
        asOfTs.as("updated_at"))
  }

  /** Backfill-then-step one source on its own clock: state < anchor−days,
    * one delta per day (pushable day-range predicates), anchor-day tail
    * (the batch job's scan has no upper bound). */
  private def sliced(src: DataFrame, tsCol: String, anchor: LocalDate,
                     days: Int, summarize: DataFrame => DataFrame,
                     grain: Seq[String]): DataFrame = {
    val cut = anchor.minusDays(days.toLong)
    val base = summarize(src.filter(col(tsCol) < dayLit(cut)))
    val stepped = (0 until days).foldLeft(base) { (st, i) =>
      val d = cut.plusDays(i.toLong)
      applyDelta(st, summarize(src.filter(
        col(tsCol) >= dayLit(d) && col(tsCol) < dayLit(d.plusDays(1)))), grain)
    }
    applyDelta(stepped, summarize(src.filter(col(tsCol) >= dayLit(anchor))),
      grain)
  }

  /** The 3-day ladder the oracle adjudicates: five per-source ladders —
    * payments on the lineitem clock, the four event roles on the events
    * clock — then features from state. States ride FeatureCache at the
    * default anchors (the stored-table posture; featuresFromState consumes
    * the payment and alert states twice — stats + the active set — and the
    * cache shares one evaluation; ScanAuditSpec pins the warm budget). */
  def ladder(spark: SparkSession, dir: String, days: Int = 3,
             asOfPay: Instant = AsOf.lineitem,
             asOfEv: Instant = AsOf.events): DataFrame = {
    val dP = midnight(asOfPay)
    val dE = midnight(asOfEv)
    def state(key: String, build: => DataFrame): DataFrame =
      if (asOfPay == AsOf.lineitem && asOfEv == AsOf.events)
        graft.core.FeatureCache.cached(spark, dir, s"${key}_d$days")(build)
      else build
    val st = States(
      payments = state("inc_rf_pay", sliced(Roles.payments(spark, dir),
        "created_at", dP, days, summarizePayments, paymentGrain)),
      logins = state("inc_rf_login", sliced(Roles.userLogins(spark, dir),
        "created_at", dE, days, summarizeLogins, loginGrain)),
      alerts = state("inc_rf_alert", sliced(Roles.velocityAlerts(spark, dir),
        "created_at", dE, days, summarizeAlerts, dayGrain)),
      credit = state("inc_rf_credit", sliced(Roles.creditReports(spark, dir),
        "report_date", dE, days, summarizeCredit, dayGrain)),
      scores = state("inc_rf_score", sliced(Roles.riskScores(spark, dir),
        "computed_at", dE, days, summarizeScores, dayGrain)))
    featuresFromState(st, Roles.users(spark, dir), asOfPay, asOfEv)
  }
}
