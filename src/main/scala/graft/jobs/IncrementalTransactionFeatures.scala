package graft.jobs

import java.time.{Instant, LocalDate}
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{AsOf, Roles}
import graft.ops.Ops._

/** Incremental maintenance of TransactionFeaturesJob (VERDICT r11 next #4):
  * day-N features from day-(N−1) state + the day's delta, instead of the
  * reference's recompute-the-31-day-window daily batch
  * (src/pipelines/batch_pipeline.py:63-125, which re-reads every
  * transaction of the window each night — at 100 TB that is re-scanning
  * ~31× the daily volume for a result that changed by one day).
  *
  * STATE: a compact summary at (user_id, day, merchant_id) grain — the
  * coarsest grain from which EVERY aggregate of the job recomposes
  * exactly:
  *
  *   - counts / declined / weekend / night counts: sums of bucket counts;
  *   - money: per-bucket exact DECIMAL sums, re-summed (decimal addition
  *     is associative, so delta-then-total ≡ total — the same determinism
  *     rule sumMoney already enforces);
  *   - max: max of bucket maxes;
  *   - COUNT(DISTINCT merchant_id): merchant_id is IN the grain, so the
  *     30-day distinct count is a plain count_distinct over bucket rows —
  *     the one aggregate a (user, day) grain could NOT maintain exactly
  *     (distinct counts don't merge), solved by keying the state on it;
  *   - the 30d window "retract": day buckets simply age OUT of the
  *     filter — no retraction arithmetic, the slide is a predicate.
  *
  * EXACTNESS contract: every AsOf anchor is midnight UTC (core.AsOf), so
  * the job's `created_at >= asOf − 30d` timestamp cut falls ON a day
  * boundary and the day-grain filter is the identical predicate — asserted
  * at entry, not assumed. IncrementalFeaturesSpec pins ladder ≡ full
  * recompute cell-exact; the transaction_features_incremental oracle entry
  * pins it against DuckDB's full recompute at every driver sf.
  *
  * SCALE shape: the daily job aggregates ONE day of transactions (the
  * delta summary — a day-partition-pruned scan), merges it into the state
  * table by key (MergeByKey; disjoint day partitions make the merge an
  * append, and replays idempotent), and re-aggregates ~31 days of
  * SUMMARY rows (≪ raw transactions: bounded by active users × their
  * distinct merchants/day). All shuffles hash on user_id first.
  */
object IncrementalTransactionFeatures {

  val grain: Seq[String] = Seq("user_id", "day", "merchant_id")

  private def dayLit(d: LocalDate) = lit(java.sql.Date.valueOf(d))

  private def midnight(asOf: Instant): LocalDate = {
    require(asOf.truncatedTo(ChronoUnit.DAYS) == asOf,
      s"incremental day-grain state needs a midnight-aligned anchor: $asOf")
    AsOf.date(asOf)
  }

  /** Summarize ANY slice of the transactions table to state grain. The
    * slice boundaries must fall on day boundaries for summaries to union
    * into a valid state (each grain cell lives wholly in one slice). */
  def summarize(tx: DataFrame): DataFrame =
    tx.groupBy(col("user_id"), to_date(col("created_at")).as("day"),
        col("merchant_id"))
      .agg(
        count(lit(1)).as("tx_cnt"),
        sum(col("amount").cast("decimal(12,2)")).as("amount_sum"),
        max(col("amount")).as("amount_max"),
        countIf(col("status") === "F").as("declined_cnt"),
        countIf(isWeekend(col("created_at"))).as("weekend_cnt"),
        countIf(isNight(col("created_at"))).as("night_cnt"))

  /** One calendar day's delta summary — the daily increment. The filter is
    * a pushable range predicate (partition pruning once the transaction
    * log is date-partitioned, the reference's layout). */
  def dailyDelta(tx: DataFrame, day: LocalDate): DataFrame =
    summarize(tx.filter(
      col("created_at") >= dayLit(day) &&
      col("created_at") < dayLit(day.plusDays(1))))

  /** Fold a delta into the state. Day partitions are disjoint, so this is
    * semantically an append; routing it through MergeByKey makes a REPLAY
    * of the same day idempotent (the re-run's buckets replace themselves)
    * — the same at-least-once discipline as the streaming sinks. */
  def applyDelta(state: DataFrame, delta: DataFrame): DataFrame =
    graft.sinks.MergeByKey.merge(state, delta, grain)

  /** The full feature frame from state — output-identical to
    * TransactionFeaturesJob.compute at the same anchor. */
  def featuresFromState(state: DataFrame, users: DataFrame,
                        asOf: Instant): DataFrame = {
    val d = midnight(asOf)
    val in31 = col("day") >= dayLit(d.minusDays(31))
    val in30 = col("day") >= dayLit(d.minusDays(30))

    val scanned = state.filter(in31)
    val stats = scanned.groupBy("user_id").agg(
      // countIf over rows becomes a SUM of bucket counts; count() is
      // never null but sum() is — coalesce restores countIf's 0
      coalesce(sum(when(in30, col("tx_cnt"))), lit(0L))
        .as("total_transactions_30d"),
      sum(when(in30, col("amount_sum"))).cast("double").as("total_amount_30d"),
      (sum(when(in30, col("amount_sum"))).cast("double") /
        nullif(coalesce(sum(when(in30, col("tx_cnt"))), lit(0L)), lit(0)))
        .as("avg_transaction_amount"),
      max(when(in30, col("amount_max"))).as("max_transaction_amount"),
      coalesce(sum(when(in30, col("declined_cnt"))), lit(0L))
        .as("transactions_declined_30d"),
      count_distinct(when(in30, col("merchant_id"))).as("unique_merchants_30d"),
      ratio(sum(when(in30, col("weekend_cnt"))),
        coalesce(sum(when(in30, col("tx_cnt"))), lit(0L)))
        .as("weekend_transaction_ratio"),
      ratio(sum(when(in30, col("night_cnt"))),
        coalesce(sum(when(in30, col("tx_cnt"))), lit(0L)))
        .as("night_transaction_ratio"))

    // every state row holds ≥1 transaction, so "users with any in-30d
    // bucket" is exactly the job's recent-transactor set
    val active = unionDistinct(
      users.filter(col("recently_updated")).select("user_id"),
      scanned.filter(in30).select("user_id"))

    val asOfTs = to_timestamp(lit(AsOf.ts(asOf)))
    active.join(stats, Seq("user_id"), "left").select(
      col("user_id"),
      orZero(col("total_transactions_30d")).as("total_transactions_30d"),
      orZeroD(col("total_amount_30d")).as("total_amount_30d"),
      orZeroD(col("avg_transaction_amount")).as("avg_transaction_amount"),
      orZeroD(col("max_transaction_amount")).as("max_transaction_amount"),
      orZero(col("transactions_declined_30d")).as("transactions_declined_30d"),
      orZero(col("unique_merchants_30d")).as("unique_merchants_30d"),
      orZeroD(col("weekend_transaction_ratio")).as("weekend_transaction_ratio"),
      orZeroD(col("night_transaction_ratio")).as("night_transaction_ratio"),
      asOfTs.as("created_at"),
      asOfTs.as("updated_at"))
  }

  /** The 3-day ladder the oracle adjudicates (one query name, driver
    * contract): backfill state up to anchor−`days`, then apply each day's
    * delta incrementally (plus the anchor-day tail, so any same-day rows
    * the unbounded-above scan would see are covered), then read features.
    * Equality with the full recompute holds by construction — the slices
    * partition the transaction log on day boundaries. */
  def ladder(spark: SparkSession, dir: String, days: Int = 3,
             asOf: Instant = AsOf.orders): DataFrame = {
    // the state rides FeatureCache — in production it IS a stored table;
    // without this, featuresFromState's two consumers (stats + the
    // active set) re-evaluate the whole slice tree and the ladder
    // re-decodes the transaction log per consumer (measured 9× at
    // one-row-group granularity before the cache; ScanAuditSpec pins
    // the budget)
    // cache key carries `days` but not `asOf` — cache only the default
    // anchor (the driver-contract shape), like every feature job's apply
    def buildState = {
      val tx = Roles.transactions(spark, dir)
      val d = midnight(asOf)
      val cut = d.minusDays(days.toLong)
      val base = summarize(tx.filter(col("created_at") < dayLit(cut)))
      val stepped = (0 until days).foldLeft(base) { (st, i) =>
        applyDelta(st, dailyDelta(tx, cut.plusDays(i.toLong)))
      }
      // anchor-day-and-later tail: the batch job's scan has no upper bound
      applyDelta(stepped, summarize(tx.filter(col("created_at") >= dayLit(d))))
    }
    val state =
      if (asOf == AsOf.orders)
        graft.core.FeatureCache.cached(spark, dir, s"inc_tx_state_d$days")(buildState)
      else buildState
    featuresFromState(state, Roles.users(spark, dir), asOf)
  }
}
