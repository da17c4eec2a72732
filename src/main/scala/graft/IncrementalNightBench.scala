package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{AsOf, Roles, StageMetrics}
import graft.jobs.{IncrementalNightlyRunner => Nightly, RiskFeaturesJob,
  TransactionFeaturesJob, UserFeaturesJob}

/** Measures THE claim behind the incremental families (PERF.md row): what
  * one nightly run costs incrementally vs as a full recompute, at a scale
  * rung, in input RECORDS (layout-determined, the currency that transfers
  * to 100 TB) and wall seconds (local color only).
  *
  * Both sides read the SAME production landing layout — each raw source
  * written date-partitioned (the reference's transaction-log layout) by
  * this bench — so the comparison isolates the ALGORITHM (full rescan vs
  * delta + summary-state re-aggregation), not a storage difference. The
  * full side still gets its 31/91-day window pruning from the layout
  * (day-tight files prune through parquet row-group stats); the user-
  * features full job has NO time bound (all-history aggregates) and
  * honestly pays a full-landing rescan every night — that unbounded
  * nightly term is exactly what the additive-fold state removes.
  *
  * Billed to the incremental night: the LAST ladder night (day delta +
  * anchor tail state merges for all 7 states, including the state-table
  * writes) PLUS reading all three feature frames off the persisted states.
  * Billed to the full night: computing the three full feature frames.
  * Unbilled on both sides: the landing build, bootstrap, earlier nights
  * (amortized history), and the shared publish tail.
  *
  *   sbt "runMain graft.IncrementalNightBench /tmp/graft-sf1 /tmp/inc_night"
  */
object IncrementalNightBench {

  private def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/inc_night_bench"
    val days = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    // a leftover workDir would skip the user-family fold on the measured
    // night (its applied-day marker survives in the version history —
    // exactly-once doing its job) and under-bill the incremental side;
    // this bench always measures from a clean slate
    val workPath = new org.apache.hadoop.fs.Path(work)
    val workFs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (workFs.exists(workPath)) workFs.delete(workPath, true)

    // ---- the production landing: every raw source date-partitioned,
    // via the runner's own shared builder (one landing idiom, one place) ----
    def land(name: String, df: DataFrame, tsCol: String): DataFrame =
      Nightly.landEventDay(df, tsCol, s"$work/landing/$name")
    val src = Nightly.Sources(
      transactions = land("transactions", Roles.transactions(spark, sfDir), "created_at"),
      payments = land("payments", Roles.payments(spark, sfDir), "created_at"),
      logins = land("logins", Roles.userLogins(spark, sfDir), "created_at"),
      alerts = land("alerts", Roles.velocityAlerts(spark, sfDir), "created_at"),
      credit = land("credit", Roles.creditReports(spark, sfDir), "report_date"),
      scores = land("scores", Roles.riskScores(spark, sfDir), "computed_at"),
      users = Roles.users(spark, sfDir))

    val stateRoot = s"$work/state"
    Nightly.bootstrap(spark, src, stateRoot, days)
    (0 until days - 1).foreach(k => Nightly.night(spark, src, stateRoot, days, k))

    val sm = StageMetrics.attach(spark)
    def timed(body: => Unit): (Long, Double) = {
      val t0 = System.nanoTime()
      var recs = 0L
      val d = sm.measure { body }
      recs = d.inputRecords
      (recs, (System.nanoTime() - t0) / 1e9)
    }

    // ---- full-recompute night (fresh frames each action, like the jobs),
    // with the production partition cuts a deployed full job would carry:
    // each source pre-cut on p_day to (job window + 1d margin) — never
    // narrower than the job's own event-time scan, so results are
    // unchanged; partition pruning is what a date-partitioned warehouse
    // gives the FULL path too (fairness — the comparison must isolate
    // algorithm, not deny the full side its layout). The user job has no
    // cut: its aggregates are over ALL history, the unbounded nightly
    // term the additive-fold state exists to remove.
    def cutDays(df: DataFrame, anchor: java.time.Instant, d: Int): DataFrame =
      df.filter(col("p_day") >=
        lit(java.sql.Date.valueOf(AsOf.date(anchor).minusDays(d.toLong))))
    val (fullRecs, fullSec) = timed {
      UserFeaturesJob.compute(src.transactions, src.users, AsOf.orders).count()
      TransactionFeaturesJob.compute(cutDays(src.transactions, AsOf.orders, 32),
        src.users, AsOf.orders).count()
      RiskFeaturesJob.compute(
        cutDays(src.payments, AsOf.lineitem, 92),
        cutDays(src.logins, AsOf.events, 32),
        cutDays(src.alerts, AsOf.events, 32),
        cutDays(src.credit, AsOf.events, 32),
        cutDays(src.scores, AsOf.events, 32),
        src.users, AsOf.lineitem, AsOf.events).count()
      ()
    }

    // ---- incremental night, decomposed ----
    // (a) the raw-log term: what the night actually pulls off the landing
    //     (one day + anchor tail per source, p_day-pruned like the runner's
    //     own slices) — the term that replaces the window rescans
    def taggedSlice(tsCol: String, anchor: java.time.Instant,
                    df: DataFrame): DataFrame = {
      val day = AsOf.date(anchor).minusDays(1L) // days-1 = last night's day
      // the runner's OWN slice helper — the probe measures exactly what
      // night() scans, not a re-implementation of it
      Nightly.daySlice(df, tsCol, day, Some(day.plusDays(1)),
        Some(AsOf.date(anchor)))
    }
    val (deltaRawRecs, _) = timed {
      taggedSlice("created_at", AsOf.orders, src.transactions).count()
      taggedSlice("created_at", AsOf.lineitem, src.payments).count()
      taggedSlice("created_at", AsOf.events, src.logins).count()
      taggedSlice("created_at", AsOf.events, src.alerts).count()
      taggedSlice("report_date", AsOf.events, src.credit).count()
      taggedSlice("computed_at", AsOf.events, src.scores).count()
      ()
    }
    // (b) the whole night: state merges (incl. the user-family fold +
    //     reconcile scans) and the three feature frames off the states
    val (incRecs, incSec) = timed {
      Nightly.night(spark, src, stateRoot, days, days - 1)
      val (uf, tf, rf) = Nightly.features(spark, src, stateRoot)
      uf.count(); tf.count(); rf.count()
      ()
    }
    // context: summary-state sizes (grain-bounded — the term that stays
    // small at production density and replaces the unbounded user rescan)
    val stateRows = Seq("tx_state", "rf_pay_state", "rf_login_state",
      "rf_alert_state", "rf_credit_state", "rf_score_state")
      .map(n => spark.read.parquet(s"$stateRoot/$n").count()).sum +
      graft.jobs.MigrationRunner.current(spark, s"$stateRoot/user_state").count()

    val line =
      s"""{"metric":"incremental_night_vs_full","sf":"$sfDir","days":$days,""" +
      s""""full":{"input_records":$fullRecs,"sec":${fmt(fullSec)}},""" +
      s""""incremental":{"input_records":$incRecs,"sec":${fmt(incSec)},""" +
      s""""raw_delta_records":$deltaRawRecs,"state_rows":$stateRows},""" +
      s""""raw_term_reduction":${fmt(fullRecs.toDouble / math.max(1L, deltaRawRecs))},""" +
      s""""records_ratio":${fmt(fullRecs.toDouble / math.max(1L, incRecs))},""" +
      s""""sec_ratio":${fmt(fullSec / math.max(1e-9, incSec))}}"""
    spark.stop()
    println(line)
    System.out.flush()
  }
}
