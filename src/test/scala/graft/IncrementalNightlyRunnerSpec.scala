package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{AsOf, Roles}
import graft.jobs.{DailyBatchRunner, IncrementalNightlyRunner => Nightly,
  MigrationRunner, RiskFeaturesJob, TransactionFeaturesJob, UserFeaturesJob}

/** The incremental families as the persisted nightly path: states
  * round-trip through parquet between nights (not FeatureCache), and the
  * runner's features must STILL be cell-exact against the full recompute —
  * the strongest equivalence oracle, now through the storage layer too.
  * Plus the two per-family delivery contracts at the RUNNER level: day
  * families replay idempotently (dynamic partition overwrite), the user
  * family applies exactly once (version-name marker skip). */
class IncrementalNightlyRunnerSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      .toSeq.sortBy(_.mkString("|"))
  }

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("persisted 3-night ladder == full recompute for ALL THREE families; publish gates+exports") {
    val stateRoot = freshDir("nightly-state")
    val out = freshDir("nightly-out")
    val src = Nightly.Sources.fromDir(spark, sf0001)

    val res = DailyBatchRunner.run(spark, sf0001, out,
      DailyBatchRunner.Thresholds(1, 1, 1),
      incremental = true, stateRoot = stateRoot)
    assert(res.userRows > 0 && res.transactionRows > 0 && res.riskRows > 0)

    val (uf, tf, rf) = Nightly.features(spark, src, stateRoot)
    assert(rows(tf) == rows(TransactionFeaturesJob.compute(
      Roles.transactions(spark, sf0001), Roles.users(spark, sf0001), AsOf.orders)),
      "transaction features off persisted state diverge from full recompute")
    assert(rows(uf) == rows(UserFeaturesJob.compute(
      Roles.transactions(spark, sf0001), Roles.users(spark, sf0001), AsOf.orders)),
      "user features off persisted state diverge from full recompute")
    assert(rows(rf) == rows(RiskFeaturesJob(spark, sf0001)),
      "risk features off persisted state diverge from full recompute")

    // publish really wrote the per-group stores + the partitioned view
    val fv = spark.read.parquet(s"$out/feature_view")
    assert(fv.count() > 0 && fv.columns.contains("partition_date"))
    assert(MigrationRunner.current(spark, s"$out/user_features").count() == res.userRows)
  }

  test("replaying a night is a no-op: day partitions overwrite themselves, user fold skips") {
    val stateRoot = freshDir("nightly-replay")
    val src = Nightly.Sources.fromDir(spark, sf0001)
    val days = 3
    Nightly.bootstrap(spark, src, stateRoot, days)
    (0 until days).foreach(k => Nightly.night(spark, src, stateRoot, days, k))
    val before = Nightly.features(spark, src, stateRoot)
    val snap = (rows(before._1), rows(before._2), rows(before._3))
    val marker = MigrationRunner.currentVersion(spark, s"$stateRoot/user_state")

    // the crashed-scheduler retry: the final night runs AGAIN
    Nightly.night(spark, src, stateRoot, days, days - 1)

    val after = Nightly.features(spark, src, stateRoot)
    assert(rows(after._2) == snap._2, "tx day-state must be replay-idempotent")
    assert(rows(after._3) == snap._3, "risk day-states must be replay-idempotent")
    // the additive fold would DOUBLE-count on re-apply; the version-name
    // marker must have skipped it — same pointer, same rows
    assert(MigrationRunner.currentVersion(spark, s"$stateRoot/user_state") == marker,
      "user-state pointer moved on replay — exactly-once marker failed")
    assert(rows(after._1) == snap._1, "user features changed on replay")

    // the harder retry: an EARLIER night replays after later nights ran —
    // its marker is no longer the live pointer, only a HISTORY entry; a
    // current-name-only check would re-apply the fold and double-count
    // (r13 self-review finding)
    Nightly.night(spark, src, stateRoot, days, 0)
    val after2 = Nightly.features(spark, src, stateRoot)
    assert(MigrationRunner.currentVersion(spark, s"$stateRoot/user_state") == marker,
      "user-state pointer moved on an out-of-order replay")
    assert(rows(after2._1) == snap._1,
      "user features changed on an out-of-order replay — the fold re-applied")
    assert(rows(after2._2) == snap._2 && rows(after2._3) == snap._3,
      "day-states must also be invariant under out-of-order replay")

    // the r13 review's critical find: re-running BOOTSTRAP on a laddered
    // stateRoot must not re-migrate "pre" and swing the pointer back to
    // the baseline (current-only check would: live is v<day>-final, not
    // "pre") — the whole runIncremental retry rests on this
    Nightly.bootstrap(spark, src, stateRoot, days)
    assert(MigrationRunner.currentVersion(spark, s"$stateRoot/user_state") == marker,
      "bootstrap re-run reset the user state to the pre-ladder baseline")
    val after3 = Nightly.features(spark, src, stateRoot)
    assert(rows(after3._1) == snap._1 && rows(after3._2) == snap._2 &&
      rows(after3._3) == snap._3,
      "features changed after a bootstrap re-run on a laddered state root")
  }

  test("bootstrap rejects a landing whose p_day is NOT the event day (arrival-day layout)") {
    // p_day is a BY-NAME convention; an arrival-day-partitioned landing
    // would silently lose late rows to daySlice's partition predicates —
    // bootstrap's observe()-guard must fail it loud instead
    import spark.implicits._
    val stateRoot = freshDir("nightly-badpday")
    val flat = Nightly.Sources.fromDir(spark, sf0001)
    // shift every partition label one day forward: arrival-day semantics
    val badPath = freshDir("nightly-badlanding") + "/tx"
    graft.sinks.MergeByKey.overwritePartitions(
      flat.transactions
        .withColumn("p_day", date_add(to_date(col("created_at")), 1)),
      badPath, "p_day")
    val bad = flat.copy(transactions = spark.read.parquet(badPath))
    val e = intercept[IllegalArgumentException] {
      Nightly.bootstrap(spark, bad, stateRoot, 3)
    }
    assert(e.getMessage.contains("violates the p_day convention"), e.getMessage)
  }

  test("records pin: a night over a date-partitioned landing reads a fraction of a flat-source night") {
    // the scan-budget discipline at the runner level: daySlice's redundant
    // p_day predicates must make the delta scans PHYSICALLY day-pruned —
    // measured as task-metric records, the level that cannot lie
    def landed(name: String, df: org.apache.spark.sql.DataFrame,
               tsCol: String, root: String): org.apache.spark.sql.DataFrame =
      Nightly.landEventDay(df, tsCol, s"$root/$name")
    val root = freshDir("nightly-landing")
    val flat = Nightly.Sources.fromDir(spark, sf0001)
    val land = Nightly.Sources(
      transactions = landed("tx", flat.transactions, "created_at", root),
      payments = landed("pay", flat.payments, "created_at", root),
      logins = landed("log", flat.logins, "created_at", root),
      alerts = landed("al", flat.alerts, "created_at", root),
      credit = landed("cr", flat.credit, "report_date", root),
      scores = landed("sc", flat.scores, "computed_at", root),
      users = flat.users)

    val sm = core.StageMetrics.attach(spark)
    def nightRecords(src: Nightly.Sources, tag: String): Long = {
      val stateRoot = freshDir(s"nightly-recs-$tag")
      Nightly.bootstrap(spark, src, stateRoot, 3)
      Nightly.night(spark, src, stateRoot, 3, 0)
      // measure a MIDDLE night (pure one-day deltas, no tail)
      sm.measure { Nightly.night(spark, src, stateRoot, 3, 1) }.inputRecords
    }
    val flatRecs = nightRecords(flat, "flat")
    val landRecs = nightRecords(land, "land")
    assert(landRecs < flatRecs / 2,
      s"a landed night read $landRecs records vs $flatRecs flat — the " +
        "p_day partition predicates are not pruning")
  }

  test("records pin: reading features prunes the state to its day windows (not a full state scan)") {
    // the OTHER half of the read economy: the nightly features read must
    // re-aggregate only the 31-day window of SUMMARY rows — `day` IS the
    // state table's partition column, so the in31 filter partition-prunes.
    // ~2400 history days at this corpus: a full-state scan would read
    // ~77x the window.
    val stateRoot = freshDir("nightly-stateprune")
    val src = Nightly.Sources.fromDir(spark, sf0001)
    Nightly.bootstrap(spark, src, stateRoot, 3)
    (0 until 3).foreach(k => Nightly.night(spark, src, stateRoot, 3, k))
    val stateTotal = spark.read.parquet(s"$stateRoot/tx_state").count()
    val usersTotal = src.users.count()
    val sm = core.StageMetrics.attach(spark)
    val tf = graft.jobs.IncrementalTransactionFeatures.featuresFromState(
      spark.read.parquet(s"$stateRoot/tx_state"), src.users,
      graft.core.AsOf.orders)
    tf.count() // warm
    val recs = sm.measure { tf.count(): Unit }.inputRecords
    // budget: the 31d state window (a sliver of stateTotal) + two users
    // reads (stats probe + active set) + slack; a full state scan would
    // blow straight past this
    assert(recs < stateTotal / 3 + 2 * usersTotal + 100,
      s"tx features read $recs records against a $stateTotal-row state " +
        s"($usersTotal users) — the day filter is not partition-pruning")
  }

  test("a fresh JVM-equivalent reader (pure parquet, no session cache) sees the same states") {
    // features() reads ONLY from stateRoot paths + the CURRENT pointer —
    // prove it by reading the state files directly and recomputing one
    // family without any runner involvement
    val stateRoot = freshDir("nightly-cold")
    val src = Nightly.Sources.fromDir(spark, sf0001)
    Nightly.bootstrap(spark, src, stateRoot, 2)
    (0 until 2).foreach(k => Nightly.night(spark, src, stateRoot, 2, k))
    val viaRunner = Nightly.features(spark, src, stateRoot)._2
    val coldState = spark.read.parquet(s"$stateRoot/tx_state")
    val viaCold = graft.jobs.IncrementalTransactionFeatures.featuresFromState(
      coldState, src.users, AsOf.orders)
    assert(rows(viaRunner) == rows(viaCold))
  }
}
