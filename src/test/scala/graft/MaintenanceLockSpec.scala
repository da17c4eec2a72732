package graft

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions.col

import graft.jobs.MigrationRunner
import graft.sinks.{Compaction, ZOrderLayout}

/** The per-store maintenance mutex: pointer-store WRITERS (migrate,
  * compaction, rollback) assume single-maintainer — the compaction reap
  * deletes version dirs outside its keep set, which includes a CONCURRENT
  * maintainer's complete-but-unpublished version, and HISTORY appends are
  * read-modify-write. At cluster scale a double-fired scheduler makes two
  * maintainers routine, so the entry points serialize on an exclusive-
  * create lock file and fail LOUD on contention (no TTL — the engine
  * keeps wall-clock out of the data path; a dead maintainer's lock is an
  * explicit breakMaintenanceLock, the z-compaction unverifiable-state
  * recovery contract). Readers never touch the lock.
  */
class MaintenanceLockSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(tag: String): String =
    Files.createTempDirectory(s"graft-lock-$tag").toString + "/store"

  test("two maintainers of the same store: the second fails loud naming the holder") {
    val store = freshStore("race")
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var holderResult: Option[String] = None
    val holder = new Thread(() => {
      holderResult = Some(
        MigrationRunner.withMaintenanceLock(spark, store, "holder-job") {
          entered.countDown()
          release.await()
          "done"
        })
    })
    holder.start()
    entered.await()
    val e = intercept[RuntimeException] {
      MigrationRunner.withMaintenanceLock(spark, store, "second-job") { fail("must not enter") }
    }
    assert(e.getMessage.contains("holder-job") &&
      e.getMessage.contains("breakMaintenanceLock"), e.getMessage)
    // engine-acquired locks carry their acquire stamp (lease adjudication)
    // and the contention message surfaces it
    assert(e.getMessage.contains("(acquired "), e.getMessage)
    release.countDown()
    holder.join(30000)
    assert(holderResult.contains("done"))
    // released on exit: a later maintainer enters freely
    assert(MigrationRunner.withMaintenanceLock(spark, store, "third") { 42 } == 42)
  }

  test("the lock releases when the body throws (crash-by-exception)") {
    val store = freshStore("throw")
    intercept[IllegalStateException] {
      MigrationRunner.withMaintenanceLock(spark, store, "doomed") {
        throw new IllegalStateException("boom")
      }
    }
    assert(MigrationRunner.withMaintenanceLock(spark, store, "next") { 1 } == 1)
  }

  test("migrate refuses to run under another maintainer's lock; breakMaintenanceLock recovers") {
    val store = freshStore("migrate")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // a kill -9'd maintainer's leftover: the lock file with no live holder
    val lock = new java.io.File(s"$store/MAINTENANCE.lock")
    lock.getParentFile.mkdirs()
    java.nio.file.Files.writeString(lock.toPath, "dead-maintainer")
    val e = intercept[RuntimeException] {
      MigrationRunner.migrate(spark, df, store, "v1", "id")
    }
    assert(e.getMessage.contains("dead-maintainer"), e.getMessage)
    assert(MigrationRunner.breakMaintenanceLock(spark, store))
    val report = MigrationRunner.migrate(spark, df, store, "v1", "id")
    assert(report.switched, s"$report")
    // and the lock is gone after a successful migrate
    assert(!lock.exists())
  }

  test("pointered compaction is lock-guarded per partition store") {
    val base = Files.createTempDirectory("graft-lock-compact").toString
    val df = (0 until 200).map(i => (i.toLong, s"2024-01-0${i % 2 + 1}"))
      .toDF("id", "partition_date")
    sinks.MergeByKey.overwritePartitions(df.repartition(4), s"$base/flat",
      "partition_date")
    Compaction.initPointered(spark, s"$base/flat", s"$base/ptr", "partition_date")
    // fragment one store so compaction has work planned there
    val store = s"$base/ptr/partition_date=2024-01-01"
    MigrationRunner.withMaintenanceLock(spark, store, "refrag") {
      MigrationRunner.current(spark, store).repartition(8)
        .write.parquet(s"$store/frag")
      MigrationRunner.publish(spark, store, "frag")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/MAINTENANCE.lock"), "other-compactor")
    val e = intercept[RuntimeException] {
      Compaction.compactPointered(spark, s"$base/ptr", "partition_date", 1L << 30)
    }
    assert(e.getMessage.contains("other-compactor"), e.getMessage)
    // the held store was left untouched: still fragmented, still readable
    assert(Compaction.readPointered(spark, s"$base/ptr", "partition_date")
      .filter(col("partition_date") === "2024-01-01").count() == 100L)
    MigrationRunner.breakMaintenanceLock(spark, store)
    val r = Compaction.compactPointered(spark, s"$base/ptr", "partition_date",
      1L << 30)
    assert(r.exists(_.value == "2024-01-01"), s"$r")
  }

  test("retention skips a lock-held store and expires it once the maintainer releases") {
    // VERDICT r14 #1: expiry racing a live compactor must not delete the
    // store mid-rewrite (the compactor's publish would resurrect the
    // expired partition). Expiry is acquire-if-free: the held store is
    // skipped this sweep, the rest of the sweep proceeds, and the next
    // run picks it up.
    val base = Files.createTempDirectory("graft-lock-expire").toString
    val df = (0 until 200).map(i => (i.toLong, s"2024-01-0${i % 2 + 1}"))
      .toDF("id", "partition_date")
    sinks.MergeByKey.overwritePartitions(df.repartition(4), s"$base/flat",
      "partition_date")
    Compaction.initPointered(spark, s"$base/flat", s"$base/ptr", "partition_date")
    val held = s"$base/ptr/partition_date=2024-01-01"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$held/MAINTENANCE.lock"), "live-compactor")
    // cutoff 2024-01-03: both partitions are retention-expired, but only
    // the unlocked one goes
    val first = Compaction.expirePointered(spark, s"$base/ptr",
      "partition_date", java.time.LocalDate.parse("2024-01-05"), 2)
    assert(first == Seq("2024-01-02"), s"$first")
    // the held store is untouched and still fully readable
    assert(Compaction.readPointered(spark, s"$base/ptr", "partition_date")
      .filter(col("partition_date") === "2024-01-01").count() == 100L)
    assert(new java.io.File(s"$held/MAINTENANCE.lock").exists(),
      "expiry must not have removed the live maintainer's lock")
    MigrationRunner.breakMaintenanceLock(spark, held)
    val second = Compaction.expirePointered(spark, s"$base/ptr",
      "partition_date", java.time.LocalDate.parse("2024-01-05"), 2)
    assert(second == Seq("2024-01-01"), s"$second")
  }

  test("an expiry-held lock blocks a racing compactor loud (the converse direction)") {
    val base = Files.createTempDirectory("graft-lock-expire2").toString
    val df = (0 until 100).map(i => (i.toLong, "2024-01-01"))
      .toDF("id", "partition_date")
    sinks.MergeByKey.overwritePartitions(df.repartition(4), s"$base/flat",
      "partition_date")
    Compaction.initPointered(spark, s"$base/flat", s"$base/ptr", "partition_date")
    val store = s"$base/ptr/partition_date=2024-01-01"
    // fragment so compaction has work planned
    MigrationRunner.withMaintenanceLock(spark, store, "refrag") {
      MigrationRunner.current(spark, store).repartition(8)
        .write.parquet(s"$store/frag")
      MigrationRunner.publish(spark, store, "frag")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/MAINTENANCE.lock"),
      "expirePointered partition_date=2024-01-01")
    val e = intercept[RuntimeException] {
      Compaction.compactPointered(spark, s"$base/ptr", "partition_date", 1L << 30)
    }
    assert(e.getMessage.contains("expirePointered"), e.getMessage)
  }

  test("breakMaintenanceLockIfStale breaks only provably-old stamped locks") {
    import java.time.{Duration, Instant}
    val store = freshStore("lease")
    val now = Instant.parse("2026-01-02T00:00:00Z")
    // no lock at all → nothing to break
    assert(!MigrationRunner.breakMaintenanceLockIfStale(spark, store,
      Duration.ofHours(6), now))
    // a crashed maintainer's stamped lock, 24h old vs a 6h lease
    val lock = new java.io.File(s"$store/MAINTENANCE.lock")
    lock.getParentFile.mkdirs()
    java.nio.file.Files.writeString(lock.toPath,
      "crashed-job\nacquired=2026-01-01T00:00:00Z")
    // FRESH relative to an earlier clock: refuses, lock still blocks
    assert(!MigrationRunner.breakMaintenanceLockIfStale(spark, store,
      Duration.ofHours(6), Instant.parse("2026-01-01T03:00:00Z")))
    intercept[RuntimeException] {
      MigrationRunner.withMaintenanceLock(spark, store, "blocked") { fail("must not enter") }
    }
    // provably past the lease: broken, maintenance proceeds
    assert(MigrationRunner.breakMaintenanceLockIfStale(spark, store,
      Duration.ofHours(6), now))
    assert(MigrationRunner.withMaintenanceLock(spark, store, "recovered") { 7 } == 7)
    // a stamp-less (hand-written / pre-stamp) lock has unverifiable age:
    // the lease REFUSES and the manual break contract applies
    java.nio.file.Files.writeString(lock.toPath, "dead-no-stamp")
    assert(!MigrationRunner.breakMaintenanceLockIfStale(spark, store,
      Duration.ofHours(6), now))
    assert(MigrationRunner.breakMaintenanceLock(spark, store))
  }

  test("maintainPointered: stale lock broken and compacted, fresh lock skipped, retention applied") {
    // the unattended-scheduler sweep (VERDICT r14 next #5): a maintainer
    // that crashed holding a lock must not wedge the warehouse — the
    // lease breaks provably-old locks; a FRESH lock is a live maintainer
    // and its store is skipped (next sweep's work), never aborting the
    // rest of the sweep.
    val base = Files.createTempDirectory("graft-maintain").toString
    val df = (0 until 300).map { i =>
      val day = Seq("2024-01-01", "2024-03-01", "2024-03-02")(i % 3)
      (i.toLong, day)
    }.toDF("id", "partition_date")
    sinks.MergeByKey.overwritePartitions(df.repartition(4), s"$base/flat",
      "partition_date")
    Compaction.initPointered(spark, s"$base/flat", s"$base/ptr", "partition_date")
    // fragment both March stores so compaction has work planned
    Seq("2024-03-01", "2024-03-02").foreach { v =>
      val store = s"$base/ptr/partition_date=$v"
      MigrationRunner.current(spark, store).repartition(8)
        .write.parquet(s"$store/frag")
      MigrationRunner.publish(spark, store, "frag")
    }
    // a crashed maintainer's 2-day-old lock on 03-01; a live maintainer's
    // fresh lock on 03-02 (stamps relative to the pinned sweep clock)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/ptr/partition_date=2024-03-01/MAINTENANCE.lock"),
      "crashed-compactor\nacquired=2024-03-03T00:00:00Z")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/ptr/partition_date=2024-03-02/MAINTENANCE.lock"),
      "live-compactor\nacquired=2024-03-04T23:30:00Z")

    val sweep = Compaction.maintainPointered(spark, s"$base/ptr",
      "partition_date", targetBytes = 1L << 30,
      asOf = java.time.LocalDate.parse("2024-03-05"), retentionDays = 30,
      staleLockLease = Some(java.time.Duration.ofHours(6)),
      now = () => java.time.Instant.parse("2024-03-05T00:00:00Z"))

    assert(sweep.locksBroken == Seq("2024-03-01"), s"$sweep")
    assert(sweep.rewrites.map(_.value) == Seq("2024-03-01"),
      s"fresh-held store must be skipped: $sweep")
    assert(sweep.expired == Seq("2024-01-01"), s"$sweep")
    // the live maintainer's store: untouched, still fragmented, readable
    assert(Compaction.statsPointered(spark, s"$base/ptr", "partition_date")
      .find(_.value == "2024-03-02").exists(_.files == 8))
    assert(Compaction.readPointered(spark, s"$base/ptr", "partition_date")
      .count() == 200L)
    // once the live maintainer releases, the next sweep finishes the job
    MigrationRunner.breakMaintenanceLock(spark,
      s"$base/ptr/partition_date=2024-03-02")
    val sweep2 = Compaction.maintainPointered(spark, s"$base/ptr",
      "partition_date", targetBytes = 1L << 30,
      asOf = java.time.LocalDate.parse("2024-03-05"), retentionDays = 30,
      staleLockLease = Some(java.time.Duration.ofHours(6)),
      now = () => java.time.Instant.parse("2024-03-05T01:00:00Z"))
    assert(sweep2.locksBroken.isEmpty && sweep2.expired.isEmpty &&
      sweep2.rewrites.map(_.value) == Seq("2024-03-02"), s"$sweep2")
  }

  test("a lease break cannot cascade: the slow ex-holder leaves the usurper's lock alone (VERDICT r15 #2)") {
    import java.time.{Duration, Instant}
    val store = freshStore("cascade")
    val entered = new CountDownLatch(1)
    val finish = new CountDownLatch(1)
    @volatile var aResult: Option[Int] = None
    val slowA = new Thread(() => {
      aResult = MigrationRunner.withMaintenanceLockIfFree(spark, store,
        "slow-A") { entered.countDown(); finish.await(); 1 }
    })
    slowA.start()
    entered.await()
    // the sweep judges A's (real) stamp against a clock 7h ahead of a 6h
    // lease: provably stale by the policy's own arithmetic — A is merely
    // slow, the documented lease trade
    assert(MigrationRunner.breakMaintenanceLockIfStale(spark, store,
      Duration.ofHours(6), Instant.now().plus(Duration.ofHours(7))))
    // usurper B acquires a fresh lock and starts its own maintenance
    val bEntered = new CountDownLatch(1)
    val bFinish = new CountDownLatch(1)
    @volatile var bResult: Option[Int] = None
    val usurperB = new Thread(() => {
      bResult = MigrationRunner.withMaintenanceLockIfFree(spark, store,
        "usurper-B") { bEntered.countDown(); bFinish.await(); 2 }
    })
    usurperB.start()
    bEntered.await()
    val foreignBefore = MigrationRunner.foreignLocksAtRelease.get()
    // slow A completes: with an unconditional release it would now delete
    // B's lock, silently re-opening the store to a third maintainer — the
    // delete-if-mine release must leave the foreign lock standing
    finish.countDown()
    slowA.join(30000)
    assert(aResult.contains(1), "A's body ran to completion")
    val lock = new java.io.File(s"$store/MAINTENANCE.lock")
    assert(lock.exists(), "the ex-holder deleted the usurper's lock")
    assert(java.nio.file.Files.readString(lock.toPath)
      .startsWith("usurper-B"), "the surviving lock must be B's")
    assert(MigrationRunner.foreignLocksAtRelease.get() >= foreignBefore + 1,
      "A must observe the loss (the loud-log signal, pinned via its counter)")
    // the mutex still holds: a third maintainer is excluded while B runs
    assert(MigrationRunner.withMaintenanceLockIfFree(spark, store,
      "third-C") { 3 }.isEmpty)
    bFinish.countDown()
    usurperB.join(30000)
    assert(bResult.contains(2))
    assert(!lock.exists(), "B's own (still-owned) release must delete its lock")
  }

  test("the stale break deletes only if the lock content is unchanged (ADVICE r15 TOCTOU narrowing)") {
    // the mechanism both the lease break and the delete-if-mine release
    // share: re-read immediately before delete, delete only on identity
    val store = freshStore("toctou")
    val lockFile = new java.io.File(s"$store/MAINTENANCE.lock")
    lockFile.getParentFile.mkdirs()
    val original = "old-maintainer\nacquired=2026-01-01T00:00:00Z"
    java.nio.file.Files.writeString(lockFile.toPath, original)
    val p = new org.apache.hadoop.fs.Path(s"$store/MAINTENANCE.lock")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // content swapped after the staleness read (a fresh maintainer's lock
    // replaced it): the guarded delete must refuse and leave it standing
    val fresh = "fresh-maintainer\nacquired=2026-01-02T00:00:00Z"
    java.nio.file.Files.writeString(lockFile.toPath, fresh)
    assert(!MigrationRunner.deleteLockIfContentStill(f, p, original))
    assert(lockFile.exists() &&
      java.nio.file.Files.readString(lockFile.toPath) == fresh)
    // unchanged content: deleted
    assert(MigrationRunner.deleteLockIfContentStill(f, p, fresh))
    assert(!lockFile.exists())
    // gone already: false, no throw
    assert(!MigrationRunner.deleteLockIfContentStill(f, p, fresh))
  }

  test("maintainPointered reaps crash-leftover versions in stores compaction never visits (VERDICT r15 #6)") {
    val base = Files.createTempDirectory("graft-maintain-reap").toString
    val df = (0 until 200).map(i => (i.toLong, s"2024-03-0${i % 2 + 1}"))
      .toDF("id", "partition_date")
    sinks.MergeByKey.overwritePartitions(df.coalesce(1), s"$base/flat",
      "partition_date")
    Compaction.initPointered(spark, s"$base/flat", s"$base/ptr",
      "partition_date")
    // both stores are already compact (1 file), so compaction plans
    // NOTHING — its own reap would never visit them. Seed each with a
    // maintainer's crash leftover: a version written but never published.
    val s1 = s"$base/ptr/partition_date=2024-03-01"
    val s2 = s"$base/ptr/partition_date=2024-03-02"
    Seq(s1, s2).foreach { s =>
      MigrationRunner.current(spark, s).write.parquet(s"$s/orphan")
    }
    // a LIVE maintainer holds s2: its in-flight version must survive
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$s2/MAINTENANCE.lock"), "live-maintainer")

    val sweep = Compaction.maintainPointered(spark, s"$base/ptr",
      "partition_date", targetBytes = 1L << 30,
      asOf = java.time.LocalDate.parse("2024-03-05"), retentionDays = 365)
    assert(sweep.rewrites.isEmpty,
      s"fixture must not need compaction (or the pin proves nothing): $sweep")
    assert(sweep.versionsReaped == Seq("2024-03-01/orphan"), s"$sweep")
    assert(!new java.io.File(s"$s1/orphan").exists())
    assert(new java.io.File(s"$s2/orphan").exists(),
      "a held store's in-flight version must never be reaped")
    // live data untouched, still readable
    assert(Compaction.readPointered(spark, s"$base/ptr", "partition_date")
      .count() == 200L)
    // once the live maintainer releases, the next sweep finishes
    MigrationRunner.breakMaintenanceLock(spark, s2)
    val sweep2 = Compaction.maintainPointered(spark, s"$base/ptr",
      "partition_date", targetBytes = 1L << 30,
      asOf = java.time.LocalDate.parse("2024-03-05"), retentionDays = 365)
    assert(sweep2.versionsReaped == Seq("2024-03-02/orphan"), s"$sweep2")
    // superseded-but-in-history versions are KEPT (the racing-reader
    // retention window) — publish twice, reap must not touch either
    MigrationRunner.current(spark, s1).write.parquet(s"$s1/next")
    MigrationRunner.publish(spark, s1, "next")
    val sweep3 = Compaction.maintainPointered(spark, s"$base/ptr",
      "partition_date", targetBytes = 1L << 30,
      asOf = java.time.LocalDate.parse("2024-03-05"), retentionDays = 365)
    assert(sweep3.versionsReaped.isEmpty, s"$sweep3")
    assert(new java.io.File(s"$s1/v1").exists(),
      "the previous live version is in HISTORY's tail and must be kept")
  }

  test("versioned z-store compaction is lock-guarded") {
    val store = freshStore("zver")
    val df = (0 until 400).map(i => (i.toLong % 16, i.toLong % 8, i * 1.0))
      .toDF("user_id", "day", "value")
    ZOrderLayout.writeZOrderedVersioned(df, store, "user_id", "day", files = 2)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/MAINTENANCE.lock"), "other-z")
    val e = intercept[RuntimeException] {
      ZOrderLayout.compactZOrderedVersioned(spark, store, "user_id", "day", files = 2)
    }
    assert(e.getMessage.contains("other-z"), e.getMessage)
    MigrationRunner.breakMaintenanceLock(spark, store)
    ZOrderLayout.compactZOrderedVersioned(spark, store, "user_id", "day", files = 2)
    assert(ZOrderLayout.readVersioned(spark, store).count() == 400L)
  }
}
