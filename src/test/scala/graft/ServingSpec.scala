package graft

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.serving.FeatureStoreService

/** Serving semantics of store.py:43-141 — all-types hit rule, oldest-group
  * freshness, type normalization, batch cap. */
class ServingSpec extends SparkSpec {

  private lazy val svc = new FeatureStoreService(spark, sf0001)
  private val now = Instant.parse("2001-08-02T02:30:00Z") // 150 min past asOf stamp

  test("type normalization dedups order-preserving and rejects unknowns (models.py:71-77)") {
    assert(svc.normalizeTypes(Seq("risk", "user", "risk")) == Seq("risk", "user"))
    intercept[IllegalArgumentException](svc.normalizeTypes(Seq("user", "bogus")))
  }

  test("all-types hit rule: BUILDING user present in all groups hits; absent user misses") {
    import spark.implicits._
    val building = graft.core.Roles.users(spark, sf0001)
      .filter($"recently_updated").select("user_id").as[Long].head()
    val hit = svc.getFeatures(building, Seq("user", "transaction", "risk"), now)
    assert(hit.cacheHit && hit.features.size == 3)
    val miss = svc.getFeatures(999999L, Seq("user"), now)
    assert(!miss.cacheHit && miss.features.isEmpty && miss.freshnessMinutes.isEmpty)
  }

  test("partial presence is a MISS (store.py:174-175): tx-active non-BUILDING user") {
    import spark.implicits._
    val txOnly = jobs.TransactionFeaturesJob(spark, sf0001).select("user_id")
      .except(jobs.UserFeaturesJob(spark, sf0001).select("user_id"))
      .as[Long].collect().headOption
    assume(txOnly.nonEmpty, "corpus has a recent transactor outside BUILDING")
    val res = svc.getFeatures(txOnly.get, Seq("user", "transaction"), now)
    assert(!res.cacheHit && res.features.keySet == Set("transaction"))
  }

  test("freshness is the oldest group's age in minutes (store.py:189-201)") {
    import spark.implicits._
    val building = graft.core.Roles.users(spark, sf0001)
      .filter($"recently_updated").select("user_id").as[Long].head()
    val res = svc.getFeatures(building, Seq("user", "transaction"), now)
    // user/transaction features are stamped at AsOf.orders = 2001-08-02 00:00
    assert(res.freshnessMinutes.contains(150L))
  }

  test("feature cache TTL: an expired entry is rebuilt on next access (settings.py:64)") {
    var fakeNow = 0L
    val origClock = graft.core.FeatureCache.clock
    try {
      graft.core.FeatureCache.clock = () => fakeNow
      var builds = 0
      def get() = graft.core.FeatureCache.cached(spark, sf0001, "ttl-probe") {
        builds += 1
        graft.core.Tables.nation(spark, sf0001)
      }
      get(); get()
      assert(builds == 1, "fresh entry served from cache")
      fakeNow = graft.core.FeatureCache.ttlNanos + 1
      get()
      assert(builds == 2, "expired entry rebuilt")
    } finally {
      graft.core.FeatureCache.clock = origClock
      graft.core.FeatureCache.invalidate(spark, sf0001, "ttl-probe")
    }
  }

  test("batch cap of 100 is enforced (models.py:84-89)") {
    intercept[IllegalArgumentException](
      svc.getBatch((1L to 101L), Seq("user"), now))
  }

  test("cache: a slow eager build must not block other keys; same key builds once") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val enteredSlow = new CountDownLatch(1)
    val releaseSlow = new CountDownLatch(1)
    val slowDone = new CountDownLatch(1)
    val t1 = new Thread(() => {
      graft.core.FeatureCache.cached(spark, sf0001, "slow-probe") {
        enteredSlow.countDown()
        // an eager artifact build (cluster fixpoint analogue) in progress
        assert(releaseSlow.await(30, TimeUnit.SECONDS))
        graft.core.Tables.nation(spark, sf0001)
      }
      slowDone.countDown()
    })
    t1.start()
    try {
      assert(enteredSlow.await(30, TimeUnit.SECONDS))
      // while key A builds, key B must be servable (the memo-wide lock no
      // longer spans build) — this would deadlock-timeout under the old lock
      val otherDone = new CountDownLatch(1)
      val t2 = new Thread(() => {
        graft.core.FeatureCache.cached(spark, sf0001, "other-probe") {
          graft.core.Tables.region(spark, sf0001)
        }
        otherDone.countDown()
      })
      t2.start()
      assert(otherDone.await(30, TimeUnit.SECONDS),
        "a concurrent lookup for another key blocked behind the slow build")
      // duplicate-builder race stays closed: a second request for the SLOW
      // key waits for the in-flight build and reuses it (one build total)
      var builds = 0
      val t3 = new Thread(() => {
        graft.core.FeatureCache.cached(spark, sf0001, "slow-probe") {
          builds += 1
          graft.core.Tables.nation(spark, sf0001)
        }: Unit
      })
      t3.start()
      releaseSlow.countDown()
      assert(slowDone.await(30, TimeUnit.SECONDS))
      t3.join(30000); t1.join(30000); t2.join(30000)
      assert(builds == 0, "second requester re-built instead of reusing the in-flight build")
    } finally {
      releaseSlow.countDown()
      Seq("slow-probe", "other-probe").foreach(
        graft.core.FeatureCache.invalidate(spark, sf0001, _))
    }
  }

  test("row tier never serves stale rows: group invalidation evicts derived entries") {
    val svc2 = new FeatureStoreService(spark, sf0001)
    import spark.implicits._
    val building = graft.core.Roles.users(spark, sf0001)
      .filter($"recently_updated").select("user_id").as[Long].head()
    val first = svc2.getFeatures(building, Seq("user"), now)
    assert(first.cacheHit)
    // a group-tier refresh (the ST3 target — upstream data changed) must
    // not leave row-tier entries computed from the OLD table: the next
    // read re-probes rather than serving the memoized stale row
    svc2.invalidate(Seq("user"))
    val execs = sqlExecutionsDuring {
      val again = svc2.getFeatures(building, Seq("user"), now)
      assert(again.features.contains("user"))
    }
    assert(execs >= 1,
      "post-invalidation read must re-probe, not serve the stale row-tier entry")
  }

  test("row tier honors the shared TTL: expired entries re-probe") {
    var fakeNow = 0L
    val origClock = graft.core.FeatureCache.clock
    try {
      graft.core.FeatureCache.clock = () => fakeNow
      val svc2 = new FeatureStoreService(spark, sf0001)
      import spark.implicits._
      val building = graft.core.Roles.users(spark, sf0001)
        .filter($"recently_updated").select("user_id").as[Long].head()
      svc2.getFeatures(building, Seq("user"), now)
      fakeNow = graft.core.FeatureCache.ttlNanos + 1
      // expired → the probe path must RUN (an SQL execution), not trust
      // the stale memo entry; without the execution count this test would
      // pass even if the tier ignored TTL entirely
      val execs = sqlExecutionsDuring {
        val res = svc2.getFeatures(building, Seq("user"), now)
        assert(res.cacheHit && res.features.contains("user"))
      }
      assert(execs >= 1, "expired row-tier entry must re-probe")
    } finally graft.core.FeatureCache.clock = origClock
  }

  test("getBatch never returns empty features for an existing user under concurrent invalidation") {
    // regression pin for the snapshot-at-miss-detection fix: with assembly
    // re-reading the memo, an invalidateUser between the freshness check
    // and assembly made a warm user come back featureless without a
    // re-probe. Hammer reads against a per-user invalidator; every read
    // must either serve the snapshot or re-probe — never return empty.
    val svc2 = new FeatureStoreService(spark, sf0001)
    import spark.implicits._
    val ids = graft.core.Roles.users(spark, sf0001).filter($"recently_updated")
      .select("user_id").as[Long].head(4).toSeq
    assert(svc2.getBatch(ids, Seq("user"), now).forall(_.features.contains("user")))
    @volatile var stop = false
    val bad = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val readers = (1 to 3).map { _ =>
      new Thread(() => {
        while (!stop) {
          try svc2.getBatch(ids, Seq("user"), now).foreach { r =>
            if (!r.features.contains("user")) bad.incrementAndGet(): Unit
          } catch { case _: Throwable => errs.incrementAndGet(): Unit }
        }
      })
    }
    val invalidator = new Thread(() => {
      while (!stop) { ids.foreach(svc2.invalidateUser); Thread.sleep(1) }
    })
    (readers :+ invalidator).foreach(_.start())
    Thread.sleep(2000)
    stop = true
    (readers :+ invalidator).foreach(_.join())
    assert(errs.get() == 0, s"${errs.get()} reads threw")
    assert(bad.get() == 0,
      s"${bad.get()} reads returned no user features for an existing user")
  }

  test("getBatch fuses the probe: one SQL execution for a 3-group batch") {
    // warm the group caches so the measured probe is the steady-state path
    svc.getBatch(Seq(1L), Seq("user", "transaction", "risk"), now)
    val execs = sqlExecutionsDuring {
      val res = svc.getBatch(Seq(4L, 5L, 9L), Seq("user", "transaction", "risk"), now)
      assert(res.size == 3)
    }
    // AQE's stage materializations share the root execution, so a fused
    // probe is exactly one SQLExecutionStart; the old per-group loop was 3
    assert(execs == 1, s"expected one fused probe execution, saw $execs")
  }

  test("cache anchors consumers on the InMemoryRelation leaf; invalidate still frees the blocks") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import spark.implicits._
    val build = graft.core.Tables.nation(spark, sf0001)
      .groupBy($"n_regionkey").count()
    val before = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    val cached = graft.core.FeatureCache.cached(spark, sf0001, "anchor-probe")(build)
    try {
      // the r16 analysis-cost contract: consumers compose on a ONE-NODE
      // leaf, not the build lineage — every downstream Dataset's analyzer
      // walk (join dedup, cache-lookup canonicalization) is O(consumer)
      assert(cached.queryExecution.logical.isInstanceOf[InMemoryRelation],
        s"cached frame should be IMR-anchored, got: ${cached.queryExecution.logical.nodeName}")
      // same rows as the un-cached build
      assert(cached.collect().toSet == build.collect().toSet)
      // blocks exist once materialized...
      cached.count()
      val added = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet -- before
      assert(added.nonEmpty, "materialized cache entry registered no storage RDD")
      // ...and invalidate (which must unpersist through the ORIGINAL
      // handle — the anchored plan is unknown to the CacheManager) frees them
      graft.core.FeatureCache.invalidate(spark, sf0001, "anchor-probe")
      val after = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
      assert((added -- after).sizeIs == added.size,
        s"invalidate left cache blocks registered: ${added.intersect(after)}")
    } finally graft.core.FeatureCache.invalidate(spark, sf0001, "anchor-probe")
  }
}
