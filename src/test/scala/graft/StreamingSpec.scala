package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{EventPipeline, VelocityFeatures}
import graft.streaming.VelocityFeatures.TxnEvent

/** Streaming operators ST1-ST9 driven through MemoryStream — parse/validate,
  * routing, invalidation sets, point-update merge, and the stateful
  * velocity-window path cross-checked against the batch formulas. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("S7: kafkaSource names the missing connector clearly in this env") {
    // the connector resolves at runtime; this image ships without it —
    // the failure mode a user hits must name the format, not NPE
    val e = intercept[Exception](
      EventPipeline.kafkaSource(spark, "localhost:9092", "events"))
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage.take(200))
  }

  test("ST1: parse keeps malformed rows with valid=false") {
    val raw = Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00Z","user_id":5,"event_type":"purchase","value":10.0,"props":"{}"}""",
      """not json at all""",
      """{"event_id":2,"ts":"2024-01-01T10:01:00Z","user_id":null,"event_type":"click","value":1.0,"props":"{}"}"""
    ).toDF("value")
    val parsed = EventPipeline.parse(raw).collect()
    assert(parsed.length == 3)
    assert(parsed.count(_.getAs[Boolean]("valid")) == 1)
  }

  test("ST2: router maps corpus event types onto the four handlers + dead letter") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "signup", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "purchase", 1.0, "{}"),
      (3L, ts("2024-01-01 10:00:00"), 5L, "error", 1.0, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 5L, "view", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 5L, "mystery", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val routes = EventPipeline.route(evs).select("event_type", "route").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(routes == Map(
      "signup" -> "user_features", "purchase" -> "transaction_features",
      "error" -> "risk_features", "view" -> "cache_touch", "mystery" -> "dead_letter"))
  }

  test("ST3/ST4/ST9: run() with checkpoint delivers batches; invalidation set and point-merge work") {
    val input = MemoryStream[String](spark)
    input.addData(
      """{"event_id":1,"ts":"2024-01-01T10:00:00Z","user_id":5,"event_type":"purchase","value":250.0,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T11:00:00Z","user_id":5,"event_type":"purchase","value":400.0,"props":"{}"}""",
      """{"event_id":3,"ts":"2024-01-01T10:30:00Z","user_id":8,"event_type":"signup","value":1.0,"props":"{}"}""")
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    var invalidations = Set.empty[(Long, String)]
    var merged: Map[Long, Double] = Map.empty
    val current = Seq((5L, 0.1, ts("2023-12-01 00:00:00")), (9L, 0.9, ts("2023-12-01 00:00:00")))
      .toDF("user_id", "risk_score", "computed_at")
    val q = EventPipeline.run(input.toDF(), checkpoint) { (batch, _) =>
      invalidations ++= EventPipeline.invalidationSet(batch).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      merged = EventPipeline.applyPointUpdates(current, batch).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("risk_score")).toMap
    }
    q.awaitTermination(60000)
    assert(invalidations == Set((5L, "transaction_features"), (8L, "user_features")))
    // latest purchase for user 5 = 400.0/500 = 0.8 (update wins); user 9 untouched
    assert(merged == Map(5L -> 0.8, 9L -> 0.9))
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    def ev(id: Long, t: String) =
      s"""{"event_id":$id,"ts":"$t","user_id":5,"event_type":"purchase","value":1.0,"props":"{}"}"""
    val input = MemoryStream[String](spark)
    val deduped = EventPipeline.dedupeEvents(EventPipeline.parse(input.toDF()))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // duplicate inside one batch AND a replay in the next batch (the
      // at-least-once redelivery shape) — both must collapse to one row
      input.addData(ev(1, "2024-01-01T10:00:00Z"), ev(1, "2024-01-01T10:00:00Z"))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01T10:00:30Z"), ev(2, "2024-01-01T10:01:00Z"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted
      assert(ids.sameElements(Array(1L, 2L)), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("streaming sessionization: gap sessions merge on bridging events, close at watermark") {
    val input = MemoryStream[(Long, Timestamp, Double)](spark)
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = EventPipeline.sessionize(df, gap = "30 minutes", delay = "2 hours")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    // batch 1: u1 one session; u2 two sessions 50 min apart (gap 30m splits)
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0), (1L, ts("2024-01-01 10:10:00"), 2.0),
      (2L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-01 10:50:00"), 3.0))
    q.processAllAvailable()
    // batch 2: a 10:25 event BRIDGES u2's sessions into one; u1 starts a new one
    input.addData((2L, ts("2024-01-01 10:25:00"), 10.0), (1L, ts("2024-01-01 11:30:00"), 5.0))
    q.processAllAvailable()
    assert(spark.table("sessions").isEmpty,
      "append mode must emit nothing until the watermark closes a session")
    // batch 3: push the watermark past every session end
    input.addData((99L, ts("2024-01-01 18:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sessions")
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"session_value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(rows == Set(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2L, 3.0),
      (1L, ts("2024-01-01 11:30:00"), ts("2024-01-01 12:00:00"), 1L, 5.0),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:20:00"), 3L, 14.0)),
      s"got: $rows")
  }

  test("stream-stream attribution join: inner matches emit live, outer nulls wait for the watermark") {
    val clicks = MemoryStream[(Long, Timestamp, Long, Double)](spark)
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)](spark)
    def named(s: MemoryStream[(Long, Timestamp, Long, Double)]) =
      s.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = EventPipeline.attributionJoin(
        named(clicks), named(purchases), window = "1 hour", delay = "10 minutes")
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()

    // u1: two clicks inside the hour before the purchase; u2: click 90m
    // before (outside the window); u3: purchase with no click at all
    clicks.addData(
      (1L, ts("2024-01-01 10:00:00"), 1L, 0.0),
      (2L, ts("2024-01-01 10:30:00"), 1L, 0.0),
      (3L, ts("2024-01-01 09:00:00"), 2L, 0.0))
    purchases.addData(
      (100L, ts("2024-01-01 10:45:00"), 1L, 50.0),
      (101L, ts("2024-01-01 10:30:00"), 2L, 20.0),
      (102L, ts("2024-01-01 10:45:00"), 3L, 30.0))
    q.processAllAvailable()
    val live = spark.table("attrib").select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(live == Set((100L, Some(1L)), (100L, Some(2L))),
      s"inner matches must emit before any watermark movement; got: $live")

    // advance both watermarks far past every buffered purchase: the
    // unmatched purchases must now emit their null-padded rows exactly once
    clicks.addData((998L, ts("2024-01-01 18:00:00"), 98L, 0.0))
    purchases.addData((999L, ts("2024-01-01 18:00:00"), 99L, 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("attrib")
      .select($"purchase_id", $"click_id", $"purchase_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSet
    assert(rows == Set(
      (100L, Some(1L), 50.0), (100L, Some(2L), 50.0),
      (101L, None, 20.0), (102L, None, 30.0)),
      s"got: $rows")
  }

  test("attribution join: batch and streaming forms agree row for row") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 09:00:00"), 2L, "click", 0.0, "{}"),
      (100L, ts("2024-01-01 10:45:00"), 1L, "purchase", 50.0, "{}"),
      (101L, ts("2024-01-01 10:30:00"), 2L, "purchase", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = EventPipeline.attributionJoin(
        events.filter($"event_type" === "click"),
        events.filter($"event_type" === "purchase"))
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(batch == Set((100L, Some(1L)), (100L, Some(2L)), (101L, None)),
      s"got: $batch")
  }

  test("ST6: stateful velocity windows match the exact rolling formulas") {
    val input = MemoryStream[TxnEvent](spark)
    val events = Seq(
      TxnEvent(1L, ts("2024-01-01 10:00:00"), 100.0, 1, success = true),
      TxnEvent(1L, ts("2024-01-01 10:03:00"), 50.0, 2, success = false),
      TxnEvent(1L, ts("2024-01-01 10:59:00"), 25.0, 1, success = true))
    input.addData(events: _*)
    val q = VelocityFeatures.stream(input.toDS()).writeStream
      .format("memory").queryName("velocity").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("velocity").as[VelocityFeatures.VelocityRow]
      .collect().sortBy(_.as_of.getTime)
    assert(rows.length == 3)
    val last = rows.last // at 10:59: 5m window has only the 10:59 event
    assert(last.transaction_velocity_5m == 1L)
    assert(last.spending_velocity_5m == 25.0)
    assert(last.transactions_last_hour == 3L)
    assert(last.unique_merchants_last_hour == 2L)
    assert(last.payment_success_rate_24h == 2.0 / 3.0)
    // cross-check against the batch formulas at the same instant
    val batchRow = VelocityFeatures.featuresAt(1L, ts("2024-01-01 10:59:00"), events.reverse.toList)
    assert(batchRow == last)
  }

  test("ST6 late data: a row emitted for an out-of-order event must not count future events") {
    val input = MemoryStream[TxnEvent](spark)
    input.addData(TxnEvent(3L, ts("2024-01-01 10:00:00"), 100.0, 1, success = true))
    val q = VelocityFeatures.stream(input.toDS()).writeStream
      .format("memory").queryName("velocity3").outputMode("append").start()
    q.processAllAvailable()
    // late event: 09:30 arrives AFTER the 10:00 event is in state
    input.addData(TxnEvent(3L, ts("2024-01-01 09:30:00"), 50.0, 2, success = false))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("velocity3").as[VelocityFeatures.VelocityRow]
      .collect().sortBy(_.as_of.getTime)
    val lateRow = rows.find(_.as_of == ts("2024-01-01 09:30:00")).get
    assert(lateRow.transactions_last_hour == 1L,
      "the 10:00 event is the 09:30 row's FUTURE and must not be counted")
    assert(lateRow.spending_velocity_5m == 50.0)
    assert(lateRow.payment_success_rate_24h == 0.0)
  }

  test("ST7 late group: a user arriving >24h behind the watermark must not kill the query") {
    val input = MemoryStream[TxnEvent](spark)
    // user 10 pushes the watermark to ~Jan 10; user 11 then arrives with
    // events from Jan 1 — its timeout horizon (ts+24h) sits BEFORE the
    // watermark and must be clamped, not thrown
    input.addData(TxnEvent(10L, ts("2024-01-10 12:00:00"), 1.0, 1, success = true))
    val q = VelocityFeatures.stream(input.toDS()).writeStream
      .format("memory").queryName("velocity4").outputMode("append").start()
    q.processAllAvailable()
    input.addData(TxnEvent(11L, ts("2024-01-01 00:00:00"), 2.0, 1, success = true))
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
    q.stop()
    val users = spark.table("velocity4").as[VelocityFeatures.VelocityRow]
      .collect().map(_.user_id).toSet
    assert(users.contains(10L))
  }

  test("ST7 hot key: per-user buffer cap bounds state; features degrade to newest events") {
    val input = MemoryStream[TxnEvent](spark)
    // one bot-like user floods 30 events into a single hour with cap 10
    val events = (0 until 30).map(i =>
      TxnEvent(20L, ts(f"2024-01-01 10:$i%02d:00"), 1.0, i, success = true))
    input.addData(events: _*)
    val q = VelocityFeatures.stream(input.toDS(), maxEventsPerUser = 10).writeStream
      .format("memory").queryName("velocity_cap").outputMode("append").start()
    try {
      q.processAllAvailable()
      // the next batch sees only the capped state: 10 newest prior events
      input.addData(TxnEvent(20L, ts("2024-01-01 10:45:00"), 1.0, 99, success = true))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
    } finally q.stop()
    val last = spark.table("velocity_cap").as[VelocityFeatures.VelocityRow]
      .collect().maxBy(_.as_of.getTime)
    assert(last.as_of == ts("2024-01-01 10:45:00"))
    assert(last.transactions_last_hour == 11L,
      s"capped state must hold exactly 10 prior events, saw ${last.transactions_last_hour - 1}")
    assert(last.events_dropped == 20L,
      s"capping must be observable: 30 events capped to 10 -> 20 dropped, saw ${last.events_dropped}")
  }

  test("streaming hot keys: the SpaceSaving summary stays bracketed across micro-batches") {
    // The sketch's native habitat: a complete-mode streaming aggregation
    // whose STATE is the capacity-bounded summary itself — each micro-batch
    // reduces into it incrementally (never a re-scan of the stream), and
    // after every batch the summary must bracket the exact prefix counts.
    val input = MemoryStream[String](spark)
    val q = input.toDF().toDF("entity")
      .agg(graft.ops.SpaceSavingAggregator.column($"entity", 4).as("sk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hotkeys_sketch").start()
    try {
      def summary(): Map[String, (Long, Long)] =
        spark.table("hotkeys_sketch").collect()(0)
          .getMap[String, org.apache.spark.sql.Row](0)
          .map { case (k, r) => k -> (r.getLong(0), r.getLong(1)) }.toMap
      def checkBrackets(exact: Map[String, Long], mustHold: Set[String]): Unit = {
        val sk = summary()
        assert(sk.size <= 4)
        sk.foreach { case (k, (est, err)) =>
          val t = exact.getOrElse(k, 0L)
          assert(est >= t && est - err <= t, s"$k: est=$est err=$err true=$t")
        }
        mustHold.foreach(k => assert(sk.contains(k), s"hot key $k evicted"))
      }
      val batch1 = Seq.fill(30)("hot1") ++ Seq.fill(20)("hot2") ++
        (1 to 10).map(i => s"cold$i")
      input.addData(batch1: _*)
      q.processAllAvailable()
      // N=60, threshold N/4=15: hot1 (30) and hot2 (20) are guaranteed
      checkBrackets(batch1.groupBy(identity).view.mapValues(_.length.toLong).toMap,
        Set("hot1", "hot2"))
      val batch2 = Seq.fill(30)("hot3") ++ Seq.fill(15)("hot1")
      input.addData(batch2: _*)
      q.processAllAvailable()
      // N=105, threshold 26.25: hot1 (45) and hot3 (30) are guaranteed
      checkBrackets((batch1 ++ batch2).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap, Set("hot1", "hot3"))
    } finally q.stop()
  }

  test("streaming drift monitor: micro-batches accumulate into hand-computed bucket masses") {
    import graft.streaming.DriftMonitor
    // reference: values 1..40, B=4 equi-depth buckets of 10 → boundaries
    // at the per-bucket maxima 10, 20, 30 (all but the last bucket)
    val ref = DriftMonitor.reference(
      (1 to 40).map(_.toDouble).toDF("v"), "v", 4)
    assert(ref.boundaries.toSeq == Seq(10.0, 20.0, 30.0))
    assert(ref.refMasses.toSeq == Seq(10L, 10L, 10L, 10L))

    val mon = new DriftMonitor.Monitor(ref)
    val input = MemoryStream[Double](spark)
    var last: Seq[DriftMonitor.DriftRow] = Nil
    val q = input.toDF().toDF("v").writeStream
      .foreachBatch(DriftMonitor.onBatch(mon, "v")(rows => last = rows))
      .start()
    try {
      // batch 1: 5, 15, 15, 35 → buckets 0,1,1,3 (strictly-above rule:
      // 10 itself would be bucket 0)
      input.addData(5.0, 15.0, 15.0, 35.0)
      q.processAllAvailable()
      assert(last.map(r => r.bucket -> r.nCur) ==
        Seq(0 -> 1L, 1 -> 2L, 2 -> 0L, 3 -> 1L))
      // batch 2: 25, 25, 10 (boundary value → bucket 0), 99 (past max →
      // top bucket) — cumulative masses are hand-added
      input.addData(25.0, 25.0, 10.0, 99.0)
      q.processAllAvailable()
      assert(last.map(r => r.bucket -> r.nCur) ==
        Seq(0 -> 2L, 1 -> 2L, 2 -> 2L, 3 -> 2L))
      // after batch 2 the stream is uniform over the reference deciles:
      // p_cur == p_ref == 0.25 per bucket → every chi² term is exactly 0
      assert(last.forall(_.pRef.contains(0.25)))
      assert(last.forall(_.pCur.contains(0.25)))
      assert(last.forall(_.chi2Term.contains(0.0)))
      // a replayed batch id (checkpoint recovery) must not double-count
      val replay = mon.update(Seq(5.0).toDF("v"), "v", batchId = 0L)
      assert(replay.map(r => r.bucket -> r.nCur) ==
        Seq(0 -> 2L, 1 -> 2L, 2 -> 2L, 3 -> 2L))
    } finally q.stop()
    // chi² arithmetic parity with the batch monitor on a skewed state:
    // all-new mass in bucket 0 → p_cur 1.0, term (1−.25)²/.25 = 2.25
    val mon2 = new DriftMonitor.Monitor(ref)
    val rows2 = mon2.update(Seq(1.0, 2.0, 3.0).toDF("v"), "v", 0L)
    assert(rows2.find(_.bucket == 0).flatMap(_.chi2Term).contains(2.25))
    assert(rows2.find(_.bucket == 1).flatMap(_.chi2Term).contains(0.25))
  }

  test("drift monitor: skipped equi-depth bucket ids stay aligned (positional masses)") {
    import graft.streaming.DriftMonitor
    // a heavy value (5.0 × 31 of 40 rows) swallows buckets 1-2:
    // equi-depth emits ids {0, 3} with masses {35, 5} and ONE boundary
    // (5.0). The positional rule must put the ref masses at positions
    // {0, 1}; indexing by the emitted id (the round-10 review bug) would
    // leave n_ref = 0 at position 1 and report spurious drift on an
    // identical stream
    val refVals = Seq.fill(30)(5.0) ++ (1 to 10).map(_.toDouble)
    val ref = DriftMonitor.reference(refVals.toDF("v"), "v", 4)
    assert(ref.boundaries.toSeq == Seq(5.0))
    assert(ref.refMasses.toSeq == Seq(35L, 5L))
    val mon = new DriftMonitor.Monitor(ref)
    // an identically-distributed batch: every chi² term must be ~0
    val rows = mon.update(refVals.toDF("v"), "v", 0L)
    assert(rows.map(r => r.bucket -> r.nCur) == Seq(0 -> 35L, 1 -> 5L))
    assert(rows.forall(r => r.chi2Term.contains(0.0)))
  }

  test("ST7: events beyond the 24h horizon are evicted from state") {
    val input = MemoryStream[TxnEvent](spark)
    input.addData(TxnEvent(2L, ts("2024-01-01 10:00:00"), 10.0, 1, success = true))
    val q = VelocityFeatures.stream(input.toDS()).writeStream
      .format("memory").queryName("velocity2").outputMode("append").start()
    q.processAllAvailable()
    input.addData(TxnEvent(2L, ts("2024-01-03 10:00:01"), 20.0, 2, success = true))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("velocity2").as[VelocityFeatures.VelocityRow]
      .collect().sortBy(_.as_of.getTime)
    // second emission sees only itself in every window (day-old event pruned)
    assert(rows.last.transactions_last_hour == 1L)
    assert(rows.last.payment_success_rate_24h == 1.0)
  }
}
