package graft

import java.sql.Timestamp

import graft.streaming.{AnomalyMonitor, DriftMonitor, MonitorPair}

/** The fused (day, bucket) pass must be indistinguishable from running the
  * two monitors separately on the same batches — marginalization exactness
  * is the whole point. */
class MonitorPairSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fused pair equals the separate monitors batch for batch") {
    val ref = DriftMonitor.reference((1 to 40).map(_.toDouble).toDF("v"), "v", 4)
    val pair = MonitorPair(ref)
    val dSolo = new DriftMonitor.Monitor(ref)
    val aSolo = new AnomalyMonitor.Monitor()

    val batches = Seq(
      Seq((ts("2024-03-01 09:00:00"), 5.0), (ts("2024-03-01 12:00:00"), 15.0),
        (ts("2024-03-02 10:00:00"), 35.0)),
      Seq((ts("2024-03-02 11:00:00"), 25.0), (ts("2024-03-03 10:00:00"), 99.0),
        (ts("2024-03-03 11:00:00"), 10.0)))
    batches.zipWithIndex.foreach { case (rows, id) =>
      val df = rows.toDF("ts", "v")
      val (dF, aF) = pair.update(df, "ts", "v", id.toLong)
      dSolo.update(df, "v", id.toLong)
      aSolo.update(df, "ts", "v", id.toLong)
      assert(dF == dSolo.snapshot(), s"drift diverged at batch $id")
      assert(aF == aSolo.snapshot(), s"anomaly diverged at batch $id")
    }
    // replay idempotence on the fused path
    val (dR, aR) = pair.update(
      Seq((ts("2024-03-01 09:00:00"), 5.0)).toDF("ts", "v"), "ts", "v", 0L)
    assert(dR == dSolo.snapshot() && aR == aSolo.snapshot())
  }

  test("observe-piggyback pair equals update() on single-day AND multi-day batches") {
    val ref = DriftMonitor.reference((1 to 40).map(_.toDouble).toDF("v"), "v", 4)
    val obs = MonitorPair.observed(ref)
    val pair = MonitorPair(ref)
    val batches = Seq(
      // single-day: the free path (global total IS the day total)
      Seq((ts("2024-03-01 09:00:00"), 5.0), (ts("2024-03-01 12:00:00"), 15.5),
        (ts("2024-03-01 13:00:00"), 35.0)),
      // multi-day: the cells-job fallback
      Seq((ts("2024-03-02 11:00:00"), 25.25), (ts("2024-03-03 10:00:00"), 99.0),
        (ts("2024-03-03 11:00:00"), 10.0)),
      // nulls in both columns: invisible to both monitors
      Seq((null.asInstanceOf[Timestamp], 7.0), (ts("2024-03-03 12:00:00"),
        Double.NaN), (ts("2024-03-04 09:00:00"), 12.75)))
    batches.zipWithIndex.foreach { case (rows, id) =>
      val df = rows.map { case (t, v) =>
        (t, if (v.isNaN) null else java.lang.Double.valueOf(v))
      }.toDF("ts", "v")
      val (inst, complete) = obs(df, "ts", "v", id.toLong)
      inst.count(): Unit // the caller's own full-pass sink action
      val (dO, aO) = complete()
      val (dU, aU) = pair.update(df, "ts", "v", id.toLong)
      assert(dO == dU, s"drift diverged at batch $id")
      assert(aO == aU, s"anomaly diverged at batch $id")
    }
    // replay idempotence: a re-observed batchId folds nothing
    val (instR, completeR) = obs(
      Seq((ts("2024-03-01 09:00:00"), 5.0)).toDF("ts", "v"), "ts", "v", 0L)
    instR.count(): Unit
    val (dR, aR) = completeR()
    val (dU, aU) = pair.update(
      Seq((ts("2024-03-01 09:00:00"), 5.0)).toDF("ts", "v"), "ts", "v", 0L)
    assert(dR == dU && aR == aU)
  }

  test("observe-piggyback: an all-invalid batch folds nothing and still snapshots") {
    val ref = DriftMonitor.reference((1 to 40).map(_.toDouble).toDF("v"), "v", 4)
    val obs = MonitorPair.observed(ref)
    val empty = Seq((null.asInstanceOf[Timestamp], null.asInstanceOf[java.lang.Double]))
      .toDF("ts", "v")
    val (inst, complete) = obs(empty, "ts", "v", 0L)
    inst.count(): Unit
    val (d, a) = complete()
    assert(a.isEmpty && d.forall(_.nCur == 0L))
  }

  test("a day split across cells and batches accumulates exactly (decimal marginals)") {
    val ref = DriftMonitor.reference((1 to 40).map(_.toDouble).toDF("v"), "v", 4)
    val pair = MonitorPair(ref)
    // same day, values landing in different buckets and batches: the
    // day total must be the exact decimal sum across all cells
    pair.update(Seq((ts("2024-03-05 09:00:00"), 5.55),
      (ts("2024-03-05 10:00:00"), 35.01)).toDF("ts", "v"), "ts", "v", 0L)
    val (_, a) = pair.update(
      Seq((ts("2024-03-05 11:00:00"), 0.14)).toDF("ts", "v"), "ts", "v", 1L)
    assert(a.map(r => r.orderDate -> r.dailyTotal) == Seq("2024-03-05" -> 40.70))
  }
}
