package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.jobs.StreamAnalogJobs
import graft.streaming.AnomalyMonitor

/** Stream/batch parity for the daily z-score anomaly monitor: the same
  * order rows driven through micro-batches must converge to EXACTLY the
  * batch job's table — same totals (cross-batch decimal accumulation),
  * same lag-chain moments, same rounding, same anomaly verdicts. */
class AnomalyParitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 12 days: stable ~1000/day baseline, a 5x spike on day 10 (z >> 2),
  // varied fills so means/sds are non-trivial; day totals split across
  // rows AND across micro-batches to exercise exact re-accumulation
  private val rows: Seq[(Timestamp, Double)] =
    (1 to 12).flatMap { d =>
      val day = f"2024-03-$d%02d"
      val base = Seq(
        (ts(s"$day 09:00:00"), 400.0 + d * 3),
        (ts(s"$day 13:30:00"), 350.5 + d),
        (ts(s"$day 21:15:00"), 250.25))
      if (d == 10) base :+ ((ts(s"$day 23:00:00"), 4000.01)) else base
    }

  test("stream-side daily anomalies converge to the batch monitor exactly") {
    val dir = java.nio.file.Files.createTempDirectory("anomaly").toString
    rows.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val batch = StreamAnalogJobs.dailyAnomalies(spark, dir)
      .orderBy("order_date").collect()

    val mon = new AnomalyMonitor.Monitor()
    val input = MemoryStream[(Timestamp, Double)](spark)
    var last: Seq[AnomalyMonitor.AnomalyRow] = Nil
    val q = input.toDF().toDF("o_orderdate", "o_totalprice").writeStream
      .foreachBatch(AnomalyMonitor.onBatch(mon, "o_orderdate", "o_totalprice")(
        r => last = r))
      .start()
    try {
      // three chunks with a day boundary INSIDE a chunk and one day
      // (day 7) split across chunks 2 and 3
      val (c1, rest) = rows.splitAt(10)
      val (c2, c3) = rest.splitAt(10)
      Seq(c1, c2, c3).foreach { c =>
        input.addData(c: _*); q.processAllAvailable()
      }
    } finally q.stop()

    assert(last.size == batch.length)
    last.zip(batch).foreach { case (s, b) =>
      assert(s.orderDate == b.getAs[String]("order_date"))
      assert(s.dailyTotal == b.getAs[Double]("daily_total"))
      assert(s.trailingDays == b.getAs[Long]("trailing_days"))
      def opt(n: String): Option[Double] =
        if (b.isNullAt(b.fieldIndex(n))) None else Some(b.getAs[Double](n))
      assert(s.trailingMean == opt("trailing_mean"), s"mean @ ${s.orderDate}")
      assert(s.trailingSd == opt("trailing_sd"), s"sd @ ${s.orderDate}")
      assert(s.zScore == opt("z_score"), s"z @ ${s.orderDate}")
      assert(s.isAnomaly == b.getAs[Boolean]("is_anomaly"))
    }
    // the spike day must actually have fired
    assert(last.exists(r => r.orderDate == "2024-03-10" && r.isAnomaly))
    // replayed batch id: no double count
    val replay = mon.update(
      Seq((ts("2024-03-01 10:00:00"), 999.0)).toDF("o_orderdate", "o_totalprice"),
      "o_orderdate", "o_totalprice", batchId = 0L)
    assert(replay == last)
  }

  test("null ts / null value rows are dropped, not fatal (documented contract delta)") {
    val mon = new AnomalyMonitor.Monitor()
    val rows = Seq[(Option[Timestamp], Option[Double])](
      (None, Some(50.0)),
      (Some(ts("2024-03-01 10:00:00")), None),
      (Some(ts("2024-03-01 11:00:00")), Some(100.0)))
      .toDF("o_orderdate", "o_totalprice")
    val snap = mon.update(rows, "o_orderdate", "o_totalprice", 0L)
    assert(snap.map(r => r.orderDate -> r.dailyTotal) == Seq("2024-03-01" -> 100.0))
  }

  test("state is bounded: days beyond maxDays are evicted oldest-first") {
    val mon = new AnomalyMonitor.Monitor(maxDays = 5)
    (1 to 9).foreach { d =>
      mon.update(
        Seq((ts(f"2024-03-$d%02d 10:00:00"), 100.0 * d))
          .toDF("o_orderdate", "o_totalprice"),
        "o_orderdate", "o_totalprice", batchId = d.toLong)
    }
    val snap = mon.snapshot()
    assert(snap.size == 5)
    assert(snap.head.orderDate == "2024-03-05")
    assert(snap.last.orderDate == "2024-03-09")
  }
}
