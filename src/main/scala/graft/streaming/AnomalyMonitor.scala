package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-side daily z-score anomaly monitor — the streaming parity of
  * jobs/StreamAnalogJobs.dailyAnomalies, completing the monitoring pair
  * next to DriftMonitor (the reference's data-quality DAG runs BOTH a
  * distribution check and a volume/anomaly check every cycle,
  * dags/data_quality_dag.py): per micro-batch, daily revenue totals
  * accumulate as EXACT decimals; the anomaly table is recomputed over the
  * cumulative day series with arithmetic IDENTICAL to the batch job term
  * for term — the same left-folded 7-term lag chain over the same
  * once-cast doubles — so a drained stream converges to the batch
  * monitor's rows exactly (AnomalyParitySpec pins byte equality).
  *
  * State is one decimal counter per day, capped at `maxDays` (oldest
  * evicted) — bounded by the monitoring horizon, NEVER by the stream;
  * the per-batch Spark job does the daily aggregation (combinable
  * decimal sums), and only the ≤days-per-batch result crosses to the
  * driver. Cross-batch totals stay exact: BigDecimal addition of
  * per-batch exact sums equals the one-shot sum in any arrival order.
  * Replayed batchIds (checkpoint recovery) are ignored via the same
  * high-watermark idempotence as DriftMonitor.
  */
object AnomalyMonitor {

  final case class AnomalyRow(orderDate: String, dailyTotal: Double,
                              trailingDays: Long,
                              trailingMean: Option[Double],
                              trailingSd: Option[Double],
                              zScore: Option[Double], isAnomaly: Boolean)

  /** Per-batch daily totals — one combinable aggregate, exact decimals;
    * only (day, total) rows cross to the driver.
    *
    * CONTRACT DELTA vs the batch job (documented, not accidental): rows
    * with a null timestamp or null value are NOT monitorable and are
    * dropped here — the batch job surfaces them as a null-keyed /
    * null-total diagnostic row instead (route such rows to
    * dq_row_validation). Consequences: a null ts row would otherwise NPE
    * the TreeMap's string ordering and kill the streaming query, and an
    * all-null-value DAY is absent from the stream series where the batch
    * emits a null-total row that still occupies a lag-chain slot — so
    * exact batch parity (AnomalyParitySpec) holds over days with a
    * non-null date and at least one non-null value, which is every day
    * of every shipped corpus. Days with MIXED null/non-null values agree
    * exactly (both sides sum the non-null subset). */
  def dailyTotals(batch: DataFrame, tsCol: String, valueCol: String): Seq[(String, java.math.BigDecimal)] =
    batch.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(date_format(col(tsCol), "yyyy-MM-dd").as("__d"))
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("__t"))
      .collect()
      .toSeq
      .map(r => (r.getAs[String]("__d"), r.getAs[java.math.BigDecimal]("__t")))

  final class Monitor(zThreshold: Double = 2.0, maxDays: Int = 400) {
    private val totals = mutable.TreeMap.empty[String, java.math.BigDecimal]
    private var maxSeen = -1L

    def update(batch: DataFrame, tsCol: String, valueCol: String,
               batchId: Long): Seq[AnomalyRow] = synchronized {
      if (batchId > maxSeen) {
        maxSeen = batchId
        foldTotals(dailyTotals(batch, tsCol, valueCol))
      }
      snapshot()
    }

    /** Fold pre-aggregated daily totals in (the MonitorPair fused path);
      * the caller owns batchId idempotence on this entry point. */
    private[streaming] def foldTotals(
        ts: Seq[(String, java.math.BigDecimal)]): Unit = synchronized {
      ts.foreach { case (d, t) =>
        totals.updateWith(d) {
          case Some(prev) => Some(prev.add(t))
          case None       => Some(t)
        }
      }
      while (totals.size > maxDays) totals.remove(totals.firstKey): Unit
    }

    /** The batch job's scoring, term for term: days in order, lag chain
      * over the up-to-7 PRECEDING days (row adjacency, like the batch
      * window — not calendar adjacency), s1/s2 as left folds with absent
      * lags contributing 0.0, the same guarded mean/sd/z and the same
      * HALF_UP rounding points. */
    def snapshot(): Seq[AnomalyRow] = synchronized {
      def rnd4(d: Double): Double = math.floor(d * 1e4 + 0.5) / 1e4
      val days = totals.toIndexedSeq // TreeMap: already date-sorted
      val vals = days.map(_._2.doubleValue) // ONE correctly-rounded cast each
      days.indices.map { i =>
        val lags = (1 to 7).map(j => if (i - j >= 0) Some(vals(i - j)) else None)
        val cnt = lags.count(_.isDefined).toLong
        val s1 = lags.map(_.getOrElse(0.0)).reduceLeft(_ + _)
        val s2 = lags.map(l => l.map(v => v * v).getOrElse(0.0)).reduceLeft(_ + _)
        val cntD = cnt.toDouble
        val mean = if (cnt >= 1) Some(s1 / cntD) else None
        val sd = if (cnt >= 2)
          Some(math.sqrt(math.max((cntD * s2 - s1 * s1) / (cntD * (cntD - 1.0)), 0.0)))
        else None
        val z = for (m <- mean; s <- sd; if cnt == 7 && s > 0)
          yield (vals(i) - m) / s
        AnomalyRow(days(i)._1, vals(i), cnt,
          mean.map(rnd4), sd.map(rnd4), z.map(rnd4),
          z.exists(math.abs(_) > zThreshold))
      }
    }
  }

  /** foreachBatch adapter — the DriftMonitor.onBatch discipline. */
  def onBatch(monitor: Monitor, tsCol: String, valueCol: String)
             (sink: Seq[AnomalyRow] => Unit): (DataFrame, Long) => Unit =
    (batch, id) => sink(monitor.update(batch, tsCol, valueCol, id))
}
