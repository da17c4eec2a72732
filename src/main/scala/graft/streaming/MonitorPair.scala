package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused form of the stream-side DQ pair: ONE (day, bucket) aggregate
  * per micro-batch feeds BOTH the distribution-drift monitor and the daily
  * anomaly monitor via driver-side marginalization — bucket masses are the
  * day-marginal, daily totals the bucket-marginal of the same ≤(days ×
  * B)-row result. Running the two monitors separately costs two full
  * aggregation jobs per micro-batch, which StreamBench measured at ~47% of
  * the wire path's throughput; the fused pass pays one.
  *
  * Marginalization is exact: counts are longs, totals are per-cell exact
  * decimals added with BigDecimal — identical to what each monitor's own
  * aggregate would have produced (MonitorPairSpec pins equality against
  * the separate monitors on the same batches).
  *
  * Null handling is the INTERSECTION of the two monitors' contracts: rows
  * with a null value are invisible to both (DriftMonitor filters them,
  * AnomalyMonitor's contract delta documents them); rows with a null
  * timestamp count for drift but not for anomalies when run separately —
  * here they are excluded from BOTH (drift's bucket masses lose rows a
  * lone DriftMonitor would count; acceptable for a fused monitoring path
  * and documented, since an unstamped event is not attributable to a
  * monitoring day). Use the separate monitors when that distinction
  * matters.
  */
object MonitorPair {

  // constructor is private to the companion: a Pair wired with a Monitor
  // built from a DIFFERENT Reference (different bucket count) would make
  // foldMasses read past the shorter masses array — only apply(), which
  // derives both from one Reference, can construct one
  final class Pair private[MonitorPair] (
      val drift: DriftMonitor.Monitor,
      val anomaly: AnomalyMonitor.Monitor,
      ref: DriftMonitor.Reference) {
    private var maxSeen = -1L

    def update(batch: DataFrame, tsCol: String, valueCol: String,
               batchId: Long): (Seq[DriftMonitor.DriftRow], Seq[AnomalyMonitor.AnomalyRow]) =
      synchronized {
        if (batchId > maxSeen) {
          maxSeen = batchId
          val bnds = array(ref.boundaries.map(lit(_)).toIndexedSeq: _*)
          val cells = batch
            .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
            .groupBy(
              date_format(col(tsCol), "yyyy-MM-dd").as("__d"),
              size(filter(bnds, x => col(valueCol).cast("double") > x))
                .as("__b"))
            .agg(count(lit(1)).as("__n"),
              sum(col(valueCol).cast("decimal(12,2)")).as("__t"))
            .collect()
          val masses = Array.fill(ref.buckets)(0L)
          cells.foreach(r => masses(r.getAs[Int]("__b")) += r.getAs[Long]("__n"))
          drift.foldMasses(masses)
          val byDay = cells.groupBy(_.getAs[String]("__d")).toSeq
            .map { case (d, rows) =>
              d -> rows.map(_.getAs[java.math.BigDecimal]("__t"))
                .reduce(_.add(_))
            }
          anomaly.foldTotals(byDay)
        }
        (drift.snapshot(), anomaly.snapshot())
      }
  }

  def apply(ref: DriftMonitor.Reference, zThreshold: Double = 2.0,
            maxDays: Int = 400): Pair =
    new Pair(new DriftMonitor.Monitor(ref),
      new AnomalyMonitor.Monitor(zThreshold, maxDays), ref)

  /** foreachBatch adapter — the established sink discipline. */
  def onBatch(pair: Pair, tsCol: String, valueCol: String)
             (sink: (Seq[DriftMonitor.DriftRow], Seq[AnomalyMonitor.AnomalyRow]) => Unit)
      : (DataFrame, Long) => Unit =
    (batch, id) => {
      val (d, a) = pair.update(batch, tsCol, valueCol, id)
      sink(d, a)
    }
}
