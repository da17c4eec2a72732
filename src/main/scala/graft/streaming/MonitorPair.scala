package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The fused form of the stream-side DQ pair: ONE (day, bucket) aggregate
  * per micro-batch feeds BOTH the distribution-drift monitor and the daily
  * anomaly monitor via driver-side marginalization — bucket masses are the
  * day-marginal, daily totals the bucket-marginal of the same ≤(days ×
  * B)-row result. Running the two monitors separately costs two full
  * aggregation jobs per micro-batch; the fused pass pays one.
  *
  * COST LEDGER (round-11 warm-protocol remeasurement — round 10's "10%
  * fused tax" compared a cold-JIT baseline against a warm monitored run
  * and is retracted): the fused extra job RE-EXECUTES the batch's
  * upstream plan inside foreachBatch, so its tax scales with the batch —
  * measured 46-48% of wire throughput at 10k AND 50k-row batches,
  * skew-invariant. The `observed` form below rides the caller's own sink
  * action instead (zero extra jobs on single-day batches) and measures
  * ~20% at both sizes — the shipped recommendation; `update` remains the
  * semantic reference the parity specs pin against.
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

  /** The ZERO-EXTRA-JOB form of the fused pair (round-11 finding: under a
    * warm ABAB protocol the fused aggregate job still cost ~40% of wire
    * throughput at 10k-row batches — the per-micro-batch job round-trip,
    * not the arithmetic; round 10's "10%" compared a cold baseline).
    *
    * `observed` instruments the batch with fixed-width observe() metrics —
    * B conditional bucket counts, min/max day, the exact decimal total —
    * that accumulate DURING the caller's own sink action (write/count),
    * costing per-row expression evaluation instead of a second job. Call
    * the returned thunk AFTER exactly one full-pass action on the returned
    * frame (a write or count; obs.get blocks until one completes — calling
    * it first deadlocks, and a partial-pass action like head() would fold
    * partial metrics).
    *
    * Exactness: drift masses are day-agnostic, so the B bucket sums are
    * always exact. The anomaly monitor needs PER-DAY totals: when the
    * batch's valid rows span ONE calendar day (the steady state — a
    * micro-batch of live traffic), min_day == max_day and the global total
    * IS that day's total, free; a multi-day batch (day rollover, replay,
    * backfill) falls back to one (day → total) aggregate job, ≤ days rows.
    * MonitorPairSpec pins byte-equality against update() on both shapes. */
  final class Observed private[MonitorPair] (pair: Pair,
      ref: DriftMonitor.Reference) {
    private var maxSeen = -1L

    def apply(batch: DataFrame, tsCol: String, valueCol: String, batchId: Long)
        : (DataFrame, () => (Seq[DriftMonitor.DriftRow], Seq[AnomalyMonitor.AnomalyRow])) = {
      val bnds = array(ref.boundaries.map(lit(_)).toIndexedSeq: _*)
      val ok = col(tsCol).isNotNull && col(valueCol).isNotNull
      val bucket = size(filter(bnds, x => col(valueCol).cast("double") > x))
      val day = date_format(col(tsCol), "yyyy-MM-dd")
      // the helper columns below are withColumn'd onto the caller's batch
      // and dropped after the CollectMetrics node — a caller column with
      // one of these names would be silently REPLACED and then removed
      // from the frame the sink writes (advisor finding, r11): fail loud
      require(!batch.columns.exists(Set("__gb", "__gd", "__gt")),
        s"batch columns collide with Observed's helper names __gb/__gd/__gt: ${batch.columns.mkString(",")}")
      val obs = org.apache.spark.sql.Observation()
      // bucket/day/decimal are computed ONCE per row into helper columns
      // (dropped after the CollectMetrics node) — B independent metric
      // expressions would otherwise each re-run the boundary-array filter
      // per row, and that per-row cost is the whole tax on this path
      val prepared = batch
        .withColumn("__gb", when(ok, bucket))
        .withColumn("__gd", when(ok, day))
        .withColumn("__gt", when(ok, col(valueCol).cast("decimal(12,2)")))
      val metrics: Seq[Column] =
        (0 until ref.buckets).map(b =>
          count(when(col("__gb") === b, 1)).as(s"__m$b")) ++ Seq(
          min(col("__gd")).as("__dmin"), max(col("__gd")).as("__dmax"),
          sum(col("__gt")).as("__t"))
      val inst = prepared.observe(obs, metrics.head, metrics.tail: _*)
        .drop("__gb", "__gd", "__gt")
      val complete = () => pair.synchronized {
        if (batchId > maxSeen) {
          maxSeen = batchId
          val row = obs.get
          val dmin = row("__dmin").asInstanceOf[String]
          val dmax = row("__dmax").asInstanceOf[String]
          if (dmin != null) { // null = no valid rows: nothing to fold
            val masses = Array.tabulate(ref.buckets)(b =>
              Option(row(s"__m$b")).fold(0L)(_.asInstanceOf[Long]))
            pair.drift.foldMasses(masses)
            if (dmin == dmax)
              pair.anomaly.foldTotals(Seq(
                dmin -> row("__t").asInstanceOf[java.math.BigDecimal]))
            else
              // multi-day batch: exact per-day totals need one aggregate
              // job (re-executes the batch plan — rare by construction)
              pair.anomaly.foldTotals(
                batch.filter(ok)
                  .groupBy(day.as("__d"))
                  .agg(sum(col(valueCol).cast("decimal(12,2)")).as("__t"))
                  .collect().toSeq.map(r => r.getAs[String]("__d") ->
                    r.getAs[java.math.BigDecimal]("__t")))
          }
        }
        (pair.drift.snapshot(), pair.anomaly.snapshot())
      }
      (inst, complete)
    }
  }

  /** Build the observe-piggyback monitor (see Observed's scaladoc). */
  def observed(ref: DriftMonitor.Reference, zThreshold: Double = 2.0,
               maxDays: Int = 400): Observed =
    new Observed(apply(ref, zThreshold, maxDays), ref)

  /** foreachBatch adapter — the established sink discipline. */
  def onBatch(pair: Pair, tsCol: String, valueCol: String)
             (sink: (Seq[DriftMonitor.DriftRow], Seq[AnomalyMonitor.AnomalyRow]) => Unit)
      : (DataFrame, Long) => Unit =
    (batch, id) => {
      val (d, a) = pair.update(batch, tsCol, valueCol, id)
      sink(d, a)
    }
}
