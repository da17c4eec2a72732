package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.jobs.DataQualityJob
import graft.ops.BoundedPercentile

/** Stream-side distribution-drift monitor — the streaming parity of
  * jobs/DataQualityJob.distributionDrift, run where the reference's
  * data-quality DAG runs (every 4h over fresh data,
  * dags/data_quality_dag.py:39): the REFERENCE histogram is computed once
  * from a batch frame, frozen into a ≤B-element boundary array, and every
  * micro-batch's values are bucketed against it in foreachBatch (the ST8
  * posture — the boundary array rides the closure exactly like the
  * reference-bucket broadcast rides the batch plan).
  *
  * The drift row set after each batch is over the CUMULATIVE current
  * masses, so the monitor's output converges to the batch monitor's as
  * the stream drains — same bucket rule (count of boundaries strictly
  * below the value), same chi² arithmetic (rational on exact counts,
  * deliberately not PSI — see distributionDrift's scaladoc), same round
  * points.
  *
  * State is B cumulative counters on the driver — bounded by the bucket
  * count, NEVER by the stream (the per-batch Spark job does the
  * bucketing; only the B-row result crosses to the driver). A restart
  * replays counts from the checkpoint's replayed batches; for
  * exactly-once counters across restarts, persist `state` keyed by
  * batchId (the S8/ST9 sink discipline) — the monitor accepts replayed
  * batchIds idempotently when the caller passes them.
  */
object DriftMonitor {

  /** The frozen reference: bucket boundaries (per-bucket max of all but
    * the last bucket — distributionDrift's rule) plus the reference
    * bucket masses the chi² compares against. */
  final case class Reference(boundaries: Array[Double], refMasses: Array[Long]) {
    def buckets: Int = refMasses.length
  }

  /** Build the frozen reference from a batch frame (ONE scan: the
    * equi-depth histogram's count-by-value collapse). The boundary array
    * is ≤B elements — driver-safe by construction. */
  def reference(ref: DataFrame, valueCol: String, buckets: Int): Reference = {
    val hist = DataQualityJob.equiDepthOf(ref, valueCol, buckets)
      .select("bucket", "n_rows", "hi_value")
      .collect().sortBy(_.getAs[Int]("bucket"))
    // an empty (or all-null-value) reference would freeze a zero-bucket
    // Reference whose first micro-batch then indexes past the empty masses
    // array inside foreachBatch — fail at construction with the real cause
    require(hist.nonEmpty,
      s"drift reference is empty: '$valueCol' has no non-null rows")
    val bnds = hist.dropRight(1).map(_.getAs[Double]("hi_value"))
    // POSITIONAL indexing, deliberately NOT the emitted equi-depth bucket
    // id: current values are bucketed as "count of boundaries strictly
    // below", which for a reference row in the i-th PRESENT bucket is
    // exactly i — present buckets 0..i-1 each contribute one boundary
    // below it. Equi-depth ids can skip (a heavy value swallows
    // successors); indexing masses by the emitted id would shift every
    // post-skip bucket one slot off the positional rule and report
    // spurious drift on an identically-distributed stream (round-10
    // review finding, pinned by the skip-case StreamingSpec test).
    val masses = hist.map(_.getAs[Long]("n_rows"))
    Reference(bnds, masses)
  }

  /** Bucket masses of ONE frame against frozen boundaries — a single
    * combinable aggregate; the ≤B-element array is a literal in the plan
    * (the broadcast-equivalent for a closure-sized constant). Returns a
    * dense Array[Long] of size buckets, indexed by bucket. */
  def bucketMasses(batch: DataFrame, valueCol: String, ref: Reference): Array[Long] = {
    val bnds = array(ref.boundaries.map(lit(_)).toIndexedSeq: _*)
    val rows = batch.filter(col(valueCol).isNotNull)
      .select(size(filter(bnds,
        x => col(valueCol).cast("double") > x)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect()
    val masses = Array.fill(ref.buckets)(0L)
    rows.foreach(r => masses(r.getAs[Int]("bucket")) += r.getAs[Long]("n"))
    masses
  }

  /** The running monitor: B cumulative counters + the frozen reference.
    * `update` folds one micro-batch in and returns the drift table over
    * the cumulative masses — columns and arithmetic identical to
    * distributionDrift's output (bucket, n_ref, n_cur, p_ref, p_cur,
    * chi2_term). Replayed batchIds (checkpoint recovery) are ignored. */
  final class Monitor(ref: Reference) {
    private val cur = Array.fill(ref.buckets)(0L)
    // batch ids are monotone in Structured Streaming and a checkpoint
    // replay revisits the LAST id, so a high-watermark is O(1) idempotence
    // state (a seen-set would grow one entry per micro-batch forever)
    private var maxSeen = -1L

    def update(batch: DataFrame, valueCol: String, batchId: Long): Seq[DriftRow] =
      synchronized {
        if (batchId > maxSeen) {
          maxSeen = batchId
          foldMasses(bucketMasses(batch, valueCol, ref))
        }
        snapshot()
      }

    /** Fold pre-aggregated masses in (the MonitorPair fused path computes
      * them from its single (day, bucket) aggregate); the caller owns
      * batchId idempotence when using this entry point directly. */
    private[streaming] def foldMasses(m: Array[Long]): Unit = synchronized {
      var i = 0
      while (i < cur.length) { cur(i) += m(i); i += 1 }
    }

    /** Drift rows over the cumulative state (distributionDrift's formula:
      * chi² term (p_cur − p_ref)²/p_ref on exact-count ratios, rounded at
      * the shared 6-digit point; buckets with neither mass are absent,
      * mirroring the batch monitor's groupBy). */
    def snapshot(): Seq[DriftRow] = synchronized {
      val nRef = ref.refMasses.sum
      val nCur = cur.sum
      def rnd6(d: Double): Double = math.floor(d * 1e6 + 0.5) / 1e6
      (0 until ref.buckets).flatMap { b =>
        if (ref.refMasses(b) == 0L && cur(b) == 0L) None
        else {
          val pRef = if (nRef > 0) Some(ref.refMasses(b).toDouble / nRef) else None
          val pCur = if (nCur > 0) Some(cur(b).toDouble / nCur) else None
          val chi = for (r <- pRef; c <- pCur; if r > 0)
            yield rnd6((c - r) * (c - r) / r)
          Some(DriftRow(b, ref.refMasses(b), cur(b),
            pRef.map(rnd6), pCur.map(rnd6), chi))
        }
      }
    }
  }

  final case class DriftRow(bucket: Int, nRef: Long, nCur: Long,
                            pRef: Option[Double], pCur: Option[Double],
                            chi2Term: Option[Double])

  /** foreachBatch adapter: wire a parsed value stream into a Monitor and
    * surface each batch's cumulative drift table to the callback — the
    * same sink discipline as EventPipeline.run (caller owns checkpointing
    * via the surrounding writeStream). */
  def onBatch(monitor: Monitor, valueCol: String)
             (sink: Seq[DriftRow] => Unit): (DataFrame, Long) => Unit =
    (batch, id) => sink(monitor.update(batch, valueCol, id))
}
