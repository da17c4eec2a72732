package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory heavy hitters: the SpaceSaving summary (Metwally et al.,
  * ICDT 2005) as a typed Aggregator, merged with the mergeable-summaries
  * rule (Agarwal et al., PODS 2012) so partial aggregation is exact
  * map-side: each of the partitions builds a capacity-bounded summary over
  * its own rows and the merge preserves the sketch's guarantees —
  *
  *   (1) est(x) ≥ true(x)                 (counts only ever over-estimate)
  *   (2) est(x) − err(x) ≤ true(x)        (err bounds the over-estimate)
  *   (3) any x with true(x) > N/capacity is present in the summary
  *
  * — which is what makes the `heavy_hitters` envelope oracle-checkable:
  * the booleans the query emits are certain, not probabilistic.
  *
  * The buffer is a native Catalyst map (item → (est, err)), never a Kryo
  * blob, and is bounded at `capacity` entries regardless of stream length
  * — the whole point: exact top-k over 100 TB needs a corpus-sized
  * shuffle, a SpaceSaving pass needs capacity×partitions rows of state.
  * Eviction and merge-truncation tie-breaks are total-ordered
  * (count, err, item) so the summary is deterministic cross-run.
  */
class SpaceSavingAggregator(capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Map[String, (Long, Long)]] {
  require(capacity > 0, "capacity must be positive")

  def zero: Map[String, (Long, Long)] = Map.empty

  def reduce(b: Map[String, (Long, Long)], v: String): Map[String, (Long, Long)] =
    if (v == null) b
    else b.get(v) match {
      case Some((c, e)) => b.updated(v, (c + 1L, e))
      case None if b.size < capacity => b.updated(v, (1L, 0L))
      case None =>
        // evict the minimum counter (deterministic tie-break), inherit its
        // count as the new item's error bound — the SpaceSaving step
        val (victim, (m, _)) = b.minBy { case (k, (c, e)) => (c, e, k) }
        (b - victim).updated(v, (m + 1L, m))
    }

  def merge(a: Map[String, (Long, Long)],
            b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    // Mergeable-summaries rule: an item absent from one side could have
    // occurred up to that side's minimum counter times unseen, so absent
    // items inherit (minOther, minOther) — but only when that side was
    // FULL (a non-full summary has seen every one of its items exactly).
    def minOf(m: Map[String, (Long, Long)]): Long =
      if (m.size < capacity) 0L else m.valuesIterator.map(_._1).min
    val (minA, minB) = (minOf(a), minOf(b))
    val merged = (a.keySet ++ b.keySet).iterator.map { k =>
      (a.get(k), b.get(k)) match {
        case (Some((ca, ea)), Some((cb, eb))) => k -> (ca + cb, ea + eb)
        case (Some((ca, ea)), None)           => k -> (ca + minB, ea + minB)
        case (None, Some((cb, eb)))           => k -> (cb + minA, eb + minA)
        case (None, None)                     => throw new IllegalStateException
      }
    }.toSeq
    if (merged.size <= capacity) merged.toMap
    else merged.sortBy { case (k, (c, e)) => (-c, e, k) }.take(capacity).toMap
  }

  def finish(b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = b

  def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, (Long, Long)]]()
  def outputEncoder: Encoder[Map[String, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, (Long, Long)]]()
}

object SpaceSavingAggregator {
  /** Column form: one summary map per group (or per frame when ungrouped). */
  def column(c: org.apache.spark.sql.Column, capacity: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new SpaceSavingAggregator(capacity)).apply(c)
}
