package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles via a count-by-value decomposition.
  *
  * Spark's exact `Percentile` aggregate buffers a value→count map PER GROUP
  * inside the aggregation buffer; for an unbounded-cardinality value column
  * (e.g. 2-dp order totals) that map grows with the number of distinct
  * values in the group — a working-set hazard at 100× scale, and the
  * reference itself reaches for APPROX_QUANTILES on its warehouse path
  * (docs/PERFORMANCE.md:552-559) for exactly this reason. This computes the
  * IDENTICAL interpolated result through bounded-memory operators:
  *
  *   1. count-by-value — map-side-combinable groupBy(group, value); the
  *      shuffle carries (group, value, count) ROWS, never a per-group map;
  *   2. a running-sum window per group over the ordered value counts gives
  *      each value its covered index range [lo, hi) in the group's sorted
  *      order — a streaming frame (sort + running sum, spillable), not a
  *      buffered one;
  *   3. the two values flanking each percentile's fractional position are
  *      picked with combinable max(when(...)) aggregates and interpolated
  *      with `Percentile.getPercentile`'s own formula, term for term:
  *      pos = p·(n−1);  (ceil(pos)−pos)·v_lo + (pos−floor(pos))·v_hi.
  *
  * Parallelism is by group at the window stage (a group's value counts sort
  * on one task), but the corpus-sized work — tokenless scan, count-by-value
  * combine — is fully parallel, and the per-group sorted stream spills;
  * nothing holds a group's distinct values in one in-memory buffer.
  *
  * Nulls in `valueCol` are filtered up front (the same skip-null semantics
  * as `Percentile`), so `n` equals the non-null count per group.
  *
  * CONTRACT DELTA vs Spark's `Percentile`: a group whose values are ALL
  * null is dropped from the output entirely (it never reaches the
  * count-by-value table), whereas `Percentile` would emit the group with a
  * NULL percentile. Every current caller feeds a non-null value column;
  * BoundedPercentileSpec pins the drop so a future caller meets it in a
  * test, not in production.
  */
object BoundedPercentile {

  /** Step 1 alone — the count-by-value table `(groupCol, __v, __c)`. The
    * ONLY pass over the source; everything downstream (exact percentiles,
    * rank envelopes, sketches over the weight-expanded values) is sized by
    * distinct values, so a caller needing several of those shares this one
    * frame.
    *
    * The trailing `repartition(groupCol)` is THE one-scan mechanism, not a
    * flourish (round-10 finding, measured with task-metric inputRecords):
    * plan-level ReuseExchange/AQE stage reuse does NOT physically dedupe
    * this subtree when one consumer needs a bare ENSURE_REQUIREMENTS
    * exchange over it — the shape every cumulated-window consumer has.
    * The executed-plan STRING shows `ReusedExchange`, but two identical
    * map stages run and the source is scanned twice (ScanAuditSpec pins
    * the truth at the task-metric level; plan-string pins alone are
    * provably insufficient). With the explicit group repartition, every
    * downstream consumer — the cumsum window, the totals aggregate, the
    * sketch over weight-expanded values, broadcast build sides — finds its
    * distribution already satisfied and reads the ONE materialized
    * exchange; measured: exactly one source scan, and one FEWER total
    * exchange than the ENSURE_REQUIREMENTS form. Map-side combine still
    * happens in the groupBy's own partial aggregate below the shuffle. */
  def countByValue(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
      .repartition(col(groupCol))

  /** Exact percentiles of `valueCol` per `groupCol`.
    *
    * @param ps    (percentile, output column name) pairs
    * @param scale output rounding (HALF_UP digits, Ops.rnd)
    * @return one row per group: groupCol, one column per `ps`, and `n`
    *         (non-null value count)
    */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
            ps: Seq[(Double, String)], scale: Int): DataFrame =
    exactFromCounts(countByValue(df, groupCol, valueCol), groupCol, ps, scale)

  /** Steps 2–3 over a pre-built count-by-value table, with optional extra
    * work fused into the SAME per-group pass — the hook percentilesApprox
    * uses to ride its envelope rank counts on the pick aggregate instead of
    * re-scanning the source:
    *
    *   - `joined` frames (one row per group, e.g. a sketch frame) are
    *     broadcast onto the cumulated table before aggregation, so
    *     `extraAggs` may reference their columns;
    *   - `extraAggs` are combinable aggregates evaluated next to the value
    *     picks; they may reference `__v` (value), `__c` (count), `__lo` /
    *     `__hi` (the value's cumulative [lo, hi) index range) and any
    *     `joined` column;
    *   - `extraOut` are output expressions over the agg aliases and `__n`
    *     (the group's non-null count), appended after the `n` column.
    */
  /** Expand `(value, count)` rows back into `count` rows of `value` with
    * BOUNDED intermediates: three nested chunk levels, so no single row
    * ever materializes an array longer than `chunk` (level 3) or
    * `count / chunk²` (level 1 — 60k elements even at a trillion rows of
    * ONE exact value in one group, with chunk = 4096). The naive
    * `array_repeat(v, count.cast("int"))` both wraps counts past 2³¹
    * (silently DROPPING that value's weight) and builds a count-element
    * array in one row — this is the scale-safe form. Exact for counts up
    * to chunk² · 2³¹ (≈ 3.6·10¹⁶ at the default — beyond any physical
    * table). Output: `keep` columns plus `out` (the expanded value). */
  def weightExpand(cnt: DataFrame, keep: Seq[String], valueCol: String,
                   countCol: String, out: String, chunk: Int = 4096): DataFrame = {
    val c1 = chunk.toLong
    val c2 = c1 * c1
    val keepCols = keep.map(col)
    // `div`, not `/`: Spark's / on longs is double division, which loses
    // exactness past 2⁵³ — the very regime this helper exists for
    cnt.filter(col(countCol) > 0)
      .select(keepCols ++ Seq(col(valueCol), col(countCol).cast("long").as("__w"),
        explode(sequence(lit(0L), expr(s"(cast(`$countCol` as bigint) - 1L) div ${c2}L"))).as("__k2")): _*)
      .select(keepCols ++ Seq(col(valueCol),
        least(lit(c2), col("__w") - col("__k2") * c2).as("__r2")): _*)
      .select(keepCols ++ Seq(col(valueCol), col("__r2"),
        explode(sequence(lit(0L), expr(s"(`__r2` - 1L) div ${c1}L"))).as("__k1")): _*)
      .select(keepCols :+ explode(array_repeat(col(valueCol),
        least(lit(c1), col("__r2") - col("__k1") * c1).cast("int"))).as(out): _*)
  }

  /** The cumulated form of a count-by-value table: each value row gains
    * its [__lo, __hi) index range in the group's sorted order (running-sum
    * window, spillable). The shared scaffold of every consumer of the
    * decomposition — exact percentiles, equi-depth histograms, quantile
    * normalization, drift bucketing — so the construction (and any fix to
    * it) lives once. */
  def cumulated(cnt: DataFrame, groupCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy("__v")
    cnt.withColumn("__hi", sum(col("__c")).over(w))
      .withColumn("__lo", col("__hi") - col("__c"))
  }

  def exactFromCounts(cnt: DataFrame, groupCol: String,
                      ps: Seq[(Double, String)], scale: Int,
                      joined: Seq[DataFrame] = Nil,
                      extraAggs: Seq[Column] = Nil,
                      extraOut: Seq[Column] = Nil): DataFrame = {
    // the group total __n rides an UNORDERED window frame over the SAME
    // partition spec as the running sum: one sort, two frames, zero extra
    // exchanges, and — the round-10 point — a SINGLE consumer of `cnt`.
    // The previous totals-aggregate + broadcast-join-back scaffold made
    // `cnt` a two-consumer subtree, and task-metric accounting showed AQE
    // re-executing it (source scanned twice) in exactly that topology
    // (ScanAuditSpec pins the fix; robustOutliers pioneered this form).
    // Null groups keep working for free: the window partitions by the
    // group key directly (a null group is its own partition), where the
    // old null-safe <=> join had to defend them explicitly.
    val j0 = cumulated(cnt, groupCol)
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    val j = joined.zipWithIndex.foldLeft(j0) { case (acc, (f, i)) =>
      acc.join(broadcast(f).as(s"j$i"),
          acc(groupCol) <=> col(s"j$i.$groupCol"))
        .drop(col(s"j$i.$groupCol"))
    }

    // a value with cumulative range [lo, hi) owns 0-indexed sorted
    // positions lo .. hi-1 of its group
    def at(k: Column): Column =
      max(when(col("__lo") <= k && k < col("__hi"), col("__v")))
    def pos(p: Double): Column = lit(p) * (col("__n") - 1).cast("double")
    val picks = ps.zipWithIndex.flatMap { case ((p, _), i) =>
      Seq(at(floor(pos(p))).as(s"__vlo$i"), at(ceil(pos(p))).as(s"__vhi$i"))
    } ++ extraAggs
    val g = j.groupBy(col(groupCol), col("__n")).agg(picks.head, picks.tail: _*)
    val outs = ps.zipWithIndex.map { case ((p, name), i) =>
      val x = pos(p)
      val v = when(floor(x) === ceil(x), col(s"__vlo$i"))
        .otherwise((ceil(x) - x) * col(s"__vlo$i") + (x - floor(x)) * col(s"__vhi$i"))
      Ops.rnd(v, scale).as(name)
    }
    g.select(col(groupCol) +: outs ++: (col("__n").as("n") +: extraOut): _*)
  }
}
