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
  */
object BoundedPercentile {

  /** Exact percentiles of `valueCol` per `groupCol`.
    *
    * @param ps    (percentile, output column name) pairs
    * @param scale output rounding (HALF_UP digits, Ops.rnd)
    * @return one row per group: groupCol, one column per `ps`, and `n`
    *         (non-null value count)
    */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
            ps: Seq[(Double, String)], scale: Int): DataFrame = {
    val cnt = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCol).orderBy("__v")
    val cum = cnt
      .withColumn("__hi", sum(col("__c")).over(w))
      .withColumn("__lo", col("__hi") - col("__c"))
    val tot = cnt.groupBy(groupCol).agg(sum(col("__c")).as("__n"))
    // the totals frame is one row per group — broadcast it back. The join
    // is NULL-SAFE on the group key: groupBy keeps a null group (exactly
    // like the Percentile aggregate), so a plain equi-join would silently
    // drop it here
    val j = cum.as("c")
      .join(broadcast(tot).as("t"), col(s"c.$groupCol") <=> col(s"t.$groupCol"))
      .drop(col(s"t.$groupCol"))

    // a value with cumulative range [lo, hi) owns 0-indexed sorted
    // positions lo .. hi-1 of its group
    def at(k: Column): Column =
      max(when(col("__lo") <= k && k < col("__hi"), col("__v")))
    def pos(p: Double): Column = lit(p) * (col("__n") - 1).cast("double")
    val picks = ps.zipWithIndex.flatMap { case ((p, _), i) =>
      Seq(at(floor(pos(p))).as(s"__vlo$i"), at(ceil(pos(p))).as(s"__vhi$i"))
    }
    val g = j.groupBy(col(groupCol), col("__n")).agg(picks.head, picks.tail: _*)
    val outs = ps.zipWithIndex.map { case ((p, name), i) =>
      val x = pos(p)
      val v = when(floor(x) === ceil(x), col(s"__vlo$i"))
        .otherwise((ceil(x) - x) * col(s"__vlo$i") + (x - floor(x)) * col(s"__vhi$i"))
      Ops.rnd(v, scale).as(name)
    }
    g.select(col(groupCol) +: outs :+ col("__n").as("n"): _*)
  }
}
