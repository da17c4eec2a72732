package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match fact rows whose timestamp falls inside
  * [start, end) of an interval table — the campaign-window / maintenance-
  * window / experiment-exposure join relational engines express as a
  * non-equi `BETWEEN` join.
  *
  * Spark has no native range-join operator; the naive plan for
  * `f JOIN i ON f.ts >= i.start AND f.ts < i.end` is a broadcast
  * nested-loop join — fine while the interval table broadcasts, quadratic
  * disaster once both sides are large. `byDay` rewrites the range
  * condition into an EQUI-join: each interval explodes into the UTC day
  * buckets it covers, facts join on their own day bucket (a hash shuffle
  * both sides), and the exact range predicate refines the bucket matches.
  * Fanout is bounded by interval length in days, so shuffle volume is
  * |facts| + |intervals|·days — the shape that survives 100 TB on both
  * sides. (For a small interval table, Spark's own broadcast
  * nested-loop on the raw predicate is already optimal; this operator
  * exists for the case where it isn't.)
  */
object IntervalJoin {

  /** Equi-join-shaped interval join on UTC day buckets. `end` is
    * exclusive; intervals must satisfy start < end. Column names of
    * `rows` and `intervals` must be disjoint. */
  def byDay(rows: DataFrame, tsCol: String,
            intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    val buckets = intervals.withColumn("__day",
      explode(sequence(
        to_date(col(startCol)),
        // end-exclusive: the last covered day is date(end - 1 microsecond)
        to_date(expr(s"$endCol - INTERVAL 1 MICROSECOND")))))
    rows.withColumn("__day", to_date(col(tsCol)))
      .join(buckets, Seq("__day"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__day")
  }
}
