package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for MODE() WITHIN GROUP (sql/user_features.sql:11) with
  * the engine's deterministic tie-break (highest count, then smallest
  * value) — the one custom typed aggregate SURVEY §2.10 allows for.
  *
  * Exists as the single-pass alternative to Ops.deterministicMode (two
  * hash aggregates): the buffer is a value→count map, merged associatively,
  * so partial aggregation works map-side. Prefer this when the grouped
  * cardinality per key is modest (payment methods: ~5); prefer the
  * two-aggregate idiom when the value domain per key is unbounded (the map
  * buffer would spill).
  */
class ModeAggregator extends Aggregator[String, Map[String, Long], String] {

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) b else b.updated(v, b.getOrElse(v, 0L) + 1L)

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, n)) => acc.updated(k, acc.getOrElse(k, 0L) + n) }

  def finish(b: Map[String, Long]): String =
    if (b.isEmpty) null
    else b.minBy { case (v, n) => (-n, v) }._1 // max count, then smallest value

  // Catalyst map encoder, not Kryo: the buffer stays a native MapType (no
  // whole-map object serialization per merge, Tungsten-friendly layout).
  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[String] = Encoders.STRING
}

object ModeAggregator {
  /** Column form for untyped aggregation:
    * df.groupBy(k).agg(ModeAggregator.column(col)). */
  def column(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new ModeAggregator).apply(c)
}
