package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct training-matrix builder — the one genuinely new
  * operator class a feature store adds over the reference's query surface
  * (SURVEY §7.5 phase 3; reference evidence: the `updated_at`-keyed feature
  * tables in sql/bigquery_schema.sql:19-25 plus the freshness-is-oldest-group
  * serving semantics in store.py:189-201). Given a labeled probe frame
  * (key, probeTs, …) and N timestamped fact tables, attach to each probe the
  * latest fact value per table with factTs <= probeTs — never a value from
  * the future, so a model trained on the matrix sees exactly what online
  * serving would have seen at each label's moment.
  *
  * HOW, and why not N AsOfJoins: chaining `AsOfJoin.asOf` once per fact
  * table pays, per table, a key-hashed shuffle of the (growing) probe frame,
  * a shuffle of the fact table, and a probe-keyed top-1 window — ~3N
  * exchanges. This builder instead UNIONS probes and all fact tables into
  * one per-key timeline and forward-fills each fact column with a running
  * `last(ignoreNulls)` window: ONE key-hashed exchange and ONE sort carry
  * ALL fact tables, the canonical Spark shape for multi-source PIT joins.
  * The window frame is running (rowsBetween unbounded-preceding → current),
  * so state per row is O(fact tables), spillable, never a per-key buffer.
  *
  * Ordering contract: rows sort by (ts, prio, tiebreak) where facts carry
  * prio 0 and probes prio 1 — a fact AT the probe's timestamp is visible
  * (the `<=` as-of convention), and among equal-timestamp facts of one
  * table the largest tiebreak wins (last in sort order), matching
  * AsOfJoin's `tiebreak.desc` top-1.
  *
  * Staleness band: like AsOfJoin's `maxLookback`, each fill carries the
  * timestamp of the fact it came from; a fill older than `lookback` at the
  * probe's ts is nulled. Forward-fill-then-null equals band-filtered as-of
  * top-1 exactly: the overall-latest fact within the band IS the
  * band-latest fact, and if the overall-latest is stale every older one is
  * too.
  *
  * Scale: the exchange hashes on `key` alone, so a hot key's timeline sorts
  * on one task — the same per-user-window exposure as sessionization
  * (StreamAnalogJobs.eventSessions); AQE skew-join handling does not apply
  * to windows, so a pathologically hot key needs probe-side salting with a
  * per-salt fact replica (not built — no such key shape exists in any role
  * table, where keys are users).
  *
  * NULL fact values are treated as ABSENT (the fill skips them and an
  * older non-null value wins); callers with meaningful nulls must encode
  * them (PitJoinSpec pins this).
  */
object PitJoin {

  /** One timestamped fact table: `value` is the column to carry onto
    * probes; `ts` its event time; `tiebreak` a NUMERIC total-order column
    * for equal-ts rows (AsOfJoin's tiebreak contract). */
  case class Fact(df: DataFrame, key: String, ts: String,
                  tiebreak: String, value: String)

  /** Forward-fill core over a pre-built timeline frame — exposed separately
    * so a caller whose probes and facts all derive from ONE source (e.g.
    * the events table roles) can build the timeline with conditional
    * projections of a single scan instead of a union of N re-scans
    * (jobs/TrainingSetJob does exactly that; the generic `trainingMatrix`
    * below feeds this same core).
    *
    * @param valueCols fact columns to fill; each must be null on rows it
    *                  does not apply to (probe rows, other tables' rows)
    * @param lookback  staleness band: a fill whose source-row ts is older
    *                  than `ts - lookback` becomes null
    */
  def fill(timeline: DataFrame, key: String, ts: String, prio: String,
           tb: String, valueCols: Seq[String], lookback: Column): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col(prio), col(tb))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE select carrying every fill: all the last() expressions share one
    // (partition, order) spec, so the analyzer extracts them into a SINGLE
    // WindowExec — chained withColumn would interleave Projects between
    // Window nodes and defeat the collapse (pinned in ScaleShapeSpec)
    val others = timeline.columns.toSeq.filterNot(valueCols.contains)
    timeline.select(
      others.map(col) ++ valueCols.map { v =>
        when(
          last(when(col(v).isNotNull, col(ts)), ignoreNulls = true).over(w)
            >= col(ts) - lookback,
          last(col(v), ignoreNulls = true).over(w)).as(v)
      }: _*)
  }

  /** The generic N-table PIT join: unions probes and facts into a timeline
    * and forward-fills. Probe columns other than (key, probeTs) pass
    * through unchanged; each fact contributes one output column named by
    * its `value`.
    *
    * @param probeTb NUMERIC tiebreak on the probe frame (e.g. the probe
    *                id) — only for deterministic sort order; probes never
    *                fill anything
    */
  def trainingMatrix(probes: DataFrame, key: String, probeTs: String,
                     probeTb: String, facts: Seq[Fact],
                     lookback: Column): DataFrame = {
    val valueCols = facts.map(_.value)
    require(valueCols.distinct.size == valueCols.size,
      s"fact value columns must be distinct: $valueCols")
    val probeCarry = probes.columns.toSeq
      .filterNot(c => c == key || c == probeTs)
    val valueTypes = facts.map(f =>
      f.value -> f.df.schema(f.value).dataType).toMap

    def nullV(v: String): Column = lit(null).cast(valueTypes(v)).as(v)
    val probeSide = probes.select(
      col(key).as("__key") +: col(probeTs).as("__ts") +: lit(1).as("__prio") +:
        col(probeTb).cast("long").as("__tb") +:
        (valueCols.map(nullV) ++ probeCarry.map(col)): _*)
    val factSides = facts.map { f =>
      f.df.select(
        col(f.key).as("__key") +: col(f.ts).as("__ts") +: lit(0).as("__prio") +:
          col(f.tiebreak).cast("long").as("__tb") +:
          (valueCols.map(v => if (v == f.value) col(v) else nullV(v)) ++
            probeCarry.map(c => lit(null).cast(probes.schema(c).dataType).as(c))): _*)
    }
    val timeline = factSides.foldLeft(probeSide)(_.unionByName(_))
    fill(timeline, "__key", "__ts", "__prio", "__tb", valueCols, lookback)
      .filter(col("__prio") === 1)
      .select(col("__key").as(key) +: col("__ts").as(probeTs) +:
        (probeCarry.map(col) ++ valueCols.map(col)): _*)
  }
}
