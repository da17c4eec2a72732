package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.sinks.MergeByKey

/** Structured-Streaming event pipeline — the Spark form of the reference's
  * Kafka consumer loop (src/pipelines/feature_pipeline.py:50-309):
  *
  *   ST1 parse/validate  — from_json + validity flag + observe() counters
  *   ST2 route           — event_type → handler tag (feature_pipeline.py:154-177)
  *   ST3 invalidate      — per-batch distinct (user_id, group) refresh set
  *   ST4 point update    — key-merge into a feature table (MergeByKey)
  *   ST5 republish       — derived recompute events to a second sink
  *   ST9 delivery        — checkpointed at-least-once (a micro-batch can
  *                         replay after failure, same as the reference's
  *                         commit loop, feature_pipeline.py:99-114); becomes
  *                         effectively-exactly-once through idempotent sinks:
  *                         MergeByKey point updates are key-idempotent, and
  *                         foreachBatch consumers can dedupe on batchId
  *
  * Sources are pluggable: `.readStream.format("kafka")` in production,
  * MemoryStream in tests — everything below is source-agnostic. Scale: all
  * stages are narrow (per-row) except the per-batch distinct in the
  * invalidation set, which is bounded by batch size, not stream history.
  */
object EventPipeline {

  /** Wire schema of the event envelope (feature_pipeline.py:122-127;
    * docs/ADVANCED.md:822-827 StreamingEvent). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** S7: the production source — Kafka JSON envelope stream. The connector
    * (spark-sql-kafka) is resolved at RUNTIME by format name; this
    * environment ships without it, so tests drive the pipeline through
    * MemoryStream instead — every downstream stage is source-agnostic. */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
                  topic: String, startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** S8: the production sink — republished events back to a Kafka topic
    * (feature_pipeline.py:268-309's `<topic>-recompute` producer). */
  def kafkaSink(events: DataFrame, bootstrapServers: String, topic: String,
                checkpointDir: String): DataStreamWriter[Row] =
    events
      .select(to_json(struct(events.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** ST1: parse a raw JSON `value` column (Kafka wire shape) into the typed
    * envelope; malformed rows survive with valid=false so the stream can
    * count them (the reference drops + counts, feature_pipeline.py:118-131). */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), eventSchema).as("e"))
      .select(col("e.*"))
      .withColumn("valid",
        col("event_id").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("ts").isNotNull)

  /** Streaming dedup: drops replayed/duplicate event_ids within the
    * watermark horizon (dropDuplicatesWithinWatermark) — the streaming
    * member of the dedup family (ext/Dedup covers the batch corpus). This is
    * what turns the at-least-once source into effectively-exactly-once
    * BEFORE any non-idempotent sink. State is bounded by the watermark
    * delay, never by stream history: an event_id older than `delay` can
    * re-enter, which is the documented at-least-once residue — size the
    * delay to the source's max redelivery window. */
  def dedupeEvents(parsed: DataFrame, delay: String = "10 minutes"): DataFrame =
    parsed.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** Streaming gap sessionization: per-user session aggregates via
    * `session_window` — the native streaming form of the batch
    * StreamAnalogJobs.eventSessions analytic (there, a lag-window over
    * history; here, watermark-bounded session state that MERGES as
    * out-of-order events bridge sessions). A session closes when the
    * watermark passes its end + gap; emitted rows are final (append mode).
    * State is per OPEN session, never per event history — the shape that
    * holds at an unbounded stream. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("session"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("session_value"))
      .select(col("user_id"),
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events"), col("session_value"))

  /** Stream-stream interval join — last-touch attribution input: every
    * purchase row matched (left-outer) to the same user's clicks in the
    * preceding `window`. This is the canonical watermarked stream-stream
    * join: both sides buffer state, and the time-range condition plus the
    * two watermarks let Spark evict it — a click is droppable once the
    * watermark passes `click_ts + window`, a purchase once its own event
    * time passes the watermark. State is bounded by `delay + window` of
    * stream time, never by stream history. Unmatched purchases emit their
    * null-padded row only after the watermark proves no matching click can
    * still arrive (standard left-outer emission delay).
    *
    * The same operator runs in BATCH (Catalyst's EliminateEventTimeWatermark
    * drops the watermark nodes), where it plans as a shuffled equi-join on
    * user_id with the range predicate as a join filter — never a
    * nested-loop: the equi key carries the distribution, so the shape
    * survives both sides being large. StreamAnalogJobs.clickAttribution is
    * the oracle-checked batch form.
    *
    * Reference anchor: the click/view → payment_status_changed cache-touch
    * handler (src/pipelines/feature_pipeline.py:154-177) reacts to single
    * events; joining the click stream against the purchase stream is the
    * cross-event feature the reference computes offline in
    * transaction_features.sql's session windows. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      window: String = "1 hour",
                      delay: String = "10 minutes"): DataFrame = {
    val c = clicks.select(
        col("event_id").as("click_id"),
        col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val p = purchases.select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", delay)
    p.join(c,
        col("click_user") === col("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") > col("purchase_ts") - expr(s"INTERVAL $window"),
        "left_outer")
      .drop("click_user")
  }

  /** ST2: event-type router. The corpus event types map onto the
    * reference's four handlers (feature_pipeline.py:154-177):
    * signup→user_updated, purchase→transaction_completed,
    * error→risk_score_updated, click/view→payment_status_changed-style
    * cache touches. Unknown types are tagged for the dead-letter path. */
  def route(events: DataFrame): DataFrame =
    events.withColumn("route",
      when(col("event_type") === "signup", "user_features")
        .when(col("event_type") === "purchase", "transaction_features")
        .when(col("event_type") === "error", "risk_features")
        .when(col("event_type").isin("click", "view"), "cache_touch")
        .otherwise("dead_letter"))

  /** ST3: the cache-invalidation set of one micro-batch — distinct
    * (user_id, route) pairs whose cached features must refresh
    * (feature_pipeline.py:179-243). */
  def invalidationSet(batch: DataFrame): DataFrame =
    route(batch.filter(col("valid")))
      .filter(col("route") =!= "dead_letter")
      .select("user_id", "route").distinct()

  /** ST4: point risk-score update from one micro-batch — latest purchase
    * event per user merged into the current risk table by key
    * (feature_pipeline.py:251-266's UPDATE-by-PK). */
  def applyPointUpdates(current: DataFrame, batch: DataFrame): DataFrame = {
    val updates = graft.ops.Ops.topOnePerKey(
      batch.filter(col("valid") && col("event_type") === "purchase"),
      Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"), graft.ops.Ops.rnd(col("value") / 500.0, 4).as("risk_score"),
        col("ts").as("computed_at"))
    MergeByKey.merge(current, updates, Seq("user_id"))
  }

  /** ST5: derived recompute-trigger events for the downstream topic
    * (feature_pipeline.py:268-287). */
  def republish(events: DataFrame): DataFrame =
    route(events.filter(col("valid")))
      .filter(col("route").isin("user_features", "transaction_features", "risk_features"))
      .select(
        col("user_id"),
        col("route").as("recompute_group"),
        col("ts").as("triggered_at"))

  /** Full pipeline wiring: parsed source → foreachBatch applying the
    * invalidation + point-update handlers, with checkpointing (ST9). The
    * caller owns the sink callbacks so tests can capture them. */
  def run(source: DataFrame, checkpointDir: String)
         (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    parse(source).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => onBatch(batch, id) }
      .start()
}
