package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sliding-window velocity features (ST6/ST7) — spec docs/ADVANCED.md:831-935:
  * per-user exact rolling horizons (5m / 1h / 24h) over a transaction event
  * stream, with expired events evicted from state.
  *
  * The reference keeps a raw per-user event buffer and recomputes window
  * aggregates on each event (ADVANCED.md:855-881). Spark's aligned sliding
  * windows (`window(ts, "1 hour", "5 minutes")`) approximate that with
  * bucket boundaries; to match the reference's exact-horizon semantics we use
  * flatMapGroupsWithState: state = pruned event buffer, output = one feature
  * row per arriving event, eviction = 24h horizon prune + event-time timeout
  * (ST7). Watermarking bounds both state and late data.
  *
  * Scale: state is per-user and pruned to 24h — bounded by per-user event
  * rate, not stream length. The groupByKey shuffle hashes on user_id once;
  * skewed hot users are the watch item (mitigation: per-user event caps).
  */
object VelocityFeatures {

  case class TxnEvent(user_id: Long, ts: Timestamp, amount: Double,
                      merchant_id: Int, success: Boolean)

  case class UserBuffer(events: List[TxnEvent], dropped: Long = 0L)

  case class VelocityRow(
    user_id: Long, as_of: Timestamp,
    transaction_velocity_5m: Long, spending_velocity_5m: Double,
    transactions_last_hour: Long, unique_merchants_last_hour: Long,
    payment_success_rate_24h: Double,
    events_dropped: Long = 0L)

  private val H24 = 24L * 3600 * 1000
  private val H1  = 3600L * 1000
  private val M5  = 5L * 60 * 1000

  /** Hot-key guard: one user emitting more events than any window needs
    * (bot traffic) must not grow its state buffer without bound — a single
    * hot key could otherwise blow a task at scale. The buffer keeps the
    * NEWEST events up to this cap; older in-horizon events are dropped and
    * counted — the cumulative count is surfaced on every emitted row as
    * `events_dropped`, so an operator can SEE a hot key being capped — and
    * features degrade predictably toward the recent window instead of the
    * query dying.
    *
    * State-schema note: adding `dropped` to UserBuffer (and this cap)
    * changed the flatMapGroupsWithState state encoding — a streaming
    * checkpoint written by the pre-cap operator cannot be restored by this
    * one (standard Spark state-store schema compatibility); restart such a
    * stream from a fresh checkpoint. */
  val MaxEventsPerUser = 10000

  /** Feature row at `now` from a 24h-pruned buffer — the exact formulas of
    * ADVANCED.md:894-925. */
  def featuresAt(userId: Long, now: Timestamp, buf: List[TxnEvent],
                 dropped: Long = 0L): VelocityRow = {
    // lower bound matters for late data: a row emitted for an out-of-order
    // event must not count events from its future (age ∈ [0, horizon))
    def within(ms: Long) = buf.filter { e =>
      val age = now.getTime - e.ts.getTime; age >= 0 && age < ms
    }
    val w5 = within(M5); val w1h = within(H1); val w24 = within(H24)
    VelocityRow(
      user_id = userId,
      as_of = now,
      transaction_velocity_5m = w5.size,
      spending_velocity_5m = w5.map(e => BigDecimal(e.amount)).sum.toDouble,
      transactions_last_hour = w1h.size,
      unique_merchants_last_hour = w1h.map(_.merchant_id).distinct.size,
      payment_success_rate_24h =
        if (w24.isEmpty) 0.0 else w24.count(_.success).toDouble / w24.size,
      events_dropped = dropped)
  }

  private def update(maxEvents: Int)(userId: Long, incoming: Iterator[TxnEvent],
                     state: GroupState[UserBuffer]): Iterator[VelocityRow] = {
    if (state.hasTimedOut) { // idle past the horizon: drop all state (ST7)
      state.remove()
      return Iterator.empty
    }
    val arrived = incoming.toList.sortBy(e => (e.ts.getTime, e.merchant_id))
    if (arrived.isEmpty) return Iterator.empty
    val priorState = state.getOption.getOrElse(UserBuffer(Nil))
    // Emit one row per event, against the buffer as of that event; rows
    // carry the dropped-so-far counter so capping is observable downstream.
    var buf = priorState.events
    val out = arrived.map { e =>
      buf = (e :: buf).filter(x => e.ts.getTime - x.ts.getTime < H24)
      featuresAt(userId, e.ts, buf, priorState.dropped)
    }
    // Per-invocation memory is bounded by prior capped state + this batch;
    // cap once before persisting, keeping the newest events (stable order:
    // ts desc, merchant asc) and accounting for the overflow.
    val (kept, droppedNow) =
      if (buf.sizeIs > maxEvents) {
        val sorted = buf.sortBy(e => (-e.ts.getTime, e.merchant_id))
        (sorted.take(maxEvents), (buf.size - maxEvents).toLong)
      } else (buf, 0L)
    state.update(UserBuffer(kept, priorState.dropped + droppedNow))
    // evict when the watermark passes 24h idle; clamp ABOVE the current
    // watermark — a group replaying events >24h behind the stream head
    // would otherwise request a timeout in the past, which GroupState
    // rejects with an exception that kills the whole query. The cap keeps
    // the NEWEST events, so kept's max ts equals the uncapped buffer's.
    val horizon = math.max(
      kept.map(_.ts.getTime).max + H24,
      state.getCurrentWatermarkMs() + 1)
    state.setTimeoutTimestamp(horizon)
    out.iterator
  }

  /** Streaming entry: watermarked event-time state with 24h eviction and a
    * per-user buffer cap (hot-key guard). */
  def stream(events: Dataset[TxnEvent],
             maxEventsPerUser: Int = MaxEventsPerUser): Dataset[VelocityRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update(maxEventsPerUser))
  }

  /** Batch reference implementation (same formulas, windowed aggregates) —
    * used by unit tests to cross-check the stateful path and by the oracle
    * query as the SQL-expressible form. */
  def batch(events: Dataset[TxnEvent], asOf: Timestamp): Dataset[VelocityRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val buf = it.filter(e => asOf.getTime - e.ts.getTime < H24).toList
        featuresAt(uid, asOf, buf)
      }
  }
}
