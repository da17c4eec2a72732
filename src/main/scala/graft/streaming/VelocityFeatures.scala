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
  *
  * Hot-path shape (round 10 — the rework that lifted stateful throughput;
  * measured curves in PERF.md): the round-7..9 form kept state as a
  * `List[TxnEvent]` and re-filtered the whole buffer per arriving event
  * (O(buffer) list rebuild + three window filters + per-element BigDecimal
  * boxing), which made the hot-key cap the throughput governor. The buffer
  * is now four parallel primitive arrays sorted ASCENDING by event time plus
  * a success-prefix-sum, so per event:
  *   - insertion is an append (amortized O(1); late data = one arraycopy),
  *   - the 24h count/success-rate come from two binary-searched window
  *     boundaries and the prefix sum — O(log n), NO 24h scan,
  *   - only the small 1h window is scanned (merchant distinct) and only the
  *     5m window summed (exact BigDecimal, order-independent).
  * The formulas are unchanged term for term from `featuresAt` (the reference
  * implementation below, which `batch()` and the tests still run) — the
  * stateful path is cross-checked against it in StreamingSpec.
  */
object VelocityFeatures {

  case class TxnEvent(user_id: Long, ts: Timestamp, amount: Double,
                      merchant_id: Int, success: Boolean)

  /** Per-user state: column-oriented event buffer, sorted ascending by
    * `ts` (epoch millis). Primitive arrays encode/decode an order of
    * magnitude cheaper than the former `List[TxnEvent]` product encoder —
    * state-store round-trip cost was a measured throughput term. */
  case class UserBuffer(ts: Array[Long], amount: Array[Double],
                        merchant: Array[Int], success: Array[Boolean],
                        dropped: Long = 0L)

  private[streaming] val EmptyBuffer = UserBuffer(
    Array.emptyLongArray, Array.emptyDoubleArray,
    Array.emptyIntArray, Array.empty[Boolean])

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
    * State-schema note: the round-10 column-array state (and before it the
    * round-7 `dropped` field) changed the flatMapGroupsWithState state
    * encoding — a streaming checkpoint written by an earlier round's
    * operator cannot be restored by this one (standard Spark state-store
    * schema compatibility); restart such a stream from a fresh checkpoint. */
  val MaxEventsPerUser = 10000

  /** Feature row at `now` from a 24h-pruned buffer — the exact formulas of
    * ADVANCED.md:894-925. This is the REFERENCE implementation: `batch()`
    * and the oracle cross-checks run it; the stateful path computes the
    * same quantities over the array buffer (window-boundary form) and is
    * pinned equal in StreamingSpec. */
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

  /** First index in ts[0, len) with ts(i) > key (upper bound). A window
    * (now − ms, now] is then [ub(now − ms), ub(now)) — the exact integer
    * boundaries of featuresAt's `age >= 0 && age < ms`. */
  private def upperBound(ts: Array[Long], len: Int, key: Long): Int = {
    var lo = 0; var hi = len
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ts(mid) <= key) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def update(maxEvents: Int)(userId: Long, incoming: Iterator[TxnEvent],
                     state: GroupState[UserBuffer]): Iterator[VelocityRow] = {
    if (state.hasTimedOut) { // idle past the horizon: drop all state (ST7)
      state.remove()
      return Iterator.empty
    }
    val arrived = incoming.toArray.sortBy(e => (e.ts.getTime, e.merchant_id))
    if (arrived.isEmpty) return Iterator.empty
    val prior = state.getOption.getOrElse(EmptyBuffer)
    val (out, next) = processBatch(userId, arrived, prior, maxEvents)
    state.update(next)
    // evict when the watermark passes 24h idle; clamp ABOVE the current
    // watermark — a group replaying events >24h behind the stream head
    // would otherwise request a timeout in the past, which GroupState
    // rejects with an exception that kills the whole query. The cap keeps
    // the NEWEST events, so the buffer's last ts equals the uncapped max.
    val horizon = math.max(next.ts(next.ts.length - 1) + H24,
      state.getCurrentWatermarkMs() + 1)
    state.setTimeoutTimestamp(horizon)
    out.iterator
  }

  /** The per-batch core, shared by the flatMapGroupsWithState path and the
    * transformWithState experiment (VelocityTws): fold a sorted batch into
    * the prior buffer, emit one row per event against the buffer as of
    * that event, return the horizon-pruned capped buffer. Pure function of
    * its inputs — the state-API specifics (timeouts, eviction) stay with
    * the callers. */
  private[streaming] def processBatch(userId: Long, arrived: Array[TxnEvent],
      prior: UserBuffer, maxEvents: Int): (Array[VelocityRow], UserBuffer) = {
    // working buffers: prior events + room for this batch, ascending by ts;
    // okPre(i) = successes in [0, i) — the 24h success count is then a
    // prefix difference instead of a window scan
    val n0 = prior.ts.length
    val capN = n0 + arrived.length
    val ts = new Array[Long](capN); val amt = new Array[Double](capN)
    val mch = new Array[Int](capN); val ok = new Array[Boolean](capN)
    val okPre = new Array[Int](capN + 1)
    System.arraycopy(prior.ts, 0, ts, 0, n0)
    System.arraycopy(prior.amount, 0, amt, 0, n0)
    System.arraycopy(prior.merchant, 0, mch, 0, n0)
    System.arraycopy(prior.success, 0, ok, 0, n0)
    var i = 0
    while (i < n0) { okPre(i + 1) = okPre(i) + (if (ok(i)) 1 else 0); i += 1 }
    var len = n0

    // Emit one row per event, against the buffer as of that event; rows
    // carry the dropped-so-far counter so capping is observable downstream.
    // (The former per-event 24h re-prune is gone: an event outside a later
    // row's horizon is excluded by its window bounds anyway, so dropping
    // the prune changes no output — it only deferred memory reclamation,
    // which the post-batch prune below still performs.)
    val out = new Array[VelocityRow](arrived.length)
    var k = 0
    while (k < arrived.length) {
      val e = arrived(k)
      val now = e.ts.getTime
      // insertion point: in-order events append (the common case); late
      // data shifts the tail right once
      val p = if (len == 0 || ts(len - 1) <= now) len
              else upperBound(ts, len, now)
      if (p < len) {
        System.arraycopy(ts, p, ts, p + 1, len - p)
        System.arraycopy(amt, p, amt, p + 1, len - p)
        System.arraycopy(mch, p, mch, p + 1, len - p)
        System.arraycopy(ok, p, ok, p + 1, len - p)
      }
      ts(p) = now; amt(p) = e.amount; mch(p) = e.merchant_id; ok(p) = e.success
      len += 1
      var j = p
      while (j < len) { okPre(j + 1) = okPre(j) + (if (ok(j)) 1 else 0); j += 1 }

      // window boundaries by binary search over the sorted buffer
      val hi = upperBound(ts, len, now)
      val lo24 = upperBound(ts, len, now - H24)
      val lo1 = upperBound(ts, len, now - H1)
      val lo5 = upperBound(ts, len, now - M5)
      val c24 = hi - lo24
      val ok24 = okPre(hi) - okPre(lo24)
      var sum5 = BigDecimal(0) // exact decimal sum — order-independent
      j = lo5
      while (j < hi) { sum5 += BigDecimal(amt(j)); j += 1 }
      val merchants = new java.util.HashSet[Int]()
      j = lo1
      while (j < hi) { merchants.add(mch(j)); j += 1 }
      out(k) = VelocityRow(
        user_id = userId,
        as_of = e.ts,
        transaction_velocity_5m = (hi - lo5).toLong,
        spending_velocity_5m = sum5.toDouble,
        transactions_last_hour = (hi - lo1).toLong,
        unique_merchants_last_hour = merchants.size.toLong,
        payment_success_rate_24h =
          if (c24 == 0) 0.0 else ok24.toDouble / c24,
        events_dropped = prior.dropped)
      k += 1
    }

    // post-batch horizon prune, relative to the LAST processed event (the
    // round-7..9 cumulative per-event prune reduces to exactly this);
    // aged-out events are reclaimed, not "dropped" — only capping counts
    val lastTs = arrived(arrived.length - 1).ts.getTime
    val start = upperBound(ts, len, lastTs - H24)
    var keptLen = len - start
    var droppedNow = 0L
    var (kTs, kAmt, kMch, kOk) =
      (ts.slice(start, len), amt.slice(start, len),
       mch.slice(start, len), ok.slice(start, len))
    if (keptLen > maxEvents) {
      // keep the NEWEST maxEvents with the stable (ts desc, merchant asc)
      // tie-break of the earlier rounds; rare path (hot keys only)
      val idx = Array.range(0, keptLen)
        .sortBy(j => (-kTs(j), kMch(j))).take(maxEvents).sorted
      droppedNow = (keptLen - maxEvents).toLong
      kTs = idx.map(kTs); kAmt = idx.map(kAmt)
      kMch = idx.map(kMch); kOk = idx.map(kOk)
      keptLen = maxEvents
    }
    (out, UserBuffer(kTs, kAmt, kMch, kOk, prior.dropped + droppedNow))
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
