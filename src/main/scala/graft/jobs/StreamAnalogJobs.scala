package graft.jobs

import java.time.{Duration, Instant}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{AsOf, Roles, Tables}
import graft.ops.{AsOfJoin, Ops}
import graft.ops.Ops._
import graft.sinks.MergeByKey

/** Batch-shaped analogs of the streaming operators, for the correctness
  * gate: the streaming path (graft.streaming.*) is exercised by ScalaTest
  * with MemoryStream; these queries pin the same semantics to DuckDB oracles
  * over the static events table.
  */
object StreamAnalogJobs {

  /** ST1/ST2 analog: per-type parse/validity stats of the event envelope
    * (valid = JSON props parses; the router's input census). */
  def eventParseStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countIf(get_json_object(col("props"), "$.k").isNotNull).as("valid_props"),
        count_distinct(col("user_id")).as("n_users"))

  /** ST6 analog: exact rolling 5m/1h/24h windows at the anchor, per user —
    * the same formulas VelocityFeatures computes statefully
    * (docs/ADVANCED.md:894-925). */
  def velocityWindows(spark: SparkSession, dir: String,
                      asOf: Instant = AsOf.events): DataFrame = {
    def backLit(d: Duration) = to_timestamp(lit(AsOf.ts(asOf.minus(d))))
    val upper = to_timestamp(lit(AsOf.ts(asOf)))
    val in5m  = col("ts") >= backLit(Duration.ofMinutes(5))
    val in1h  = col("ts") >= backLit(Duration.ofHours(1))
    Tables.events(spark, dir)
      // both bounds: an asOf inside the data range must not count future events
      .filter(col("ts") >= backLit(Duration.ofHours(24)) && col("ts") < upper)
      .groupBy("user_id")
      .agg(
        countIf(in5m).as("transaction_velocity_5m"),
        orZeroD(sumMoney(in5m, col("value"))).as("spending_velocity_5m"),
        countIf(in1h).as("transactions_last_hour"),
        countDistinctIf(in1h, get_json_object(col("props"), "$.k"))
          .as("unique_merchants_last_hour"),
        ratio(countIf(col("event_type") =!= "error"), count(lit(1)))
          .as("payment_success_rate_24h"))
  }

  /** S9/ST4 analog: merge last-7d risk-score updates into the prior
    * snapshot — updates win, untouched users survive. */
  def mergeUpsert(spark: SparkSession, dir: String,
                  asOf: Instant = AsOf.events): DataFrame = {
    val cut = to_timestamp(lit(AsOf.minusDays(asOf, 7)))
    val scores = Roles.riskScores(spark, dir)
    def latest(df: DataFrame) = topOnePerKey(df,
      Seq(col("user_id")), Seq(col("computed_at").desc, col("score_id").desc))
      .select("user_id", "risk_score", "computed_at")
    val old     = latest(scores.filter(col("computed_at") < cut))
    val updates = latest(scores.filter(col("computed_at") >= cut))
    MergeByKey.merge(old, updates, Seq("user_id"))
  }

  /** The as-of band: a risk score older than this is stale and serves as
    * no-score. SEMANTIC constant, not just an optimization — adding the
    * band changed asOfRisk's output for probes whose latest score predates
    * it (documented; consistent with risk_features.sql's 7-day recency
    * posture) — so the job and OracleSql.asOfRisk MUST carry the identical
    * value; both read this field. */
  val asOfRiskLookbackDays: Int = 90

  /** Point-in-time-correct feature lookup (SURVEY §7.5): the risk score in
    * force at each click event — the leakage-free training-set join. Banded
    * with `asOfRiskLookbackDays` (AsOfJoin's maxLookback knob): a score
    * older than the band is stale and serves as no-score (0.0), and the
    * band is what bounds per-probe join state at deep fact histories —
    * without it every probe matches its key's ENTIRE score history before
    * top-1. The oracle carries the identical band (same constant). */
  def asOfRisk(spark: SparkSession, dir: String): DataFrame = {
    val clicks = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("probe_id"), col("user_id"), col("ts").as("probe_ts"))
    val scores = Roles.riskScores(spark, dir)
    AsOfJoin.asOf(scores, clicks, "user_id", "computed_at", "probe_ts", "score_id",
        probeId = "probe_id",
        maxLookback = Some(expr(s"INTERVAL $asOfRiskLookbackDays DAYS")))
      .select(
        col("probe_id"), col("p.user_id").as("user_id"),
        date_format(col("probe_ts"), "yyyy-MM-dd HH:mm:ss").as("probe_ts"),
        coalesce(col("risk_score"), lit(0.0)).as("risk_score_asof"))
  }

  /** ST6(a): aligned tumbling windows — the window() batch counterpart of
    * the exact rolling horizons (1h buckets; sliding is the same op with a
    * step < width). */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        orZeroD(sumMoney(lit(true), col("value"))).as("total_value"))
      .select(col("user_id"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket_start"),
        col("n_events"), col("total_value"))

  /** Gap-based sessionization — the classic training-data segmentation op
    * (and the analytic-window family W4 the reference never needed): events
    * more than 30 minutes apart start a new session; per-user session
    * stats come from a lag + running-sum window, then two aggregations. */
  def eventSessions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapped = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = gapped.groupBy("user_id", "session_id").agg(
      count(lit(1)).as("n_events"),
      (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
        .as("duration_secs"))
    sessions.groupBy("user_id").agg(
      count(lit(1)).as("n_sessions"),
      sum(col("n_events")).as("total_events"),
      max(col("n_events")).as("max_session_events"),
      sum(col("duration_secs")).as("total_session_secs"))
  }

  /** Token frequency over the corpus — the canonical distributed word count
    * (explode → map-side-combinable groupBy), top terms by a total order. */
  def wordCounts(spark: SparkSession, dir: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // top-N via orderBy+limit (TakeOrderedAndProject) BEFORE the rank
    // window: a global window over the full vocabulary single-partitions
    // the whole token table at scale; here the window sees <= topN rows,
    // so its single partition is bounded by construction.
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("token").asc)))
  }

  /** Interval-join rollup: per-promo-window event stats over a
    * deterministic weekly window dim (five 3-day windows across the events
    * range). Exercises ops/IntervalJoin.byDay — the bucketized equi-join
    * form of the non-equi range join (see its scaladoc for why the naive
    * BNL shape dies at scale). */
  def intervalAgg(spark: SparkSession, dir: String): DataFrame = {
    val windows = spark.range(5).select(
      col("id").as("window_id"),
      expr("timestampadd(DAY, CAST(id * 7 AS INT), " +
        "to_timestamp('2024-01-01 00:00:00'))").as("w_start"))
      .withColumn("w_end", expr("w_start + INTERVAL 3 DAY"))
    graft.ops.IntervalJoin
      .byDay(Tables.events(spark, dir), "ts", windows, "w_start", "w_end")
      .groupBy("window_id")
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        orZeroD(sumMoney(lit(true), col("value"))).as("total_value"))
  }

  /** Incremental aggregate maintenance — the nightly-refresh upgrade every
    * feature store at scale wants: per-(user, day) partial aggregates are
    * the persisted artifact; the serving-grain rollup merges PARTIALS, not
    * raw events. count/sum/min/max are algebraic (partials compose
    * exactly), the sum stays in DECIMAL until the final cast so the merged
    * result is bit-identical to a direct recompute, and avg derives from
    * the merged exact sums. A day's re-ingest touches one partial row per
    * user — the raw-event shuffle never reruns for history.
    * IncrementalAggSpec pins merge(partials) == direct(recompute). */
  def incrementalUserStats(spark: SparkSession, dir: String): DataFrame =
    mergePartials(dailyPartials(Tables.events(spark, dir)))

  /** Stage 1: the per-(user, day) partial-aggregate table (what the nightly
    * job persists; ~|users|·|days| rows, orders of magnitude smaller than
    * the event log). */
  def dailyPartials(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(12,2)")).as("sumv"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))

  /** Stage 2: merge partials to the serving grain (shuffles the partial
    * table only). */
  def mergePartials(partials: DataFrame): DataFrame =
    partials.groupBy("user_id")
      .agg(
        sum(col("cnt")).as("n_events"),
        sum(col("sumv")).as("__sumv"),
        min(col("min_ts")).as("first_ts"),
        max(col("max_ts")).as("last_ts"))
      .select(
        col("user_id"), col("n_events"),
        col("__sumv").cast("double").as("total_value"),
        Ops.rnd(col("__sumv").cast("double") / col("n_events").cast("double"), 4)
          .as("avg_value"),
        col("first_ts"), col("last_ts"))

  /** The five event types of the synthetic event log — pinned so the pivot
    * never runs the extra distinct-values collection pass (at 100 TB the
    * value list must be declared, not discovered). */
  private[graft] val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Wide per-user activity vector via pivot — the conditional-agg
    * "long → wide" reshape every feature store serves (one column per event
    * type). With the value list pinned, pivot compiles to one combinable
    * groupBy of CASE aggregates — a single shuffle on user_id, no second
    * pass. Missing (user, type) combos surface as 0, not null. */
  def eventTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    pivoted.select(col("user_id") +:
      EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
  }

  /** Trend features over the order history: per-day totals, then a 7-row
    * moving average and a running cumulative total — the moving-window
    * family (W4/F17) on the time axis. The window is intentionally
    * UN-partitioned: it runs over the per-DAY aggregate (rows = distinct
    * days, thousands at any corpus size), never over raw orders — the daily
    * groupBy is the shuffle that scales, the window input is bounded by the
    * calendar. Sums stay in DECIMAL through the frame so the moving average
    * is exact-sum ÷ exact-count. */
  def movingDailyTotals(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).as("__sum"))
    val w = Window.orderBy("order_date")
    val w7 = w.rowsBetween(-6, Window.currentRow)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(
      col("order_date"), col("n_orders"),
      col("__sum").cast("double").as("daily_total"),
      Ops.rnd(
        sum(col("__sum")).over(w7).cast("double")
          / count(lit(1)).over(w7).cast("double"), 4).as("avg_7d"),
      sum(col("__sum")).over(wCum).cast("double").as("cum_total"))
  }

  /** A/B experiment readout — the analytics staple the funnel/cohort
    * family completes: users deterministically hash-assigned to arms
    * (Corpus.unitHash — the same engine-independent Knuth hash as the
    * samplers, so an assignment never changes under reruns or corpus
    * relayout, the property an experiment MUST keep), then per-arm
    * conversion and spend with `lift` vs the control arm.
    *
    * Determinism: per-user spend goes through exact DECIMAL sums (2-dp
    * values, cast identically on both engines); the arm-level average
    * re-accumulates those per-user doubles as DECIMAL (order-free), and
    * lift reads the control rate via a first_value window over the 2-row
    * arm frame. Scale: two user-keyed combinable aggregates — the same
    * shuffle key back-to-back, so the layout is reused. */
  def abMetric(spark: SparkSession, dir: String,
               controlFrac: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(countIf(col("event_type") === "purchase").as("__purchases"),
        orZeroD(sumMoney(lit(true), col("value"))).as("__spend"))
      .withColumn("arm",
        when(graft.ext.Corpus.unitHash(col("user_id")) < controlFrac, "A")
          .otherwise("B"))
    val perArm = perUser.groupBy("arm").agg(
      count(lit(1)).as("n_users"),
      countIf(col("__purchases") > 0).as("converted_users"),
      sum(col("__spend").cast("decimal(18,2)")).as("__spend_sum"))
    val w = Window.orderBy("arm")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rate = col("converted_users").cast("double") / col("n_users").cast("double")
    perArm.select(col("arm"), col("n_users"), col("converted_users"),
        Ops.rnd(rate, 6).as("conversion_rate"),
        Ops.rnd(col("__spend_sum").cast("double")
          / col("n_users").cast("double"), 6).as("avg_spend"),
        Ops.rnd(rate, 6).as("__r"))
      .withColumn("lift",
        Ops.rnd(col("__r") - first_value(col("__r")).over(w), 6))
      .drop("__r")
  }

  /** Strict-ordered conversion funnel — the product-analytics sequential
    * pattern (view → click → purchase, each step's FIRST occurrence
    * strictly after the previous step's): per user, t₁ = min ts of step 1,
    * tᵢ = min ts of step i among events after tᵢ₋₁. A user who clicks
    * before ever viewing does not convert at the click stage — the strict
    * chain is what distinguishes a funnel from three independent counts.
    *
    * Scale shape (round-10 rework): ONE events scan, ONE user-hashed
    * exchange. Each stage time is a conditional min over an UNORDERED
    * per-user window frame, chained — tᵢ's window expression references
    * tᵢ₋₁'s, so the analyzer stacks dependent Window nodes over the same
    * partitioning (no sort needed for unordered frames, no new exchange);
    * a per-user aggregate then collapses to one row per user and a global
    * aggregate counts each stage. The round-9 join-chain form re-scanned
    * events once per (stage, consumer) — the shuffle audit measured FIVE
    * full decodes of the events table for the 3-step funnel (each stage's
    * count re-executed every earlier stage's scan subtree); this form is
    * pinned at one in ScanAuditSpec. Output is identical row for row. */
  def eventFunnel(spark: SparkSession, dir: String,
                  steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy("user_id")
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin(steps: _*))
      .select("user_id", "event_type", "ts")
    val withTimes = steps.zipWithIndex.foldLeft(ev) { case (df, (step, i)) =>
      val hit = col("event_type") === step &&
        (if (i == 0) lit(true) else col("ts") > col(s"__t${i - 1}"))
      df.withColumn(s"__t$i", min(when(hit, col("ts"))).over(w))
    }
    val perUser = withTimes.groupBy("user_id")
      .agg(max(col("__t0")).as("__t0"),
        steps.indices.tail.map(i => max(col(s"__t$i")).as(s"__t$i")): _*)
    val counts = perUser.agg(
      count(col("__t0")).as("__n0"),
      steps.indices.tail.map(i => count(col(s"__t$i")).as(s"__n$i")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i).as("stage_idx"), lit(step).as("stage"),
          col(s"__n$i").as("n_users"), col("__n0").as("__first"))
      }: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_users"),
        // ANSI guard: an empty first stage would divide by zero
        Ops.rnd(when(col("r.__first") > 0,
          col("r.n_users").cast("double") / col("r.__first").cast("double")),
          4).as("pct_of_first"))
  }

  /** Rolling z-score anomaly detection over the daily revenue series — the
    * monitoring shape a pipeline runs after every ingest: each day scored
    * against the TRAILING week only (rows -7..-1 — the current day never
    * contaminates its own baseline, so a spike can't mask itself). Days
    * without a full trailing week score null (cold start), as does a
    * zero-variance baseline.
    *
    * Determinism: per-day totals accumulate as DECIMALs (order-
    * independent), cast ONCE to doubles — NOT exact (no non-integer
    * multiple of 0.01 is), but a NARROW decimal (value·100 < 2⁵³) casts
    * in one correctly-rounded step on both engines, so the doubles are
    * IDENTICAL — and the trailing sums are an EXPLICIT 7-term lag chain
    * with fixed left association, so both engines run the identical
    * scalar IEEE ops on those identical inputs.
    * A windowed SUM would NOT be deterministic here: the sum of squares
    * carries ~18 significant digits, and casting that wide a DECIMAL to
    * double rounds differently across engines (Java's BigDecimal is
    * correctly rounded; an int128/10^scale path double-rounds — caught
    * as a 1-ulp trailing_sd flip by the sf0.1 oracle sweep), while
    * engine window internals (frame iteration vs segment trees) pick
    * different association orders for raw double sums. The rounded
    * z_score deliberately uses the SHARED floor-based round point even
    * though z can be negative (a negative half rounds toward +∞ — a
    * documented deviation from the repo's HALF_UP-on-non-negatives
    * convention; the identical formula on both engines is what the hash
    * gate needs). Scale: the lag window runs over the DAILY frame (365
    * rows/year — trivially one task), while the corpus-sized work is the
    * combinable daily aggregate. */
  def dailyAnomalies(spark: SparkSession, dir: String,
                     zThreshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("__t"))
      .withColumn("__td", col("__t").cast("double"))
    val w = Window.orderBy("order_date")
    val lags = (1 to 7).map(i => lag(col("__td"), i).over(w))
    val cnt = lags.map(l => when(l.isNotNull, 1L).otherwise(0L))
      .reduceLeft(_ + _)
    val s1 = lags.map(l => coalesce(l, lit(0.0))).reduceLeft(_ + _)
    val s2 = lags.map(l => coalesce(l * l, lit(0.0))).reduceLeft(_ + _)
    val cntD = cnt.cast("double")
    // ANSI guards: the cold-start rows see an EMPTY trailing window
    // (cnt = 0 ⇒ mean divides by zero) or a 1-row one (cnt−1 = 0 ⇒ sd
    // does); CASE branches evaluate lazily, so the gated forms never run
    // the division there
    val scored = daily.select(
      col("order_date"), col("__td").as("daily_total"),
      cnt.as("trailing_days"),
      when(cnt >= 1, s1 / cntD).as("__mean"),
      // greatest(…, 0): a ~zero-variance window can go epsilon-negative
      // under double cancellation — sqrt would NaN here and ERROR in
      // DuckDB, so both engines clamp identically
      when(cnt >= 2,
        sqrt(greatest((cntD * s2 - s1 * s1) / (cntD * (cntD - lit(1.0))),
          lit(0.0)))).as("__sd"))
    scored.select(
      col("order_date"), col("daily_total"), col("trailing_days"),
      Ops.rnd(col("__mean"), 4).as("trailing_mean"),
      Ops.rnd(col("__sd"), 4).as("trailing_sd"),
      Ops.rnd(when(col("trailing_days") === 7 && col("__sd") > 0,
        (col("daily_total") - col("__mean")) / col("__sd")), 4).as("z_score"),
      coalesce(
        when(col("trailing_days") === 7 && col("__sd") > 0,
          abs((col("daily_total") - col("__mean")) / col("__sd")) > zThreshold),
        lit(false)).as("is_anomaly"))
  }

  /** A16: approximate distinct counts checked against their exact witness.
    * The HLL estimate itself is engine-specific (no other engine reproduces
    * Spark's sketch), so the oracle-visible column is the ERROR ENVELOPE:
    * a boolean pinning |approx - exact| within 3x the sketch's default
    * relative standard deviation (rsd 0.05). HLL merge is a register-wise
    * max — commutative and associative — so the estimate, and therefore the
    * boolean, is deterministic under any partitioning; the DuckDB oracle
    * emits TRUE and the driver's hash compare becomes a semantic gate on
    * the sketch's accuracy contract rather than a rows-only count. */
  /** Sketch-based hot-key detection over the event stream — the workload
    * SpaceSaving was built for (Metwally et al.: popular items in a stream
    * a counter table can't hold). The generator's tables are deliberately
    * UNIFORM (TPC-H style), so the hot entities a production stream would
    * contain are derived deterministically from the event row itself —
    * 3 of every 4 events collapse onto 4 hot entity keys, the rest keep
    * per-user keys (~150-entity tail) — the same integer expression on
    * both engines, openly synthetic and documented as such.
    *
    * For every TRUE hot key (exact count × `capacity` > stream length, by
    * cross-multiplication) the query reports the exact count plus two
    * booleans the SpaceSaving summary (ops/SpaceSavingAggregator) must
    * satisfy BY THEOREM: presence in the capacity-bounded summary, and
    * est ≥ true ≥ est − err. The oracle emits the same exacts with
    * TRUE/TRUE — the guarantees are deterministic, not probabilistic, so
    * the envelope is hashable (same pattern as approxDistinct below).
    *
    * Scale shape: the exact side is one combinable groupBy (the local
    * WITNESS; at 100 TB you'd ship only the sketch — capacity×partitions
    * rows of state, no corpus-sized shuffle); the sketch side is a single
    * partial-aggregated SpaceSaving pass whose 1-row summary broadcasts
    * back over the (entity-sized) hot-key frame. */
  def hotKeys(spark: SparkSession, dir: String, capacity: Int): DataFrame = {
    val keys = Tables.events(spark, dir).select(
      when(col("event_id") % 4 < 3, concat(lit("u"), (col("user_id") % 4).cast("string")))
        .otherwise(concat(lit("u"), (col("user_id") + 100).cast("string")))
        .as("entity"))
    // the total rides the entity-count frame (global unordered window
    // over the entity-cardinality rows), not a third scan of events:
    // Σ n_events IS count(*), and the round-10 scan audit showed the
    // three-branch form decoding events three times. The sketch pass
    // stays a separate scan BY DESIGN — a one-pass sketch compared
    // against its exact witness is necessarily two passes.
    val counts = keys.groupBy("entity").agg(count(lit(1)).as("n_events"))
      .withColumn("__n", sum(col("n_events")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val sketch = keys.agg(
      graft.ops.SpaceSavingAggregator.column(col("entity"), capacity).as("__sk"))
    val entry = element_at(col("__sk"), col("entity"))
    counts
      .filter(col("n_events") * capacity > col("__n"))
      .crossJoin(broadcast(sketch))
      .select(col("entity"), col("n_events"),
        entry.isNotNull.as("sketch_found"),
        (entry.getField("_1") >= col("n_events") &&
          entry.getField("_1") - entry.getField("_2") <= col("n_events"))
          .as("est_within_bounds"))
  }

  /** Cohort retention — the classic product-analytics rollup: users grouped
    * by first-activity day (their cohort), then for each (cohort, day
    * offset) the fraction of the cohort active that day. Integer counts
    * throughout, ONE correctly-rounded division per output row.
    *
    * Scale shape (round-10 rework): ONE events scan on a single spine —
    * the distinct (user, day) activity frame (combinable distinct, far
    * smaller than events), the cohort day as a per-user unordered window
    * min, the (cohort_day, offset) rollup (a frame bounded by days²,
    * never user- or event-sized), and cohort sizes read off the SAME
    * rollup: the offset-0 row IS the cohort size (every member is active
    * on their first day by definition), picked by a per-cohort window
    * over the days²-bounded frame. The round-9 form derived cohorts and
    * sizes as separate aggregate branches joined back — the shuffle
    * audit measured THREE full events decodes (AQE re-executes shared
    * subtrees under join/broadcast consumers; see PERF round-10). Output
    * is identical row for row; pinned in ScanAuditSpec. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val act = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("cohort_day",
        min(col("day")).over(Window.partitionBy("user_id")))
    val rollup = act
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("active_users")))
          .over(Window.partitionBy("cohort_day")))
    rollup.select(col("cohort_day").cast("string").as("cohort_day"),
      col("day_offset"), col("active_users"), col("cohort_size"),
      Ops.rnd(col("active_users").cast("double")
        / col("cohort_size").cast("double"), 6).as("retention_rate"))
  }

  /** Sketch-table rollup — the incremental-warehouse pattern for distinct
    * counts at 100 TB: materialize ONE HLL sketch per (day) partition (the
    * only corpus-sized pass), then answer every rolling window by merging
    * the tiny per-day sketches (register-wise max — commutative,
    * associative, re-aggregable), never re-scanning events. Exact rolling
    * COUNT(DISTINCT) cannot pre-aggregate at all (distinct sets don't
    * compose); this is the standard trade and the query demonstrates it.
    *
    * The per-day estimate rides the same error-envelope oracle as
    * approxDistinct: the exact 7-day distinct is computed as a local
    * WITNESS (the 7× band fan-out the sketch table exists to avoid), and
    * the boolean pins |merged-sketch estimate − exact| within the
    * envelope. Datasketches HLL (lgK 12, rsd ≈ 1.6%) merged across ≤7
    * sketches stays well inside 5% + 1. */
  def rollingDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("__sk"))
    val days = daily.select(col("day").as("d"))
    val merged = broadcast(days)
      .join(daily, col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy("d")
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__approx"),
        count(lit(1)).as("days_merged"))
    val exact = broadcast(days)
      .join(ev, col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy("d")
      .agg(count_distinct(col("user_id")).as("exact_users_7d"))
    exact.join(merged, Seq("d"))
      .select(col("d").cast("string").as("day"),
        col("exact_users_7d"), col("days_merged"),
        (abs(col("__approx") - col("exact_users_7d"))
          <= col("exact_users_7d") * lit(0.05) + lit(1)).as("approx_within_bound"))
  }

  /** Stream-stream join analog: last-touch click→purchase attribution over
    * the static events table — the batch form of
    * EventPipeline.attributionJoin (same operator; the watermark nodes are
    * eliminated in batch planning). Every purchase row carries how many of
    * the user's clicks preceded it within 1h and the gap to the latest one;
    * left-outer keeps never-attributed purchases (n_clicks_1h = 0).
    * Aggregates are argmax-free (count / max), so the result is
    * deterministic without tie-break rules. Plans as a shuffled equi-join
    * on user_id + hash aggregate on the purchase key — both sides scale. */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val pairs = graft.streaming.EventPipeline.attributionJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      window = "1 hour")
    pairs
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(
        max(col("purchase_ts")).as("purchase_ts"),
        max(col("purchase_value")).as("purchase_value"),
        count(col("click_id")).as("n_clicks_1h"),
        (unix_timestamp(max(col("purchase_ts")))
          - unix_timestamp(max(col("click_ts")))).as("last_click_gap_s"))
      .withColumn("attributed", col("n_clicks_1h") > 0)
  }

  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        approx_count_distinct(col("o_custkey")).as("__approx"),
        count_distinct(col("o_custkey")).as("exact_users"),
        count(lit(1)).as("n_orders"))
      .select(
        col("o_orderstatus"), col("exact_users"), col("n_orders"),
        // +1 absolute slack: at tiny group cardinalities a 1-off estimate
        // exceeds any purely relative bound (exact=5, approx=6 → off by
        // 20%) without violating the sketch's accuracy contract; the
        // envelope spec's independent recompute uses the same form
        (abs(col("__approx") - col("exact_users"))
          <= col("exact_users") * lit(0.15) + lit(1)).as("approx_within_3rsd"))
}
