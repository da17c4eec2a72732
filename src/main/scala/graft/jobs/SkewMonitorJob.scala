package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ops

/** Training/serving skew monitor — the online/offline consistency audit
  * every production feature store runs (the reference's migration suite
  * checks Postgres-vs-BigQuery parity the same way, sample_compare /
  * migration_queries.sql; this is the TEMPORAL version a training
  * pipeline needs): for each labeled user, compare the feature values the
  * PIT training matrix attaches at that user's LAST label event against
  * the values online serving would return at `asOf` ("now"). A non-zero
  * skew rate per feature quantifies how much the serving state has moved
  * since labels were cut — exactly the gap that silently degrades a model
  * trained offline and deployed online.
  *
  * Semantics: per user with at least one click probe at or before `asOf`,
  *   - OFFLINE value = the in-force fact at the user's last probe
  *     (forward-fill semantics, staleness band relative to the probe —
  *     identical to pitTrainingSet's contract, same shared band constant);
  *   - ONLINE value = the in-force fact at `asOf` (band relative to asOf
  *     — what the serving tier would hand out);
  *   - per feature: n_offline / n_online count non-null sides, n_both
  *     both-present, n_equal both-present-and-equal; skew_rate =
  *     1 − n_equal/n_both (NULL when nothing is comparable). Raw values
  *     are compared (no serving defaults): a default would fabricate
  *     agreement between "no value" and a real value.
  *
  * `asOf` is an explicit parameter (the F8 no-now() discipline); the
  * default is the day after the test corpus ends.
  *
  * Scale shape: ONE events scan (the shared TrainingSetJob.timeline),
  * ONE user-hashed exchange, ONE WindowExec carrying all fills + the
  * per-user last-probe/last-row markers (unordered frames on the same
  * partition spec), then a combinable per-user aggregate and a single-row
  * global rollup exploded to one row per feature. Both comparison sides
  * ride the same sort — no join between offline and online frames at all
  * (a two-frame join would re-execute the spine; the round-10 scan-audit
  * lesson). ScanAuditSpec pins the one-scan budget at the task-metric
  * level.
  */
object SkewMonitorJob {

  def defaultAsOf: String = "2024-02-01 00:00:00"

  def trainingServingSkew(spark: SparkSession, dir: String,
                          asOf: String = defaultAsOf): DataFrame = {
    val asOfTs = to_timestamp(lit(asOf))
    val lookback = expr(s"INTERVAL ${TrainingSetJob.lookbackDays} DAYS")
    val tl = TrainingSetJob.timeline(spark, dir).filter(col("__ts") <= asOfTs)

    val w = Window.partitionBy("user_id")
      .orderBy(col("__ts"), col("__prio"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wu = Window.partitionBy("user_id")
    val feats = Seq("risk_score", "credit_utilization_ratio", "alert_type")
    // ONE select so the analyzer collapses every frame into a single
    // WindowExec (the PitJoin.fill discipline)
    val filled = tl.select(
      Seq(col("user_id"), col("__ts"), col("__prio"), col("__tb")) ++
        feats.flatMap { f =>
          Seq(
            last(col(f), ignoreNulls = true).over(w).as(s"__fill_$f"),
            last(when(col(f).isNotNull, col("__ts")), ignoreNulls = true)
              .over(w).as(s"__fts_$f"))
        } ++ Seq(
          max(when(col("__prio") === 1, struct(col("__ts"), col("__tb"))))
            .over(wu).as("__last_probe"),
          max(struct(col("__ts"), col("__prio"), col("__tb")))
            .over(wu).as("__last_row")): _*)

    def banded(f: String, ref: Column): Column =
      when(col(s"__fts_$f") >= ref - lookback, col(s"__fill_$f"))
    val atProbe = struct(col("__ts"), col("__tb")) === col("__last_probe") &&
      col("__prio") === 1
    val atEnd = struct(col("__ts"), col("__prio"), col("__tb")) === col("__last_row")
    // per-user pick: the offline value rides the last-probe row, the
    // online value the last row — conditional aggregates over the one
    // windowed frame, never a second pass
    val perUser = filled.groupBy("user_id").agg(
      max(when(col("__prio") === 1, lit(1))).as("__has_probe"),
      feats.flatMap { f =>
        Seq(
          max(when(atProbe, struct(banded(f, col("__ts")).as("v"))))
            .getField("v").as(s"__off_$f"),
          max(when(atEnd, struct(banded(f, asOfTs).as("v"))))
            .getField("v").as(s"__on_$f"))
      }: _*)
      .filter(col("__has_probe") === 1)

    val global = perUser.agg(
      count(lit(1)).as("n_users"),
      feats.flatMap { f =>
        Seq(
          count(col(s"__off_$f")).as(s"__offn_$f"),
          count(col(s"__on_$f")).as(s"__onn_$f"),
          count(when(col(s"__off_$f").isNotNull && col(s"__on_$f").isNotNull,
            1)).as(s"__both_$f"),
          count(when(col(s"__off_$f").isNotNull &&
            col(s"__off_$f") === col(s"__on_$f"), 1)).as(s"__eq_$f"))
      }: _*)
    global.select(explode(array(feats.map { f =>
        struct(lit(f).as("feature"), col("n_users"),
          col(s"__offn_$f").as("n_offline"), col(s"__onn_$f").as("n_online"),
          col(s"__both_$f").as("n_both"), col(s"__eq_$f").as("n_equal"))
      }: _*)).as("r"))
      .select(col("r.feature"), col("r.n_users"), col("r.n_offline"),
        col("r.n_online"), col("r.n_both"), col("r.n_equal"),
        when(col("r.n_both") > 0,
          Ops.rnd(lit(1.0) - col("r.n_equal").cast("double")
            / col("r.n_both").cast("double"), 6)).as("skew_rate"))
  }
}
