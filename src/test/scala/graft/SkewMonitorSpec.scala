package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.jobs.SkewMonitorJob

/** Hand-computed semantics pins for the training/serving skew monitor on
  * a fixture events table — the temporal edges (fact between last label
  * and asOf, fact after asOf, user without labels, null-vs-null) that the
  * big-table oracle compare can't isolate. */
class SkewMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** events.parquet fixture rows: (event_id, ts, user_id, event_type, value). */
  private def writeEvents(dir: String,
                          rows: (Long, String, Long, String, Double)*): Unit =
    rows.toSeq.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def skewOf(dir: String, asOf: String): Map[String, (Long, Long, Long, Long, Long)] =
    SkewMonitorJob.trainingServingSkew(spark, dir, asOf)
      .select("feature", "n_users", "n_offline", "n_online", "n_both", "n_equal")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("a fact arriving between the last label and asOf is skew; one that doesn't move is agreement") {
    val dir = java.nio.file.Files.createTempDirectory("skew1").toString
    writeEvents(dir,
      // user 1: purchase (risk fact) 0.3 -> click label -> purchase 0.9
      // before asOf: offline risk = ROUND(150/500) = 0.3, online = 0.9 -> skew
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 150.0),
      (2L, "2024-01-02 00:00:00", 1L, "click", 300.0),
      (3L, "2024-01-03 00:00:00", 1L, "purchase", 450.0),
      // user 2: view (credit fact) then click, nothing after -> agreement
      (4L, "2024-01-01 00:00:00", 2L, "view", 100.0),
      (5L, "2024-01-02 00:00:00", 2L, "click", 10.0))
    val m = skewOf(dir, "2024-01-10 00:00:00")
    // risk: user1 offline+online non-null (skewed), user2 never had a risk fact
    assert(m("risk_score") == ((2L, 1L, 1L, 1L, 0L)))
    // credit: user2 agrees; user1 has no credit fact either side
    assert(m("credit_utilization_ratio") == ((2L, 1L, 1L, 1L, 1L)))
    // alerts: nobody has any -> all zero, and null-null is NOT agreement
    assert(m("alert_type") == ((2L, 0L, 0L, 0L, 0L)))
  }

  test("facts after asOf are invisible to BOTH sides; users without labels are excluded") {
    val dir = java.nio.file.Files.createTempDirectory("skew2").toString
    writeEvents(dir,
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 150.0),
      (2L, "2024-01-02 00:00:00", 1L, "click", 300.0),
      (3L, "2024-01-20 00:00:00", 1L, "purchase", 450.0), // after asOf
      (4L, "2024-01-03 00:00:00", 2L, "purchase", 250.0)) // no click: excluded
    val m = skewOf(dir, "2024-01-10 00:00:00")
    // only user 1 counts; the post-asOf purchase never leaks -> both sides
    // see the 0.3 fact -> agreement
    assert(m("risk_score") == ((1L, 1L, 1L, 1L, 1L)))
  }

  test("the staleness band is anchored per side: probe for offline, asOf for online") {
    val dir = java.nio.file.Files.createTempDirectory("skew3").toString
    // band is 90 days (TrainingSetJob.lookbackDays): fact 2023-10-01,
    // probe 2023-12-15 (76d later: in band offline), asOf 2024-01-15
    // (106d later: STALE online)
    writeEvents(dir,
      (1L, "2023-10-01 00:00:00", 1L, "purchase", 150.0),
      (2L, "2023-12-15 00:00:00", 1L, "click", 300.0))
    val m = skewOf(dir, "2024-01-15 00:00:00")
    assert(m("risk_score") == ((1L, 1L, 0L, 0L, 0L)))
  }
}
