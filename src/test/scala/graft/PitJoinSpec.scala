package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.PitJoin

/** Unit pins for the PitJoin contract on hand-built frames — the edge
  * semantics the big-table oracle compare can't isolate. */
class PitJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val lookback = expr("INTERVAL 10 DAYS")

  private def facts(rows: (Long, String, Long, java.lang.Double)*) =
    rows.toSeq.map { case (k, t, id, v) => (k, ts(t), id, v) }
      .toDF("user_id", "fact_ts", "fact_id", "score")

  private def probes(rows: (Long, String, Long)*) =
    rows.toSeq.map { case (k, t, id) => (k, ts(t), id) }
      .toDF("user_id", "probe_ts", "probe_id")

  private def matrix(p: org.apache.spark.sql.DataFrame,
                     f: org.apache.spark.sql.DataFrame) =
    PitJoin.trainingMatrix(p, "user_id", "probe_ts", "probe_id",
      Seq(PitJoin.Fact(f, "user_id", "fact_ts", "fact_id", "score")), lookback)
      .select("probe_id", "score").as[(Long, Option[Double])].collect().toMap

  test("as-of semantics: latest fact <= probe wins; future facts never leak") {
    val m = matrix(
      probes((1L, "2020-01-10 00:00:00", 100L)),
      facts(
        (1L, "2020-01-05 00:00:00", 1L, 0.3),
        (1L, "2020-01-08 00:00:00", 2L, 0.7),
        (1L, "2020-01-11 00:00:00", 3L, 0.9))) // future — invisible
    assert(m(100L).contains(0.7))
  }

  test("a fact AT the probe timestamp is visible (<=), and max tiebreak wins ties") {
    val m = matrix(
      probes((1L, "2020-01-10 00:00:00", 100L)),
      facts(
        (1L, "2020-01-10 00:00:00", 5L, 0.4),
        (1L, "2020-01-10 00:00:00", 9L, 0.6))) // same ts: id 9 wins
    assert(m(100L).contains(0.6))
  }

  test("staleness band: a fill older than lookback serves null") {
    val m = matrix(
      probes((1L, "2020-02-01 00:00:00", 100L), (2L, "2020-01-12 00:00:00", 200L)),
      facts(
        (1L, "2020-01-05 00:00:00", 1L, 0.3), // 27d old at probe — stale
        (2L, "2020-01-05 00:00:00", 2L, 0.5))) // 7d old — in band
    assert(m(100L).isEmpty)
    assert(m(200L).contains(0.5))
  }

  test("null fact values are ABSENT: the fill skips them to an older non-null") {
    val m = matrix(
      probes((1L, "2020-01-10 00:00:00", 100L)),
      facts(
        (1L, "2020-01-05 00:00:00", 1L, 0.3),
        (1L, "2020-01-08 00:00:00", 2L, null)))
    assert(m(100L).contains(0.3),
      "a null fact must not mask an older value (documented contract)")
  }

  test("probes with no key match or no facts at all serve null") {
    val m = matrix(
      probes((7L, "2020-01-10 00:00:00", 100L)),
      facts((1L, "2020-01-05 00:00:00", 1L, 0.3)))
    assert(m(100L).isEmpty)
  }

  test("probe columns pass through; equal-ts probes each keep their row") {
    val p = Seq(
      (1L, ts("2020-01-10 00:00:00"), 100L, "a"),
      (1L, ts("2020-01-10 00:00:00"), 101L, "b"))
      .toDF("user_id", "probe_ts", "probe_id", "tag")
    val out = PitJoin.trainingMatrix(p, "user_id", "probe_ts", "probe_id",
      Seq(PitJoin.Fact(facts((1L, "2020-01-09 00:00:00", 1L, 0.3)),
        "user_id", "fact_ts", "fact_id", "score")), lookback)
    val rows = out.select("probe_id", "tag", "score")
      .as[(Long, String, Option[Double])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((100L, "a", Some(0.3)), (101L, "b", Some(0.3))))
  }
}
