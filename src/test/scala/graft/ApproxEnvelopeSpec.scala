package graft

import org.apache.spark.sql.functions._

/** Semantic error envelopes for the sketch queries. Since round 6 the
  * envelope booleans live IN the query outputs (so the DuckDB gate
  * hash-checks them against a TRUE-emitting oracle); this spec asserts the
  * booleans hold at sf0.001 — smaller groups than the gate's sf0.01, so a
  * too-tight margin fails here first — and independently re-derives the
  * HLL envelope from the raw sketch so the check doesn't only trust the
  * query's own boolean.
  */
class ApproxEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within the HLL++ error envelope of exact") {
    val rows = jobs.StreamAnalogJobs.approxDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_within_3rsd"),
        s"${r.getAs[String]("o_orderstatus")}: sketch breaks 3σ@rsd=0.05")
    }
    // independent witness: recompute the raw sketch next to exact and
    // bound it here, not via the query's own boolean
    val raw = core.Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey")).as("approx"),
        count_distinct(col("o_custkey")).as("exact"))
      .collect()
    raw.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) <= 3 * 0.05 * exact + 1,
        s"${r.getAs[String]("o_orderstatus")}: approx=$approx exact=$exact breaks 3σ@rsd=0.05")
    }
  }

  test("percentile_approx lands within its rank-error envelope of exact") {
    // the query's m = 0.02 rank margin is 20× the accuracy=1000 guarantee;
    // sf0.001's smallest status group is the tightest case it must survive
    val rows = serving.Lookups.percentilesApprox(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val st = r.getAs[String]("o_orderstatus")
      assert(r.getAs[Boolean]("p50_in_envelope"), s"$st: p50 outside rank envelope")
      assert(r.getAs[Boolean]("p95_in_envelope"), s"$st: p95 outside rank envelope")
      assert(r.getAs[Long]("n") > 0)
    }
    // independent witness: bracket the raw sketch VALUE between exact
    // quantiles at p±m, computed here — if the query's envelope expression
    // were inverted/vacuous, this still catches a drifting sketch
    val m = 0.02
    val raw = core.Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus")
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50a"),
        expr(s"percentile(o_totalprice, ${0.5 - m})").as("p50lo"),
        expr(s"percentile(o_totalprice, ${0.5 + m})").as("p50hi"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(1000)).as("p95a"),
        expr(s"percentile(o_totalprice, ${0.95 - m})").as("p95lo"),
        expr(s"percentile(o_totalprice, ${0.95 + m})").as("p95hi"))
      .collect()
    raw.foreach { r =>
      val st = r.getAs[String]("o_orderstatus")
      assert(r.getAs[Double]("p50a") >= r.getAs[Double]("p50lo") &&
        r.getAs[Double]("p50a") <= r.getAs[Double]("p50hi"),
        s"$st: p50 sketch outside the independent exact bracket")
      assert(r.getAs[Double]("p95a") >= r.getAs[Double]("p95lo") &&
        r.getAs[Double]("p95a") <= r.getAs[Double]("p95hi"),
        s"$st: p95 sketch outside the independent exact bracket")
    }
  }
}
