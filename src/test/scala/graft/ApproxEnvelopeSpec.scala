package graft

import org.apache.spark.sql.functions._

/** Semantic error envelopes for the sketch queries that the DuckDB gate
  * can only rows-check (sketch outputs are engine-specific by
  * construction): assert each sketch lands within its DOCUMENTED bound of
  * the exact witness the query already carries, so the approx family has
  * a real correctness check, not just a row count.
  */
class ApproxEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within the HLL++ error envelope of exact") {
    // Spark's default relativeSD is 0.05; assert 3 standard deviations
    // (p ~ 0.997 per group) so the test never flakes while still catching
    // a broken sketch (which is off by orders of magnitude, not percent)
    val rows = jobs.StreamAnalogJobs.approxDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) <= 3 * 0.05 * exact + 1,
        s"${r.getAs[String]("o_orderstatus")}: approx=$approx exact=$exact breaks 3σ@rsd=0.05")
    }
  }

  test("percentile_approx lands within its rank-error envelope of exact") {
    // percentile_approx(accuracy=1000) guarantees rank error <= 1/1000;
    // assert the approx VALUE lies between the exact quantiles at
    // q ± 0.01 (10× the guarantee — distribution-free and non-flaky)
    val eps = 0.01
    val env = core.Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus")
      .agg(
        expr(s"percentile(o_totalprice, ${0.5 - eps})").as("p50_lo"),
        expr(s"percentile(o_totalprice, ${0.5 + eps})").as("p50_hi"),
        expr(s"percentile(o_totalprice, ${0.95 - eps})").as("p95_lo"),
        expr(s"percentile(o_totalprice, ${0.95 + eps})").as("p95_hi"))
    val joined = serving.Lookups.percentilesApprox(spark, sf0001)
      .join(env, Seq("o_orderstatus")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val st = r.getAs[String]("o_orderstatus")
      def d(c: String) = r.getAs[Any](c) match {
        case bd: java.math.BigDecimal => bd.doubleValue()
        case n: Number                => n.doubleValue()
      }
      assert(d("p50_approx") >= d("p50_lo") && d("p50_approx") <= d("p50_hi"),
        s"$st: p50_approx=${d("p50_approx")} outside [${d("p50_lo")}, ${d("p50_hi")}]")
      assert(d("p95_approx") >= d("p95_lo") && d("p95_approx") <= d("p95_hi"),
        s"$st: p95_approx=${d("p95_approx")} outside [${d("p95_lo")}, ${d("p95_hi")}]")
    }
  }
}
