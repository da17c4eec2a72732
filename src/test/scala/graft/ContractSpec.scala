package graft

/** Driver-contract consistency guards: the oracle map must stay aligned
  * with the query map (a dangling oracle key would break the driver's
  * compare loop silently), and plans must stay free of accidental
  * cartesian products. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query; every query has an oracle") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
    // the sketch queries carry error-envelope oracles since round 6, and
    // random_sample switched to the deterministic unit-hash sampler in
    // round 7 — every declared query is now fully oracle-checked
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("every query resolves; fact queries plan without a cartesian join") {
    // single-row stats/scalar-subquery frames legitimately cross-join
    // (dq_outliers, count_reconciliation, dq_row_validation, similarity's
    // bounded query set); every other query must be cartesian-free
    // (ann_buckets/dedup_embedding left this list in round 4: banded LSH
    // plans pure equi-joins on (table_id, bucket) now)
    val allowedCross = Set("dq_outliers", "dq_alerts", "count_reconciliation",
      "dq_row_validation", "similarity_topk",
      // tfidf / quality_tiers / shard_manifest / mixture_weights broadcast a
      // 1-row corpus-totals frame into per-row scoring — the same
      // single-row-stats cross-join family as dq_outliers
      "tfidf_terms", "quality_tiers", "shard_manifest", "mixture_weights",
      // heavy_hitters broadcasts the 1-row stream total and the 1-row
      // SpaceSaving summary into the hot-key frame
      "heavy_hitters",
      // weighted_sample / vocab_growth / dq_drift broadcast a 1-row
      // grand-total or boundary-array frame into the per-row bucket math —
      // the dq_outliers single-row-stats family
      "weighted_sample", "vocab_growth", "dq_drift",
      // migration_checks crosses its TWO single-row check aggregates to
      // stack the six named rows (the r12 full-outer rewrite; 1 row × 1
      // row — the same sanctioned scaffold)
      "migration_checks")
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.optimizedPlan.toString
      assert(!plan.contains("UnresolvedRelation"), s"$name has unresolved relations")
      if (!allowedCross(name))
        assert(!plan.contains("Join Cross"), s"$name plans a cartesian join:\n${plan.take(500)}")
    }
  }

  test("no query output carries a raw timestamp column (oracle canonicalization)") {
    // the driver's compare renders Spark parquet vs DuckDB text: a raw
    // timestamp reaches it with microseconds while the oracle emits a
    // formatted string — rows/schema green, hash red (the r8 failure mode:
    // canon matched TimestampType but the NTZ testdata surfaced
    // TimestampNTZType and three queries slipped through). Analysis-only:
    // schema inspection never executes the job.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sf0001).schema.fields.collect {
        case f if f.dataType == TimestampType || f.dataType == TimestampNTZType => f.name
      }
      assert(bad.isEmpty, s"$name outputs raw timestamp column(s): ${bad.mkString(", ")}")
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
