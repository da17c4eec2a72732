package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 operators — properties the row/hash
  * oracle compare cannot express (it proves Spark == DuckDB, not that both
  * compute the RIGHT thing). */
class Round9InvariantSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = core.Tables.documents(spark, sf0001)

  test("weighted_sample allocates exactly k slots, proportional to weight") {
    val k = 37 // deliberately not a divisor of anything
    val s = ext.Corpus.weightedSample(docs, k)
    // systematic sampling over the cumulative axis partitions [0, W) into
    // exactly k sampling points, each owned by exactly one document span
    assert(s.agg(sum("n_picks")).as[Long].head() == k.toLong)
    // a document spanning more than W/k tokens MUST win at least one slot
    val total = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    val heavy = docs.select($"doc_id",
        size(split($"text", " ")).cast("long").as("w"))
      .filter($"w" * k > lit(total))
    val picked = s.select("doc_id")
    assert(heavy.join(picked, Seq("doc_id"), "left_anti").count() == 0,
      "every heavier-than-W/k doc owns a sampling point")
  }

  test("event_funnel stage counts are non-increasing and stage 0 covers all first-step users") {
    val f = jobs.StreamAnalogJobs.eventFunnel(spark, sf0001)
      .orderBy("stage_idx").collect()
    assert(f.length == 3)
    val counts = f.map(_.getAs[Long]("n_users"))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel must narrow: ${counts.mkString(",")}")
    val viewers = core.Tables.events(spark, sf0001)
      .filter($"event_type" === "view").select("user_id").distinct().count()
    assert(counts(0) == viewers)
  }

  test("quantile_normalize spans [0,1], is monotone in the value, and ties share a quantile") {
    val q = ext.Corpus.quantileNormalize(docs)
    // [0,1] bounds only: min quantile is exactly 0 IFF the minimum value
    // is unique ((c_min − 1)/(2(n−1)) otherwise — ties share a mid-rank),
    // so exact-0/exact-1 would pin a property of the current testdata,
    // not of the operator
    val mm = q.agg(min("quantile"), max("quantile")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
    // monotone: quantile order equals value order on the distinct frame
    val viol = q.select("n_chars", "quantile").distinct().as[(Double, Double)]
      .collect().sortBy(_._1).sliding(2)
      .count(p => p.length == 2 && p(0)._2 > p(1)._2)
    assert(viol == 0, "quantile must be monotone in the value")
    // a pure function of the value: one quantile per distinct value
    assert(q.select("n_chars", "quantile").distinct().count() ==
      q.select("n_chars").distinct().count())
  }

  test("vocab_growth's curve ends at the corpus vocabulary size") {
    val vg = ext.Corpus.vocabGrowth(docs)
    val endVocab = vg.agg(max("cum_vocab")).as[Long].head()
    val trueVocab = docs
      .select(explode(split($"text", " ")).as("t")).distinct().count()
    assert(endVocab == trueVocab)
    assert(vg.agg(sum("new_tokens")).as[Long].head() == trueVocab)
  }

  test("dq_drift bucket masses cover both periods exactly; chi2 is zero only without drift") {
    val d = jobs.DataQualityJob.distributionDrift(spark, sf0001)
    val (nRef, nCur) = d.agg(sum("n_ref"), sum("n_cur")).as[(Long, Long)].head()
    val orders = core.Tables.orders(spark, sf0001)
    val cut = to_timestamp(lit("1998-07-01 00:00:00"))
    assert(nRef == orders.filter($"o_orderdate" < cut).count())
    assert(nCur == orders.filter($"o_orderdate" >= cut).count())
    // reference deciles: every bucket's p_ref is within a whole-value
    // step of 1/B (equi-depth by construction)
    assert(d.filter($"p_ref" <= 0.0).count() == 0)
  }

  test("dq_robust_outliers agrees with a direct two-pass computation") {
    val r = jobs.DataQualityJob.robustOutliers(spark, sf0001)
      .orderBy("o_orderstatus").collect()
    // independent witness: per-group exact percentile_cont median via SQL
    val orders = core.Tables.orders(spark, sf0001)
    orders.createOrReplaceTempView("__ro_orders")
    val direct = spark.sql(
      """SELECT o_orderstatus,
        |  floor(percentile(o_totalprice, 0.5) * 100 + 0.5) / 100 AS med
        |FROM __ro_orders GROUP BY o_orderstatus""".stripMargin)
      .collect().map(r2 => r2.getString(0) -> r2.getDouble(1)).toMap
    r.foreach { row =>
      assert(row.getAs[Double]("med") == direct(row.getAs[String]("o_orderstatus")),
        "bounded-memory median must equal Spark's buffered Percentile")
    }
  }
}
