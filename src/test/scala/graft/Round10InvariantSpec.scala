package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-10 work — properties the row/hash
  * oracle compare cannot express (it proves Spark == DuckDB, not that both
  * compute the RIGHT thing). */
class Round10InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("pit_training_set: one-scan specialization equals the generic PitJoin.trainingMatrix") {
    // the driver query builds its timeline from ONE events scan; the
    // generic operator unions the four role frames (4 scans). Same
    // semantics by construction — this pins that the conditional
    // projections mirror the Roles derivations term for term
    val fast = jobs.TrainingSetJob.pitTrainingSet(spark, sf0001)
    val generic = jobs.TrainingSetJob.pitTrainingSetGeneric(spark, sf0001)
    assert(fast.columns.toSeq == generic.columns.toSeq)
    assert(fast.count() > 0)
    assert(fast.exceptAll(generic).isEmpty && generic.exceptAll(fast).isEmpty,
      "one-scan and generic PIT matrices must be row-identical")
  }

  test("pit_training_set: risk column agrees with the single-fact AsOfJoin query") {
    // cross-operator witness: asof_risk IS the one-fact slice of the
    // matrix (same probes, same band, same tiebreak), through a completely
    // different plan (banded range join + top-1 window vs forward fill)
    val pit = jobs.TrainingSetJob.pitTrainingSet(spark, sf0001)
      .select("probe_id", "risk_score_asof")
    val single = jobs.StreamAnalogJobs.asOfRisk(spark, sf0001)
      .select("probe_id", "risk_score_asof")
    assert(pit.exceptAll(single).isEmpty && single.exceptAll(pit).isEmpty,
      "forward-fill and as-of-join must agree on the shared fact table")
  }

  test("pit_training_set: no leakage — every filled value predates its probe") {
    // direct property on the matrix: recompute each probe's risk feature
    // from facts STRICTLY at or before probe_ts; any disagreement with a
    // <=-violating fill would surface as a higher future score leaking in
    val ev = core.Tables.events(spark, sf0001)
    val futureOnly = ev.filter($"event_type" === "purchase")
      .join(ev.filter($"event_type" === "click")
          .select($"event_id".as("probe_id"), $"user_id", $"ts".as("probe_ts")),
        Seq("user_id"))
      .filter($"ts" > $"probe_ts") // facts from the future
      .select("probe_id").distinct()
    // probes whose ONLY facts are in the future must serve the 0.0 default
    val onlyFuture = futureOnly.join(
      ev.filter($"event_type" === "purchase")
        .join(ev.filter($"event_type" === "click")
            .select($"event_id".as("probe_id"), $"user_id", $"ts".as("probe_ts")),
          Seq("user_id"))
        .filter($"ts" <= $"probe_ts").select("probe_id").distinct(),
      Seq("probe_id"), "left_anti")
    val leaked = jobs.TrainingSetJob.pitTrainingSet(spark, sf0001)
      .join(onlyFuture, Seq("probe_id"))
      .filter($"risk_score_asof" =!= 0.0)
    assert(leaked.count() == 0,
      "a probe with only future facts must see the no-score default")
  }

  test("fused dq_robust_outliers matches the buffered-Percentile witness on every column") {
    // independent witness: the straightforward buffered-aggregate form of
    // the same definition (Spark's exact `Percentile` buffers a per-group
    // value map — fine at sf0.001, the very thing the fused decomposition
    // avoids at scale). Every output column must agree, not just `med`
    // (Round9InvariantSpec pins that one) — this locks the round-10
    // single-window fusion to the round-9 semantics bit for bit.
    core.Tables.orders(spark, sf0001)
      .createOrReplaceTempView("__r10_orders")
    val witness = spark.sql(
      """WITH med AS (SELECT o_orderstatus,
        |    floor(percentile(o_totalprice, 0.5) * 100 + 0.5) / 100 AS med
        |  FROM __r10_orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        |d AS (SELECT t.o_orderstatus, t.o_totalprice, m.med,
        |    abs(t.o_totalprice - m.med) AS dev
        |  FROM __r10_orders t JOIN med m
        |    ON t.o_orderstatus <=> m.o_orderstatus
        |  WHERE t.o_totalprice IS NOT NULL),
        |ma AS (SELECT o_orderstatus,
        |    floor(percentile(dev, 0.5) * 10000 + 0.5) / 10000 AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.o_orderstatus, MIN(d.med) AS med, MIN(ma.mad) AS mad,
        |  COUNT(CASE WHEN ma.mad > 0
        |    AND abs(0.6745 * (d.o_totalprice - d.med) / ma.mad) > 3.5
        |    THEN 1 END) AS n_outliers,
        |  COUNT(*) AS n
        |FROM d JOIN ma ON d.o_orderstatus <=> ma.o_orderstatus
        |GROUP BY 1""".stripMargin)
      .orderBy("o_orderstatus").collect()
    val fused = jobs.DataQualityJob.robustOutliers(spark, sf0001)
      .orderBy("o_orderstatus").collect()
    assert(fused.length == witness.length)
    fused.zip(witness).foreach { case (f, w) =>
      assert(f.getAs[String]("o_orderstatus") == w.getAs[String]("o_orderstatus"))
      assert(f.getAs[Double]("med") == w.getAs[Double]("med"), s"med: $f vs $w")
      assert(f.getAs[Double]("mad") == w.getAs[Double]("mad"), s"mad: $f vs $w")
      assert(f.getAs[Long]("n_outliers") == w.getAs[Long]("n_outliers"), s"n_outliers: $f vs $w")
      assert(f.getAs[Long]("n") == w.getAs[Long]("n"), s"n: $f vs $w")
    }
  }
}
