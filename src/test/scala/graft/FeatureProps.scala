package graft

import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY §5.3): the reference's own validator
  * rules hold for ARBITRARY inputs, not just the corpus — declined ≤ total,
  * ratios ∈ [0,1], COALESCE totality, decimal-sum partition invariance,
  * merge keyset algebra. Case counts are capped: each case is a Spark job.
  */
object FeatureProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val asOf = Instant.parse("2024-02-01T00:00:00Z")

  private val orderGen = for {
    user   <- Gen.choose(0L, 5L)
    amount <- Gen.choose(1, 100000).map(_ / 100.0)
    status <- Gen.oneOf(0, 1, 2)
    dayOff <- Gen.choose(0, 44) // straddles the 30/31d boundary
  } yield (user, amount, status, dayOff)

  property("transaction features: validator invariants for arbitrary orders") =
    forAll(Gen.nonEmptyListOf(orderGen)) { rows =>
      // derive valid values inside the property so shrunk cases stay valid
      val statuses = Array("O", "P", "F")
      val tx = rows.zipWithIndex
        .map { case ((u, a, s, dayOff), i) =>
          val d = java.time.LocalDate.of(2023, 12, 18)
            .plusDays(math.abs(dayOff) % 45).toString + " 00:00:00"
          (i.toLong, u, i.toLong % 5, math.abs(a),
            statuses(math.abs(s) % 3), "pm", d)
        }
        .toDF("order_id", "user_id", "merchant_id", "amount", "status", "payment_method", "created_at")
        .withColumn("created_at", to_timestamp($"created_at"))
      val users = Seq.empty[(Long, Boolean)].toDF("user_id", "recently_updated")
        .select($"user_id", lit(30).as("age"), lit("X").as("location_country"),
          lit("Y").as("location_city"), lit(true).as("account_verified"),
          $"recently_updated")
      val out = jobs.TransactionFeaturesJob.compute(tx, users, asOf).collect()
      out.forall { r =>
        val total = r.getAs[Long]("total_transactions_30d")
        val declined = r.getAs[Long]("transactions_declined_30d")
        val wr = r.getAs[Double]("weekend_transaction_ratio")
        val nr = r.getAs[Double]("night_transaction_ratio")
        declined <= total && wr >= 0.0 && wr <= 1.0 && nr >= 0.0 && nr <= 1.0 &&
          !r.anyNull // COALESCE totality: feature rows are fully defined
      }
    }

  property("exact decimal sums are partition-invariant") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1, 10000000).map(_ / 100.0))) { xs =>
      val df = xs.toDF("amount")
      def sumWith(parts: Int) = df.repartition(parts)
        .agg(graft.ops.Ops.sumMoney(lit(true), $"amount")).collect()(0).getDouble(0)
      sumWith(1) == sumWith(7)
    }

  property("cluster collapse equals driver-side union-find on arbitrary graphs") =
    forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)).suchThat(p => p._1 != p._2))) { es =>
      val pairs = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("doc_a", "doc_b")
      val got = ext.Dedup.clusters(pairs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("keeper_doc_id"), r.getAs[Long]("cluster_size"))).toMap
      // reference: plain union-find over the same edges
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct
      val keeper = nodes.map(n => n -> nodes.filter(m => find(m) == find(n)).min).toMap
      val size = keeper.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      nodes.forall(n => got(n) == (keeper(n), size(keeper(n))))
    }

  property("bounded percentile decomposition equals the Percentile aggregate") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0, 3), Gen.choose(0, 50).map(_ / 10.0))),
      Gen.oneOf(0.0, 0.25, 0.5, 0.9, 1.0)) { (rows, p) =>
      // duplicate-heavy values (only 51 distinct, so lists collide often)
      // exercise the [lo, hi) run logic; groups of wildly different sizes
      // exercise the position math
      val df = rows.map { case (g, v) => (s"g$g", v) }.toDF("g", "v")
      val dec = ops.BoundedPercentile.exact(df, "g", "v", Seq(p -> "q"), 9)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      val ref = df.groupBy("g").agg(
          graft.ops.Ops.rnd(expr(s"percentile(v, $p)"), 9).as("q"),
          count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      dec == ref
    }

  property("PIT forward-fill equals brute-force banded as-of top-1 on arbitrary frames") =
    forAll(
      // facts: (user 0-2, ts 0-50, id, nullable value) — small ts domain so
      // equal-timestamp ties and band edges collide often
      Gen.listOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(0, 50),
        Gen.choose(0, 30).map(_ % 2 == 0))),
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(0, 50))),
      Gen.choose(5, 60)) { (factRows, probeRows, bandDays) =>
      import java.sql.Timestamp
      def ts(day: Int) = Timestamp.valueOf(f"2024-01-01 00:00:00")
        .toLocalDateTime.plusDays(day)
      def t(day: Int) = Timestamp.valueOf(ts(day))
      val facts = factRows.zipWithIndex.map { case ((u, d, nonNull), i) =>
        (u, t(d), i.toLong,
          if (nonNull) java.lang.Double.valueOf(d * 1.5 + i) else null: java.lang.Double)
      }
      val probes = probeRows.zipWithIndex.map { case ((u, d), i) =>
        (u, t(d), 1000L + i)
      }
      val got = ops.PitJoin.trainingMatrix(
          probes.toDF("user_id", "probe_ts", "probe_id"),
          "user_id", "probe_ts", "probe_id",
          Seq(ops.PitJoin.Fact(
            facts.toDF("user_id", "fact_ts", "fact_id", "score"),
            "user_id", "fact_ts", "fact_id", "score")),
          expr(s"INTERVAL $bandDays DAYS"))
        .select("probe_id", "score")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      // brute force: per probe, the max-(ts, id) NON-NULL fact in
      // [probe_ts - band, probe_ts]
      val want = probes.map { case (u, pts, pid) =>
        val lo = pts.toLocalDateTime.minusDays(bandDays)
        pid -> facts.filter { case (fu, fts, _, v) =>
            fu == u && v != null && !fts.after(pts) &&
              !fts.toLocalDateTime.isBefore(lo)
          }.sortBy { case (_, fts, fid, _) => (fts.getTime, fid) }
          .lastOption.map(_._4.doubleValue)
      }.toMap
      got == want
    }

  property("merge-by-key: keyset is the union, updates win") =
    forAll(Gen.listOf(Gen.choose(0L, 9L)), Gen.listOf(Gen.choose(0L, 9L))) { (o, n) =>
      val old = o.distinct.map(k => (k, s"old$k")).toDF("k", "v")
      val upd = n.distinct.map(k => (k, s"new$k")).toDF("k", "v")
      val merged = graft.sinks.MergeByKey.merge(old, upd, Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      merged.keySet == (o.toSet ++ n.toSet) &&
        n.distinct.forall(k => merged(k) == s"new$k") &&
        (o.toSet -- n.toSet).forall(k => merged(k) == s"old$k")
    }
}
