package graft.serving

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.FeatureViewJob
import graft.core.Tables

/** Lookup/export query shapes of the serving + migration layers.
  *
  * Point and batch lookups (S2/S3 — src/feature_store/database.py:53-134)
  * are predicate probes against the wide feature view: an `isin` filter
  * compiles to a parquet pushdown, and for large probe sets Spark flips to a
  * broadcast semi-join — either way no driver-side chunking loop (the
  * reference's 100-per-chunk pagination, database.py:120-134, is an asyncpg
  * artifact Spark doesn't need).
  */
object Lookups {

  /** PK point lookup over the feature view (S2/P2). */
  def pointLookup(spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame =
    FeatureViewJob(spark, dir).filter(col("user_id").isin(ids: _*))

  /** Batch lookup, ≤100 ids per the reference's API cap (S3/models.py:84-89).
    * The id list arrives as a literal set — `WHERE user_id = ANY($1)`. */
  def batchLookup(spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame = {
    require(ids.size <= 100, "batch lookups are capped at 100 ids (models.py:84-89)")
    FeatureViewJob(spark, dir).filter(col("user_id").isin(ids: _*))
  }

  /** Deterministic ordered export (O1 — sql/migration_queries.sql:59-104's
    * ORDER BY user_id projections), with an explicit projection list so
    * column pruning reaches the scan. */
  def orderedExport(spark: SparkSession, dir: String, limit: Int = 1000): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
      .limit(limit)

  /** Keyset pagination (the scale-correct replacement for the reference's
    * LIMIT/OFFSET batch copy, src/pipelines/migration.py:439-448 — OFFSET
    * re-scans skipped rows; a keyset predicate pushes down and seeks). */
  def keysetPage(spark: SparkSession, dir: String,
                 afterKey: Long, pageSize: Int): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .filter(col("o_orderkey") > afterKey)
      .orderBy("o_orderkey")
      .limit(pageSize)

  /** Uniform validation sample (O2/F15 — the reference's ORDER BY RANDOM()
    * LIMIT 1000, sql/migration_queries.sql:117-122). The reference's intent
    * is "a uniform sample for migration spot-checks"; a keyed hash order
    * (Corpus.unitHash — the Knuth multiplicative hash every sampler in this
    * engine shares) satisfies it BETTER than rand(seed): the sample is
    * identical across engines, retries, and partition relayouts, so an
    * audit can be re-run bit-for-bit. Ties impossible (c_custkey is the
    * PK tie-break). Fully oracle-checkable — see OracleSql.randomSample.
    *
    * `seed` XORs into the hashed key so REPEATED audits can widen coverage
    * beyond one fixed subset (the reference redraws per run) while each
    * seed's sample stays deterministic and oracle-checkable; seed 0 is the
    * default draw and emits the identical expression as before. */
  def randomSample(spark: SparkSession, dir: String, n: Int,
                   seed: Long = 0L): DataFrame = {
    val key = if (seed == 0L) col("c_custkey")
              else col("c_custkey").bitwiseXOR(lit(seed))
    Tables.customer(spark, dir)
      .orderBy(graft.ext.Corpus.unitHash(key), col("c_custkey"))
      .limit(n)
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** JSON feature bundle (F11 — the jsonb_build_object optimization path,
    * docs/PERFORMANCE.md:66-103): one JSON blob per user from the serving
    * view, exactly the cache value the reference stores per user. Bundle
    * fields are integer/string so both engines render identical JSON. */
  def featureBundles(spark: SparkSession, dir: String): DataFrame =
    FeatureViewJob(spark, dir).select(
      col("user_id"),
      to_json(struct(
        col("user_id"),
        col("total_orders"),
        col("total_transactions_30d"),
        // null-coalesced: Spark's to_json OMITS null fields while other
        // engines render them — bundles must be null-free to be portable
        coalesce(col("preferred_payment_method"), lit("none"))
          .as("preferred_payment_method"),
        col("risk_category"))).as("bundle"))

  /** Percentile profile per status group (O4 — the reference computes p95
    * client-side over sorted latencies, scripts/benchmark.py:101; here it is
    * a distributed exact percentile). Computed via the count-by-value
    * decomposition (ops/BoundedPercentile) rather than Spark's exact
    * `Percentile` aggregate: o_totalprice is an unbounded-cardinality 2-dp
    * value, so the per-group value→count buffer Percentile keeps would grow
    * with distinct prices at 100× scale; the decomposition computes the
    * identical interpolated result through bounded, spillable operators. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    graft.ops.BoundedPercentile.exact(
      Tables.orders(spark, dir).select("o_orderstatus", "o_totalprice"),
      "o_orderstatus", "o_totalprice",
      Seq(0.5 -> "p50_amount", 0.95 -> "p95_amount"), 2)

  /** A16's sketch form: KLL-style approximate quantiles checked against
    * their exact witness — the cost-optimization path
    * (docs/PERFORMANCE.md:552-559). The sketch VALUE is engine-specific
    * (and its merge order could in principle vary), so the oracle-visible
    * columns are the exact percentiles plus a RANK-ENVELOPE boolean per
    * quantile: the approx value's rank interval [count(<)/n, count(<=)/n]
    * must intersect [p - m, p + m]. accuracy=1000 guarantees rank error
    * <= 1/1000 for ANY merge order, so with m = 0.02 (20x slack, still a
    * real accuracy contract) the boolean is deterministically TRUE and the
    * DuckDB oracle emits TRUE — upgrading the driver's check from
    * rows-only to a semantic gate.
    *
    * ONE pass over orders: every consumer rides the count-by-value table —
    * the sketch aggregates the weight-expanded values (the identical
    * multiset, so the rank-error guarantee is unchanged; ordering never
    * matters to a mergeable sketch), and the envelope's rank counts
    * `count(< approx)` / `count(<= approx)` are the cumulative `__hi`
    * bounds the exact witness already computes, fused into the same pick
    * aggregate via exactFromCounts' extraAggs hook. The three branches
    * share one canonical count-by-value subtree, so Spark's ReuseExchange
    * runs the orders scan + combine once (pinned in ScaleShapeSpec). */
  def percentilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val m = 0.02
    val cnt = graft.ops.BoundedPercentile.countByValue(
      Tables.orders(spark, dir).select("o_orderstatus", "o_totalprice"),
      "o_orderstatus", "o_totalprice")
    val sk = graft.ops.BoundedPercentile
      .weightExpand(cnt, Seq("o_orderstatus"), "__v", "__c", out = "__v")
      .groupBy("o_orderstatus").agg(
        percentile_approx(col("__v"), lit(0.5), lit(1000)).as("__p50a"),
        percentile_approx(col("__v"), lit(0.95), lit(1000)).as("__p95a"))
    // rank counts from the cumulative index ranges: __hi of the largest
    // value < approx IS count(< approx) (and <= likewise); a group where no
    // value qualifies has rank count 0
    def rank(cmp: Column): Column = coalesce(max(when(cmp, col("__hi"))), lit(0L))
    def envelope(p: Double, lt: String, le: String): Column =
      col(lt) <= (lit(p) + lit(m)) * col("__n") &&
        col(le) >= (lit(p) - lit(m)) * col("__n")
    graft.ops.BoundedPercentile.exactFromCounts(
      cnt, "o_orderstatus",
      Seq(0.5 -> "p50_exact", 0.95 -> "p95_exact"), 2,
      joined = Seq(sk),
      extraAggs = Seq(
        rank(col("__v") < col("__p50a")).as("__lt50"),
        rank(col("__v") <= col("__p50a")).as("__le50"),
        rank(col("__v") < col("__p95a")).as("__lt95"),
        rank(col("__v") <= col("__p95a")).as("__le95")),
      extraOut = Seq(
        envelope(0.5, "__lt50", "__le50").as("p50_in_envelope"),
        envelope(0.95, "__lt95", "__le95").as("p95_in_envelope")))
      .select("o_orderstatus", "p50_exact", "p95_exact", "n",
        "p50_in_envelope", "p95_in_envelope")
  }
}
