package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Ops._

/** Migration-validation checks — spec sql/migration_queries.sql:8-137 and
  * src/pipelines/migration.py:287-319,480-525: duplicate-PK detection (A11),
  * orphaned-row anti-joins (J5), null-key scans (P4), scalar count
  * reconciliation (A17), and a deterministic sample comparison (J6).
  *
  * Scale: each check is an independent aggregate/anti-join; the anti-joins
  * hash on the FK and broadcast nothing (both sides are fact-sized), which
  * is the shape that survives 100 TB — a driver-side id diff would not.
  */
object MigrationValidationJob {

  /** Stacked named checks, one row per check (U2 union-all of counts —
    * sql/migration_queries.sql:8-45 stacks per-table results the same way).
    *
    * Scan discipline: every row-level check is rewritten over shared
    * KEY-GROUPED frames — `lineitem.groupBy(l_orderkey)` feeds both the
    * multi-line check (keys with count > 1) and the orphan check, the
    * PK-count frames feed both the dup checks and the orphan probes, and
    * `orders.groupBy(o_custkey)` feeds the orphan-order and null-key
    * checks. Orphans are LEFT JOIN + IS NULL over the grouped frames with
    * SUM of per-key counts (identical to counting orphan rows) — written
    * as an outer join deliberately: an anti-join would be pushed BELOW the
    * aggregate by PushDownLeftSemiAntiJoin, splitting the shared subtree
    * back into one scan per check, while the outer join keeps the grouped
    * subtrees byte-identical so ReuseExchange runs each fact scan ONCE
    * (lineitem: 1 scan; orders: 2 — the two distinct grouping keys;
    * pinned in ScaleShapeSpec). The join shuffles (key, count) rows,
    * never raw fact rows. */
  def checks(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders   = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)

    def cnt(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("violation_count"))
        .select(lit(name).as("check_name"), col("violation_count"))
    // row-weighted check over a grouped frame: SUM of per-key counts ==
    // count of underlying rows (empty → 0, matching count(*) over empty)
    def summed(name: String, df: DataFrame): DataFrame =
      df.agg(coalesce(sum(col("c")), lit(0L)).as("violation_count"))
        .select(lit(name).as("check_name"), col("violation_count"))

    // PK-grouped frames filter null keys explicitly: PKs are NOT NULL by
    // the reference's DDL (postgresql_schema.sql), so this is semantics-
    // faithful — and it keeps each frame byte-identical to its orphan
    // probe's subtree (the left join INFERS IsNotNull on the probe key;
    // without the matching filter the shared scan splits per check)
    val custKeys = customer.filter(col("c_custkey").isNotNull)
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("c"))
    val orderKeys = orders.filter(col("o_orderkey").isNotNull)
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
    val lineGroups = lineitem.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
    val orderCust  = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("c"))

    Seq(
      cnt("dup_user_pk", custKeys.filter(col("c") > 1)),
      cnt("dup_order_pk", orderKeys.filter(col("c") > 1)),
      cnt("multi_line_orders", lineGroups.filter(col("c") > 1)),
      // the probe sides filter on `c > 0` (vacuously true for a count) so
      // column pruning can't strip the count from the probe's aggregate —
      // a pruned probe subtree would no longer match the dup-check's frame
      // and the shared scan would split back into one per check
      summed("orphan_orders",
        orderCust.join(custKeys.filter(col("c") > 0).select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left")
          .filter(col("c_custkey").isNull)),
      summed("orphan_lineitems",
        lineGroups.join(orderKeys.filter(col("c") > 0).select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left")
          .filter(col("o_orderkey").isNull)),
      summed("null_user_orders", orderCust.filter(col("o_custkey").isNull)),
    ).reduce(_ unionByName _)
  }

  /** Scalar count reconciliation — one row, one count per table
    * (sql/migration_queries.sql:110-113,206-210's scalar subqueries). */
  def countReconciliation(spark: SparkSession, dir: String): DataFrame = {
    def c(name: String, table: String) =
      Tables.load(spark, dir, table).agg(count(lit(1)).as(name))
    c("users_count", "customer")
      .crossJoin(c("orders_count", "orders"))
      .crossJoin(c("payments_count", "lineitem"))
      .crossJoin(c("events_count", "events"))
      .crossJoin(c("documents_count", "documents"))
      .crossJoin(c("embeddings_count", "embeddings"))
  }

  /** Sample-based validation (sql/migration_queries.sql:117-137): a
    * deterministic pseudo-random user sample (custkey % 37 — the reference's
    * ORDER BY RANDOM() LIMIT is not cross-engine reproducible) inner-joined
    * to the user dimension, left-joined to order stats and the computed
    * user-features table, flagging feature presence. */
  def sampleCompare(spark: SparkSession, dir: String): DataFrame = {
    val sample = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 37 === 0)
      .select(col("c_custkey").as("user_id"))
    val users = graft.core.Roles.users(spark, dir)
    val stats = graft.core.Roles.transactions(spark, dir)
      .groupBy("user_id").agg(
        count(lit(1)).as("order_count"),
        sumMoney(lit(true), col("amount")).as("total_spend"))
    val uf = UserFeaturesJob(spark, dir)
      .select(col("user_id"), lit(true).as("has_user_features"))
    sample
      .join(users, Seq("user_id"))
      .join(stats, Seq("user_id"), "left")
      .join(uf, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("location_country"),
        orZero(col("order_count")).as("order_count"),
        orZeroD(col("total_spend")).as("total_spend"),
        coalesce(col("has_user_features"), lit(false)).as("has_user_features"))
  }

  /** Snapshot diff — what changed in a per-user feature table between two
    * as-of cutoffs (the audit a feature-store backfill or migration ships:
    * which users appeared, which drifted, by how much). Computed as two
    * time-pruned aggregations full-outer-joined on the key; with a
    * date-partitioned layout both scans prune to their date range, and the
    * join shuffles ONLY the two aggregated (users-sized, not orders-sized)
    * frames. 'removed' is impossible with append-only orders but the
    * branch is kept — a real migration diffs mutable tables. */
  def snapshotDiff(spark: SparkSession, dir: String,
                   cutOld: String, cutNew: String): DataFrame = {
    def snapshot(cut: String, pfx: String): DataFrame =
      Tables.orders(spark, dir)
        .filter(col("o_orderdate") < to_timestamp(lit(cut)))
        .groupBy(col("o_custkey").as("user_id"))
        .agg(count(lit(1)).as(s"${pfx}_orders"),
          sumMoney(lit(true), col("o_totalprice")).as(s"${pfx}_spend"))
    snapshot(cutOld, "old").join(snapshot(cutNew, "new"), Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        when(col("old_orders").isNull, "added")
          .when(col("new_orders").isNull, "removed")
          .when(col("old_orders") =!= col("new_orders")
            || col("old_spend") =!= col("new_spend"), "changed")
          .otherwise("unchanged").as("status"),
        orZero(col("old_orders")).as("old_orders"),
        orZero(col("new_orders")).as("new_orders"),
        orZeroD(col("old_spend")).as("old_spend"),
        orZeroD(col("new_spend")).as("new_spend"))
      .filter(col("status") =!= "unchanged")
  }
}
