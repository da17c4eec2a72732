package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-by-key upsert (S9) — the Spark replacement for the reference's
  * `INSERT ... ON CONFLICT (user_id) DO UPDATE` loop
  * (src/pipelines/batch_pipeline.py:221-310, batches of 1000).
  *
  * Without a transactional table format on the classpath, upsert =
  * recompute-the-table: updates win, untouched old rows survive via a left
  * anti join on the key. One co-hashed shuffle on the key; with both sides
  * bucketed by user_id (the 100 TB posture) the exchange is elided entirely.
  * The 1000-row batching of the reference is an asyncpg artifact — a
  * whole-partition columnar write replaces it.
  */
object MergeByKey {

  /** New/updated rows replace same-key rows; all other old rows pass through. */
  def merge(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(
      current.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti"))

  /** Dynamic-partition-overwrite write — the idempotent daily-batch sink
    * (S11 shape: only partitions present in `df` are replaced, so re-running
    * a day's job is safe). `format` widens the warehouse-interchange matrix
    * beyond parquet: "orc" ships natively in the Spark distribution with
    * the same dynamic-overwrite, partition-pruning and predicate-pushdown
    * behavior (OrcSourceSpec pins the round-trip and the pushed filters). */
  def overwritePartitions(df: DataFrame, path: String, partitionCol: String,
                          format: String = "parquet"): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .format(format)
      .save(path)

  /** Partition-expiry retention (S11 — the reference's 730-day partition
    * expiration, sql/bigquery_schema.sql:24-26): drop date partitions whose
    * value is older than `retentionDays` before the `asOf` anchor. The
    * anchor is caller-supplied (driver-computed from AsOf, never now()), so
    * retention runs are reproducible. Dropping a partition is a directory
    * delete — metadata-only, no data rewrite, exactly how a warehouse
    * expires partitions at scale. Returns the expired partition values. */
  def expirePartitions(spark: SparkSession, path: String, partitionCol: String,
                       asOf: java.time.LocalDate, retentionDays: Int): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val cutoff = asOf.minusDays(retentionDays.toLong)
    val prefix = s"$partitionCol="
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { s =>
        val value = s.getPath.getName.stripPrefix(prefix)
        scala.util.Try(java.time.LocalDate.parse(value)).toOption
          .filter(_.isBefore(cutoff))
          // report only partitions the filesystem actually dropped — a
          // false delete (permissions, races) must not show up in the audit
          .filter(_ => fs.delete(s.getPath, true))
          .map(_ => value)
      }
      .sorted
  }
}
