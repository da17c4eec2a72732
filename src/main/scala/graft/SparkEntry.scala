package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.jobs._
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (then the driver records a
  * rows-only check). Column names are aligned between both sides; timestamp
  * outputs are canonicalized to 'yyyy-MM-dd HH:mm:ss' strings so the compare
  * never trips on parquet-vs-DuckDB timezone encodings.
  */
object SparkEntry {

  /** Render every timestamp column as a UTC string (oracle canonicalization;
    * the underlying jobs keep real TimestampType columns). */
  private def canon(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType => date_format(col(f.name), "yyyy-MM-dd HH:mm:ss").as(f.name)
        case _             => col(f.name)
      }
    }.toSeq: _*)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TransactionFeaturesJob(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "transaction_features" -> ((s, dir) => canon(TransactionFeaturesJob(s, dir))),
    "user_features"        -> ((s, dir) => canon(UserFeaturesJob(s, dir))),
    "risk_features"        -> ((s, dir) => canon(RiskFeaturesJob(s, dir))),
    "feature_view"         -> ((s, dir) => canon(FeatureViewJob(s, dir))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "transaction_features" -> OracleSql.transactionFeatures(),
    "user_features"        -> OracleSql.userFeatures(),
    "risk_features"        -> OracleSql.riskFeatures(),
    "feature_view"         -> OracleSql.featureView(),
  )
}
