package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical access to the test corpus tables (TESTDATA.md) and the
  * role-mapping from the reference's OLTP schema onto the star schema
  * (FIXTURES.md §C):
  *   customer → users, orders → orders, lineitem → payments/txn legs,
  *   supplier/part → merchant dims, events → streaming events,
  *   documents/embeddings → training-data corpus.
  *
  * All readers take the sf directory explicitly; schemas are fixed by the
  * parquet footers (driver-generated, deterministic), so no inference
  * surprises. At 100 TB these reads become partitioned-table scans; the
  * single-file layout here is the local stand-in.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

/** Deterministic "as of" instants (SURVEY §7.4.4: jobs never call now()).
  * Orders/lineitem span 1995-01-01..2001-11-04; events span 2024-01-01..
  * 2024-01-30. The anchors sit just past the data max so relative windows
  * ("last 365d") select stable, non-empty slices.
  */
object AsOf {
  val orders = "2001-08-02 00:00:00" // day after max(o_orderdate)
  val events = "2024-01-31 00:00:00" // day after max(events.ts)
}
