package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.MergeByKey

/** ORC as a warehouse-interchange format (S10/S11's second format): the
  * Spark distribution ships the ORC datasource natively, so the export and
  * ingest paths must behave exactly like the parquet ones — dynamic
  * partition overwrite, partition pruning, predicate pushdown. Pinned here
  * so "ORC works" is a tested property of the engine, not an assumption
  * about the classpath. */
class OrcSourceSpec extends SparkSpec {
  import spark.implicits._

  test("ORC round-trip preserves rows and schema; dynamic overwrite replaces only touched partitions") {
    val base = Files.createTempDirectory("graft-orc").toString
    val docs = core.Tables.documents(spark, sf0001)
      .withColumn("pdate", lit("2024-01-01"))
    MergeByKey.overwritePartitions(docs, base, "pdate", format = "orc")
    val back = spark.read.orc(base)
    assert(back.count() == docs.count())
    assert(back.schema.fieldNames.sorted.toSeq == docs.schema.fieldNames.sorted.toSeq)
    // dynamic overwrite: a second day lands without rewriting day 1
    val day2 = docs.limit(3).withColumn("pdate", lit("2024-01-02"))
    MergeByKey.overwritePartitions(day2, base, "pdate", format = "orc")
    val after = spark.read.orc(base)
    assert(after.filter($"pdate" === "2024-01-01").count() == docs.count())
    assert(after.filter($"pdate" === "2024-01-02").count() == 3)
  }

  test("ORC scans push predicates and prune partitions like parquet") {
    val base = Files.createTempDirectory("graft-orc-push").toString
    core.Tables.documents(spark, sf0001)
      .withColumn("pdate",
        when($"doc_id" % 2 === 0, "2024-01-01").otherwise("2024-01-02"))
      .write.mode("overwrite").partitionBy("pdate").orc(base)
    val q = spark.read.orc(base)
      .filter($"pdate" === "2024-01-01" && $"doc_id" > 10)
      .select("doc_id", "source")
    assert(q.count() > 0)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]"),
      s"doc_id predicate must reach the ORC reader:\n${scan.take(1000)}")
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-01"),
      s"partition filter must prune at the scan:\n${scan.take(1000)}")
    // column pruning: the text column never leaves the reader
    assert(!scan.contains("text"), "projection must prune unread columns")
  }
}
