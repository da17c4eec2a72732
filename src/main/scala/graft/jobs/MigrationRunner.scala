package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Migration lifecycle — the engine-side form of src/pipelines/migration.py:
  * 136-214 (validate → copy → count-compare → switchover):
  *
  *   1. pre-validation on the source (dup-PK / orphan checks, migration.py:287-319),
  *   2. batched copy → here a partitioned distributed write (the reference's
  *      LIMIT/OFFSET loop, migration.py:439-448, is keyset/whole-set in Spark),
  *   3. count + sample reconciliation (migration_queries.sql:110-137),
  *   4. switchover via an atomic pointer swap (migration.py's config flip).
  *
  * The "databases" are parquet stores; a CURRENT pointer file names the live
  * one, so readers never observe a half-copied target.
  */
object MigrationRunner {

  final case class MigrationReport(
    sourceRows: Long, targetRows: Long, countsMatch: Boolean,
    sampleMismatches: Long, switched: Boolean)

  def migrate(spark: SparkSession, sourceDf: DataFrame, storeRoot: String,
              targetName: String, key: String): MigrationReport = {
    val targetPath = s"$storeRoot/$targetName"

    // 1. pre-validation: refuse to copy a source with duplicate keys
    val dups = sourceDf.groupBy(col(key)).count().filter(col("count") > 1).count()
    require(dups == 0, s"source has $dups duplicate '$key' values — aborting migration")

    // 2. distributed copy
    sourceDf.write.mode("overwrite").parquet(targetPath)

    // 3. reconciliation: counts + deterministic sample diff
    val target = spark.read.parquet(targetPath)
    val (ns, nt) = (sourceDf.count(), target.count())
    val sample = sourceDf.filter(col(key) % 37 === 0)
    val mismatches = sample.exceptAll(target.filter(col(key) % 37 === 0)).count()

    // 4. switchover only on full reconciliation
    val ok = ns == nt && mismatches == 0
    if (ok)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$storeRoot/CURRENT"), targetName)
    MigrationReport(ns, nt, ns == nt, mismatches, ok)
  }

  /** The live store per the CURRENT pointer (what readers resolve). */
  def current(spark: SparkSession, storeRoot: String): DataFrame = {
    val name = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$storeRoot/CURRENT")).trim
    spark.read.parquet(s"$storeRoot/$name")
  }
}
