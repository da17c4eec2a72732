package graft.jobs

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Migration lifecycle — the engine-side form of src/pipelines/migration.py:
  * 136-214 (validate → copy → count-compare → switchover):
  *
  *   1. pre-validation on the source (dup-PK check, migration.py:287-319),
  *      fused with the row count in ONE aggregation pass,
  *   2. distributed copy (the reference's LIMIT/OFFSET loop,
  *      migration.py:439-448, is a whole-set write in Spark),
  *   3. count + symmetric sample reconciliation (migration_queries.sql:
  *      110-137) — both directions, so extra/duplicated target rows are
  *      caught, not just missing ones,
  *   4. switchover via an atomic pointer rename through the Hadoop
  *      filesystem API, so it works on HDFS/S3A as well as local disk and
  *      readers never observe a torn pointer.
  *
  * Refuses to overwrite the live store (targetName must differ from the
  * CURRENT pointer's value).
  */
object MigrationRunner {

  final case class MigrationReport(
    sourceRows: Long, targetRows: Long, countsMatch: Boolean,
    sampleMismatches: Long, switched: Boolean)

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readPointer(spark: SparkSession, root: String): Option[String] = {
    val p = new Path(s"$root/CURRENT")
    val f = fs(spark, root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Write-tmp-then-rename with Rename.OVERWRITE: atomic on HDFS and raw
    * POSIX filesystems, so a concurrent readPointer sees either the old
    * pointer or the new one. Caveat: the local ChecksumFs used for file://
    * implements overwrite as delete-then-rename, so on local disk a reader
    * can still catch a missing CURRENT for an instant — acceptable for the
    * dev path; the production store is HDFS/object-store. */
  private def writePointerAtomic(spark: SparkSession, root: String, name: String): Unit = {
    val tmp = new Path(s"$root/CURRENT.tmp")
    val dst = new Path(s"$root/CURRENT")
    val f = fs(spark, root)
    val out = f.create(tmp, true)
    try out.write(name.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(root).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Deterministic ~1/37 sample keyed by hash — works for any key type
    * (a `key % 37` predicate silently yields an empty sample for strings).
    * pmod alone: it is already non-negative for negative hashes, and an
    * abs() on Int.MinValue would throw under ANSI overflow checking. */
  private def sampled(df: DataFrame, key: String): DataFrame =
    df.filter(pmod(hash(col(key)), lit(37)) === 0)

  def migrate(spark: SparkSession, sourceDf: DataFrame, storeRoot: String,
              targetName: String, key: String): MigrationReport = {
    readPointer(spark, storeRoot).foreach(live =>
      require(live != targetName,
        s"'$targetName' is the live store — refusing to overwrite it"))

    // 1. one pass: row count + duplicate-key count together
    val pre = sourceDf.groupBy(col(key)).count()
      .agg(sum(col("count")).as("rows"),
        count(when(col("count") > 1, 1)).as("dups"))
      .collect()(0)
    val ns = pre.getAs[Long]("rows")
    require(pre.getAs[Long]("dups") == 0,
      s"source has ${pre.getAs[Long]("dups")} duplicate '$key' values — aborting migration")

    // 2. distributed copy
    val targetPath = s"$storeRoot/$targetName"
    sourceDf.write.mode("overwrite").parquet(targetPath)

    // 3. symmetric reconciliation
    val target = spark.read.parquet(targetPath)
    val nt = target.count()
    val (ss, ts) = (sampled(sourceDf, key), sampled(target, key))
    val mismatches = ss.exceptAll(ts).count() + ts.exceptAll(ss).count()

    // 4. switchover only on full reconciliation; a FAILED copy is deleted
    // (the reference's rollback-on-failed-validation, migration.py) — it
    // must not linger as a version directory, or a later rollback()'s
    // newest-non-live default would happily re-point CURRENT at data that
    // never passed validation
    val ok = ns == nt && mismatches == 0
    if (ok) writePointerAtomic(spark, storeRoot, targetName)
    else fs(spark, storeRoot).delete(new Path(targetPath), true)
    MigrationReport(ns, nt, ns == nt, mismatches, ok)
  }

  /** First version name of the form base / base-1 / base-2… that is neither
    * the live store nor an existing directory — re-running a batch with the
    * same base (e.g. the same runDate) gets a fresh version instead of
    * tripping the live-store guard. */
  def freshVersionName(spark: SparkSession, storeRoot: String, base: String): String = {
    val live = readPointer(spark, storeRoot)
    val f = fs(spark, storeRoot)
    Iterator.from(0)
      .map(k => if (k == 0) base else s"$base-$k")
      .find(n => !live.contains(n) && !f.exists(new Path(s"$storeRoot/$n")))
      .get
  }

  /** Re-point CURRENT at a previous version — the reference's rollback path
    * (src/pipelines/migration.py's failed-validation revert). Switchover
    * never deletes old versions, so rollback is a pure pointer move: readers
    * resolve the old data on their next `current` call. `to` picks the
    * version explicitly; by default the newest non-live version directory
    * (by filesystem modification time) is restored. Returns the version
    * rolled back to. */
  def rollback(spark: SparkSession, storeRoot: String,
               to: Option[String] = None): String = {
    val live = readPointer(spark, storeRoot)
      .getOrElse(sys.error(s"no CURRENT pointer under $storeRoot — nothing to roll back"))
    val f = fs(spark, storeRoot)
    val target = to.getOrElse {
      val candidates = f.listStatus(new Path(storeRoot))
        .filter(_.isDirectory)
        .filter(_.getPath.getName != live)
        .sortBy(-_.getModificationTime)
      require(candidates.nonEmpty, s"no previous version to roll back to under $storeRoot")
      candidates.head.getPath.getName
    }
    require(target != live, s"'$target' is already the live store")
    require(f.exists(new Path(s"$storeRoot/$target")),
      s"rollback target '$target' does not exist under $storeRoot")
    writePointerAtomic(spark, storeRoot, target)
    target
  }

  /** The live store per the CURRENT pointer (what readers resolve). */
  def current(spark: SparkSession, storeRoot: String): DataFrame = {
    val name = readPointer(spark, storeRoot)
      .getOrElse(sys.error(s"no CURRENT pointer under $storeRoot"))
    spark.read.parquet(s"$storeRoot/$name")
  }
}
