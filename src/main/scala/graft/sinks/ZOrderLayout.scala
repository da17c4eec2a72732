package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for two-dimensional scan locality — the
  * storage answer for a table probed on EITHER of two keys. BucketedLayout
  * serves the single-key case (CLUSTER BY user_id); the events log is
  * probed both ways: per-user timelines (PIT fills, velocity audits) AND
  * time-range scans (the 31d feature windows, sql/transaction_features
  * .sql:4-37's buffered scan). A layout sorted on one dimension makes the
  * other a full scan; interleaving the bits of both keys into one sort
  * value gives every row group a BOUNDED range in BOTH dimensions, so
  * parquet min/max stats prune either predicate — the lakehouse Z-ORDER
  * BY, built from plain Column arithmetic (shift/and/or fold — fully
  * codegen'd, no UDF).
  *
  * The curve property that makes this work: a contiguous Z-value range
  * maps to at most a few rectangles in (a, b) space, so a row group
  * holding a Z-run has tight per-column min/max — unlike a random layout
  * (every group spans everything) or a single-key sort (tight on one
  * column, full-range on the other). ZOrderLayoutSpec pins the records
  * contrast at runtime: on the z-layout BOTH single-dimension probes
  * decode ≪ n rows; on a user-sorted control the time probe decodes
  * everything.
  *
  * At 100 TB this is a write-once layout job (repartitionByRange on the
  * z-value + within-partition sort — one range exchange, the same cost
  * class as any sorted write) that turns the dominant event-log access
  * patterns into row-group-pruned reads. */
object ZOrderLayout {

  /** Interleave the low `bits` bits of two NON-NEGATIVE long columns
    * (a→even positions, b→odd): the Morton code. 21 bits each stays well
    * inside a long (42 bits used). Values must fit in `bits` bits —
    * `writeZOrdered` checks; quantize first if they don't (e.g. days
    * since epoch, id ranks). */
  def zvalue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in 1..31: $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` z-ordered on (`ca`, `cb`) into `files` range-partitioned,
    * z-sorted parquet files. Both columns must be non-negative longs that
    * fit in `bits` bits (checked — silent truncation would interleave
    * garbage and quietly destroy the locality the layout promises). */
  def writeZOrdered(df: DataFrame, path: String, ca: String, cb: String,
                    files: Int = 16, bits: Int = 21): Unit = {
    require(files > 0, s"files must be > 0: $files")
    val lim = 1L << bits
    val r = df.agg(min(col(ca)), max(col(ca)), min(col(cb)), max(col(cb))).head
    if (!r.isNullAt(0)) // empty frame: nothing to range-check
      Seq((ca, r.getLong(0), r.getLong(1)), (cb, r.getLong(2), r.getLong(3)))
        .foreach { case (c, lo, hi) =>
          require(lo >= 0 && hi < lim,
            s"$c range [$lo, $hi] must fit in $bits bits (quantize first)")
        }
    df.withColumn("__z", zvalue(col(ca), col(cb), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Re-interleave a z-ordered path in place (r13 — the z-layout's
    * compaction): incremental appends land as stragglers OUTSIDE the
    * curve order, and any file-count compaction that merely concatenates
    * would blend full-range straggler rows into every output file,
    * destroying the bounded-both-dimensions property the layout exists
    * for. The only correct rewrite is the layout's own: re-run the
    * z-ordered write over the whole path (one range exchange — the same
    * cost class as the original layout job) into a sibling temp dir,
    * then swap with two renames (the Compaction swap discipline: readers
    * see old files or new, never a mix; the old dir survives until the
    * new one is in place). This variant exists for tables that must stay
    * readable at a bare path; between its two renames the path is briefly
    * absent — a table whose readers resolve through the library should use
    * `compactZOrderedVersioned`, whose atomic pointer swing has no such
    * window at all. ZOrderLayoutSpec pins that both single-dimension
    * probes prune at least as well after compaction as on the fresh
    * layout. SINGLE-MAINTAINER contract: the two-rename dance cannot be
    * lock-file-guarded the way the versioned variant is (the lock would
    * have to live inside the directory being renamed); schedule at most
    * one compaction per table path — or use the versioned variant, whose
    * maintenance lock enforces it. */
  def compactZOrdered(spark: org.apache.spark.sql.SparkSession, path: String,
                      ca: String, cb: String, files: Int = 16,
                      bits: Int = 21): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, "." + dir.getName + ".z-compact-tmp")
    val old = new Path(dir.getParent, "." + dir.getName + ".z-compact-old")
    val marker = new Path(dir.getParent, "." + dir.getName + ".z-compact-params")
    val params = compactParams(ca, cb, files, bits)
    def readMarker(): Option[String] =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try Some(new String(in.readAllBytes(), "UTF-8").trim)
        finally in.close()
      }
    // self-healing retry (review finding, r13): unlike Compaction's
    // per-partition swap, this one moves the WHOLE table root — a crash
    // between the two renames leaves the path absent until someone acts.
    // A re-run must finish the interrupted swap, not abort on the missing
    // dir. Roll FORWARD (rename tmp in) only when the params marker —
    // written alongside tmp before any rename — matches THIS call's
    // (ca, cb, files, bits): a retry invoked with different parameters
    // must not silently install a layout built under the old ones
    // (r13 ADVICE); it rolls back via `old` and redoes the rewrite.
    if (!fs.exists(dir)) {
      if (fs.exists(tmp) && readMarker().contains(params)) {
        require(fs.rename(tmp, dir), s"z-compaction recovery failed: $tmp -> $dir")
        if (fs.exists(old)) fs.delete(old, true)
        fs.delete(marker, false)
        return
      }
      // tmp absent, stale, or unverifiable (no marker) — roll back
      require(fs.exists(old),
        s"z-compaction at $path is unrecoverable: table dir absent and no " +
          s"$old to roll back to" +
          (if (fs.exists(tmp)) s" (a $tmp exists but its params marker is " +
            "missing or does not match this call — refusing to install an " +
            "unverified layout)" else ""))
      require(fs.rename(old, dir), s"z-compaction rollback failed: $old -> $dir")
    }
    require(fs.exists(dir), s"no z-layout at $path")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale partial write
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(marker)) fs.delete(marker, false)
    writeZOrdered(spark.read.parquet(path), tmp.toString, ca, cb, files, bits)
    writeCompactMarker(spark, path, ca, cb, files, bits)
    require(fs.rename(dir, old), s"z-compaction swap failed: $dir -> $old")
    require(fs.rename(tmp, dir), s"z-compaction swap failed: $tmp -> $dir")
    fs.delete(old, true)
    fs.delete(marker, false): Unit
  }

  // ---- pointer-indirected (versioned) z-store: NO absent window ----
  // The two-rename swap above briefly leaves the table path absent between
  // renames. The versioned store closes that entirely (VERDICT r13 next
  // #4) by reusing MigrationRunner's pointer discipline: the table lives
  // as version directories behind an atomically-swapped CURRENT pointer,
  // compaction writes a NEW version and swings the pointer, and a reader
  // resolving through readVersioned always lands on a complete directory.
  // The previous version is retained ONE generation for readers that
  // resolved just before a swing, then reaped on the next compaction.
  // The trade: readers must resolve through the pointer (this library),
  // not a bare spark.read.parquet(path) — the rename variant stays for
  // layouts that must remain plain-path readable.

  /** Initialize (or roll forward) a versioned z-store: writes `df`
    * z-ordered as a fresh version under `storeRoot` and publishes it. */
  def writeZOrderedVersioned(df: DataFrame, storeRoot: String, ca: String,
                             cb: String, files: Int = 16,
                             bits: Int = 21): Unit = {
    val spark = df.sparkSession
    graft.jobs.MigrationRunner.withMaintenanceLock(spark, storeRoot,
        "writeZOrderedVersioned") {
      val name = graft.jobs.MigrationRunner.freshVersionName(spark, storeRoot, "z")
      writeZOrdered(df, s"$storeRoot/$name", ca, cb, files, bits)
      graft.jobs.MigrationRunner.publish(spark, storeRoot, name)
    }
  }

  /** Resolve the live version of a versioned z-store. */
  def readVersioned(spark: org.apache.spark.sql.SparkSession,
                    storeRoot: String): DataFrame =
    graft.jobs.MigrationRunner.current(spark, storeRoot)

  /** Re-interleave a versioned z-store: one z-ordered rewrite of the live
    * version into a fresh version dir, one atomic pointer swing — a racing
    * reader sees the old version or the new, NEVER an absent table
    * (ZOrderLayoutSpec races a reader thread against repeated compactions).
    * Crash-safe with no marker machinery: a crash before publish leaves an
    * unreferenced version dir that the next run's reap deletes; the
    * pointer only ever references complete writes. */
  def compactZOrderedVersioned(spark: org.apache.spark.sql.SparkSession,
                               storeRoot: String, ca: String, cb: String,
                               files: Int = 16, bits: Int = 21): Unit =
   graft.jobs.MigrationRunner.withMaintenanceLock(spark, storeRoot,
       "compactZOrderedVersioned") {
    import org.apache.hadoop.fs.Path
    val prevLive = graft.jobs.MigrationRunner.currentVersion(spark, storeRoot)
    require(prevLive.nonEmpty, s"no versioned z-store under $storeRoot")
    val name = graft.jobs.MigrationRunner.freshVersionName(spark, storeRoot, "z")
    writeZOrdered(readVersioned(spark, storeRoot), s"$storeRoot/$name",
      ca, cb, files, bits)
    graft.jobs.MigrationRunner.publish(spark, storeRoot, name)
    // reap by switchover HISTORY: keep the live version plus the two most
    // recently superseded (a reader would have to stall across three
    // swings to lose its resolved version), and the pre-publish live
    // EXPLICITLY (a store whose HISTORY predates its pointer must never
    // reap what a racing reader just resolved); crash leftovers — written
    // but never published — are in neither set and get reaped.
    val keep = graft.jobs.MigrationRunner.versionHistory(spark, storeRoot)
      .takeRight(3).toSet + name ++ prevLive
    val root = new Path(storeRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filterNot(p => keep.contains(p.getName))
      .foreach(fs.delete(_, true))
   }

  private def compactParams(ca: String, cb: String, files: Int,
                            bits: Int): String =
    s"ca=$ca|cb=$cb|files=$files|bits=$bits"

  /** Write the swap-params marker for `path`'s pending z-compaction — the
    * recovery precondition for rolling a leftover tmp forward. Exposed
    * package-private so the crash-simulation spec can construct the exact
    * on-disk state an interrupted run leaves behind. */
  private[graft] def writeCompactMarker(spark: org.apache.spark.sql.SparkSession,
                                        path: String, ca: String, cb: String,
                                        files: Int, bits: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(dir.getParent, "." + dir.getName + ".z-compact-params")
    val out = fs.create(marker, true)
    try out.write(compactParams(ca, cb, files, bits).getBytes("UTF-8"))
    finally out.close()
  }

  /** The AUTO path: rank-quantize both dimensions to `k` equi-depth
    * buckets first (one approxQuantile pass per column — sampled, cheap),
    * then interleave the bucket ids. This is how the curve stays BALANCED
    * when the raw dimensions have unequal bit-widths or skewed ranges
    * (raw interleave of an 8-bit user id with a 40-bit epoch value would
    * put every top z-bit on the epoch side and degrade to a plain time
    * sort — the same reason Delta's Z-ORDER interleaves range ids, not
    * raw values). Bucket mapping is `size(filter(bounds, x <= c))` over a
    * literal boundary array — codegen'd, no UDF, no extra shuffle beyond
    * the one range exchange every sorted write pays. */
  def writeZOrderedRanked(df: DataFrame, path: String, ca: String,
                          cb: String, files: Int = 16, k: Int = 256): Unit = {
    require(k > 1 && (k & (k - 1)) == 0, s"k must be a power of two: $k")
    val bits = java.lang.Integer.numberOfTrailingZeros(k)
    val probs = (1 until k).map(_.toDouble / k).toArray
    def bucket(c: String): Column = {
      val bounds = df.stat.approxQuantile(c, probs, 0.01)
      val arr = array(bounds.map(lit(_)).toIndexedSeq: _*)
      size(filter(arr, x => x <= col(c).cast("double"))).cast("long")
    }
    df.withColumn("__z", zvalue(bucket(ca), bucket(cb), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
