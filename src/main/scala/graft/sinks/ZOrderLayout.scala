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
    * new one is in place; brief-absence window documented there).
    * ZOrderLayoutSpec pins that both single-dimension probes prune at
    * least as well after compaction as on the fresh layout. */
  def compactZOrdered(spark: org.apache.spark.sql.SparkSession, path: String,
                      ca: String, cb: String, files: Int = 16,
                      bits: Int = 21): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, "." + dir.getName + ".z-compact-tmp")
    val old = new Path(dir.getParent, "." + dir.getName + ".z-compact-old")
    // self-healing retry (review finding, r13): unlike Compaction's
    // per-partition swap, this one moves the WHOLE table root — a crash
    // between the two renames leaves the path absent until someone acts.
    // A re-run must finish the interrupted swap, not abort on the missing
    // dir: tmp was fully written before the first rename ever ran, so
    // tmp-present → complete forward (rename tmp in, drop old); otherwise
    // old-present → roll back (rename old in) and redo normally.
    if (!fs.exists(dir)) {
      if (fs.exists(tmp)) {
        require(fs.rename(tmp, dir), s"z-compaction recovery failed: $tmp -> $dir")
        if (fs.exists(old)) fs.delete(old, true)
        return
      }
      if (fs.exists(old)) {
        require(fs.rename(old, dir), s"z-compaction rollback failed: $old -> $dir")
      }
    }
    require(fs.exists(dir), s"no z-layout at $path")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale partial write
    if (fs.exists(old)) fs.delete(old, true)
    writeZOrdered(spark.read.parquet(path), tmp.toString, ca, cb, files, bits)
    require(fs.rename(dir, old), s"z-compaction swap failed: $dir -> $old")
    require(fs.rename(tmp, dir), s"z-compaction swap failed: $tmp -> $dir")
    fs.delete(old, true): Unit
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
