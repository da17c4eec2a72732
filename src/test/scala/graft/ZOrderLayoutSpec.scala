package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.sinks.ZOrderLayout

/** Pins for the Z-order layout: the Morton code itself, the fit guard,
  * and — the actual claim — the RUNTIME records contrast: on the
  * z-layout BOTH single-dimension probes decode a fraction of the table,
  * while the single-key-sorted control full-scans on the other dim. */
class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue is the Morton interleave (a→even, b→odd bit positions)") {
    // a=011₂ → positions 0,2 = 1+4 = 5; b=101₂ → positions 1,5 = 2+32 = 34
    val z = spark.range(1)
      .select(ZOrderLayout.zvalue(lit(3L), lit(5L), 3).as("z"))
      .head.getLong(0)
    assert(z == 39L)
    // interleave is a bijection on the box: distinct inputs, distinct codes
    val codes = spark.range(64).select(
      ZOrderLayout.zvalue(col("id") % 8, col("id") / 8, 3).as("z"))
      .distinct().count()
    assert(codes == 64L)
  }

  test("out-of-range dimensions are rejected, not silently truncated") {
    val e = intercept[IllegalArgumentException] {
      ZOrderLayout.writeZOrdered(Seq((1L << 22, 1L)).toDF("a", "b"),
        java.nio.file.Files.createTempDirectory("graft-zbad").toString,
        "a", "b", files = 2)
    }
    assert(e.getMessage.contains("quantize"))
  }

  test("records contrast: the z-layout prunes BOTH dimensions at runtime; " +
      "the single-key sort control full-scans the other one") {
    val sf = "/root/testdata/sf0.01"
    val ev = core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("day", datediff(to_date(col("ts")),
        lit(java.sql.Date.valueOf("2024-01-01"))).cast("long"))
    val zdir = java.nio.file.Files.createTempDirectory("graft-zord").toString
    val udir = java.nio.file.Files.createTempDirectory("graft-usort").toString
    ZOrderLayout.writeZOrderedRanked(ev, zdir, "user_id", "day", files = 32)
    ev.repartitionByRange(32, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(udir)
    val n = ev.count()
    val sm = core.StageMetrics.attach(spark)
    def recs(dir: String, cond: Column): Long = {
      spark.read.parquet(dir).filter(cond).count() // plan/codegen warm
      sm.measure { spark.read.parquet(dir).filter(cond).count(): Unit }
        .inputRecords
    }
    val (uid, day) = (7L, 10L)
    val zUser = recs(zdir, col("user_id") === uid)
    val zDay = recs(zdir, col("day") === day)
    val uUser = recs(udir, col("user_id") === uid)
    val uDay = recs(udir, col("day") === day)
    // 32 files = 5 z-bit split levels: the user probe fixes its top two
    // interleaved bits (~n/4), the day probe its top three (~n/8) — the
    // bounds below leave row-group-boundary slack
    assert(zUser <= n / 3, s"z-layout user probe decoded $zUser of $n")
    assert(zDay <= n / 4, s"z-layout day probe decoded $zDay of $n")
    assert(uUser <= n / 2, s"user-sorted user probe decoded $uUser of $n")
    assert(uDay >= n * 9 / 10,
      s"the control SHOULD full-scan on day ($uDay of $n) — if it prunes, " +
        "the contrast claim is void and this pin must be rethought")
    // the layout must not change content
    assert(spark.read.parquet(zdir).count() == n)
    val zSum = spark.read.parquet(zdir).filter(col("user_id") === uid)
      .agg(sum(col("value").cast("decimal(18,6)"))).head.getDecimal(0)
    val evSum = ev.filter(col("user_id") === uid)
      .agg(sum(col("value").cast("decimal(18,6)"))).head.getDecimal(0)
    assert(zSum == evSum, "z-layout rows diverge from the source")
  }

  test("z-compaction re-interleaves stragglers: both probes prune again afterwards (r13)") {
    val sf = "/root/testdata/sf0.01"
    val ev = core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("day", datediff(to_date(col("ts")),
        lit(java.sql.Date.valueOf("2024-01-01"))).cast("long"))
    // 90% lands z-ordered; 10% arrives later as raw appended stragglers —
    // full-range files that blend into every probe
    val main = ev.filter(pmod(xxhash64(col("user_id"), col("ts")), lit(10)) =!= 0)
    val straggler = ev.filter(pmod(xxhash64(col("user_id"), col("ts")), lit(10)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-zcompact").toString + "/events_z"
    ZOrderLayout.writeZOrdered(main, dir, "user_id", "day", files = 32)
    straggler.coalesce(2).write.mode("append").parquet(dir)
    val n = ev.count()
    assert(spark.read.parquet(dir).count() == n)

    val sm = core.StageMetrics.attach(spark)
    def recs(cond: Column): Long = {
      spark.read.parquet(dir).filter(cond).count() // warm
      sm.measure { spark.read.parquet(dir).filter(cond).count(): Unit }
        .inputRecords
    }
    ZOrderLayout.compactZOrdered(spark, dir, "user_id", "day", files = 32)
    assert(spark.read.parquet(dir).count() == n,
      "z-compaction must not change content")
    // post-compaction pruning must match the fresh-layout bounds of the
    // records-contrast pin above (raw interleave here: user_id is the
    // wider dimension, so its probe fixes more top z-bits than day's)
    val zUser = recs(col("user_id") === 7L)
    val zDay = recs(col("day") === 10L)
    assert(zUser <= n / 3, s"post-compaction user probe decoded $zUser of $n")
    assert(zDay <= n / 2, s"post-compaction day probe decoded $zDay of $n")
    val zSum = spark.read.parquet(dir)
      .agg(sum(col("value").cast("decimal(18,6)"))).head.getDecimal(0)
    val evSum = ev.agg(sum(col("value").cast("decimal(18,6)"))).head.getDecimal(0)
    assert(zSum == evSum, "z-compaction rows diverge from the source")
  }

  test("z-compaction retry self-heals a crash between the two renames (r13 review)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-zcrash").toString
    val dir = s"$base/t"
    val df = (0 until 500).map(i => (i.toLong % 32, i.toLong % 30, i * 1.0))
      .toDF("user_id", "day", "value")
    ZOrderLayout.writeZOrdered(df, dir, "user_id", "day", files = 4)
    val n = spark.read.parquet(dir).count()

    // simulate the crash window: tmp fully written, dir renamed away,
    // second rename never ran — the table path is ABSENT
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, ".t.z-compact-tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent, ".t.z-compact-old")
    ZOrderLayout.writeZOrdered(spark.read.parquet(dir), tmp.toString,
      "user_id", "day", files = 4)
    assert(fs.rename(p, old))
    assert(!fs.exists(p), "crash window: table path absent")

    // the retry must complete the swap forward, not abort on the missing dir
    ZOrderLayout.compactZOrdered(spark, dir, "user_id", "day", files = 4)
    assert(spark.read.parquet(dir).count() == n, "recovered table lost rows")
    assert(!fs.exists(tmp) && !fs.exists(old), "recovery left swap debris")
  }
}
