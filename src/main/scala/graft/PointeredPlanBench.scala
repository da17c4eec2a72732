package graft

import org.apache.hadoop.fs.Path

import graft.sinks.Compaction

/** Driver-side PLAN-BUILD cost of the pointered warehouse read paths at a
  * years-deep partition count (VERDICT r14 next #4). A 100 TB warehouse
  * with daily partitions is ~1000+ stores; readPointered's union has one
  * branch per store, so even though a partition filter constant-folds the
  * cold branches away, ANALYZING the full union costs driver time per
  * query. The two listing-level prunes (onlyValues, readPointeredWhere)
  * build the plan over just the selected stores — this main MEASURES the
  * contrast instead of asserting it.
  *
  * The fixture is built by FILE COPY, not Spark writes: one tiny parquet
  * version is written once, then cloned into N pointer stores through the
  * filesystem (CURRENT/HISTORY included), so a 1000-store layout costs
  * seconds to stand up. Timed quantity = DataFrame construction through
  * `.queryExecution.optimizedPlan` (listing + pointer resolution + parquet
  * footer/schema + analysis + optimization), i.e. everything a driver pays
  * before any task runs; count() is then run once on each pruned path as a
  * correctness check, not a timed quantity.
  *
  * Usage: java -cp ... graft.PointeredPlanBench [nStores]
  * Prints one JSON line with per-path plan-build seconds.
  */
object PointeredPlanBench {

  private def timeSec[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = graft.core.Sessions.local("8")
    import spark.implicits._

    val base = java.nio.file.Files
      .createTempDirectory("graft-pointered-planbench").toString
    // one real store, written once
    val seed = s"$base/seed"
    (0 until 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .coalesce(1).write.parquet(s"$seed/v1")
    graft.jobs.MigrationRunner.publish(spark, seed, "v1")

    // clone it into n day stores via filesystem copies (local recipe —
    // this is a bench fixture builder, not an engine path)
    val seedDir = java.nio.file.Paths.get(seed)
    val days = (0 until n).map(i =>
      java.time.LocalDate.parse("2020-01-01").plusDays(i.toLong).toString)
    days.foreach { d =>
      val dst = java.nio.file.Paths.get(s"$base/wh/p_day=$d")
      java.nio.file.Files.walk(seedDir).forEach { src =>
        val rel = seedDir.relativize(src)
        val tgt = dst.resolve(rel.toString)
        if (java.nio.file.Files.isDirectory(src))
          java.nio.file.Files.createDirectories(tgt)
        else java.nio.file.Files.copy(src, tgt)
      }
    }
    val wh = s"$base/wh"
    val probe = days(n / 2)

    def planOf(df: => org.apache.spark.sql.DataFrame): Double =
      timeSec { df.queryExecution.optimizedPlan }._2

    // warm the FS/session once on a small slice, then measure
    planOf(Compaction.readPointered(spark, wh, "p_day", "date",
      onlyValues = Some(Set(probe))))

    val guardBefore = Compaction.flatScanWarnings.get()
    val flat = planOf {
      import org.apache.spark.sql.functions.{col, lit}
      Compaction.readPointered(spark, wh, "p_day", "date")
        .filter(col("p_day") === lit(java.sql.Date.valueOf(probe)))
    }
    // the depth guard (r16): the unpruned read past FlatScanWarnAt stores
    // must have fired its loud warning exactly once here — the caller trap
    // this bench measures is no longer silent
    val guardFired = Compaction.flatScanWarnings.get() - guardBefore
    // repeat flat read: the footer-schema validation (r16) is cached per
    // immutable version file, so the second unpruned query pays analysis
    // only — the delta between the two IS the per-session validation cost
    val flatRepeat = planOf {
      import org.apache.spark.sql.functions.{col, lit}
      Compaction.readPointered(spark, wh, "p_day", "date")
        .filter(col("p_day") === lit(java.sql.Date.valueOf(probe)))
    }
    val afterRepeat = Compaction.flatScanWarnings.get()
    val only = planOf(Compaction.readPointered(spark, wh, "p_day", "date",
      onlyValues = Some(Set(probe))))
    val where = planOf(Compaction.readPointeredWhere(spark, wh, "p_day",
      "date")(_ == probe))
    val pruneGuards = Compaction.flatScanWarnings.get() - afterRepeat
    require(n <= Compaction.FlatScanWarnAt || guardFired == 1,
      s"depth guard must fire on the $n-store flat read (fired $guardFired)")
    require(pruneGuards == 0,
      s"depth guard must stay silent on pruned reads (fired $pruneGuards)")

    // correctness: both pruned paths read exactly the probe store's rows
    require(Compaction.readPointered(spark, wh, "p_day", "date",
      onlyValues = Some(Set(probe))).count() == 100L)
    require(Compaction.readPointeredWhere(spark, wh, "p_day", "date")(
      _ == probe).count() == 100L)

    println(f"""{"metric":"pointered_plan_build","stores":$n,""" +
      f""""flat_filter_sec":$flat%.3f,"flat_repeat_sec":$flatRepeat%.3f,""" +
      f""""only_values_sec":$only%.3f,""" +
      f""""where_pred_sec":$where%.3f,"flat_guard_fired":$guardFired}""")

    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(base), true)
    spark.stop()
  }
}
