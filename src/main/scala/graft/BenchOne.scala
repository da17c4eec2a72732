package graft

/** Dev measurement main: time ONE SparkEntry query by name, N iterations,
  * without the full Bench warm-up or the other 75 queries — the iteration
  * loop for plan work on a single query. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.BenchOne embedding_outliers 5"
  *
  * Reports every run (first = cold plan/codegen); `Bench` remains the
  * artifact of record — this main trades its warmed-cache steady state for
  * turnaround.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: BenchOne <query> [iters]; queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // analysis + optimization + physical planning
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      val sec = (t3 - t0) / 1e9
      println(f"[bench-one] $name: $sec%.3f s ($n rows)  " +
        f"build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
      sec
    }
    println(f"[bench-one] $name median=${times.sorted.apply(iters / 2)}%.3f s  runs=${times.map(t => f"$t%.3f").mkString("[", ", ", "]")}")
    spark.stop()
  }
}
