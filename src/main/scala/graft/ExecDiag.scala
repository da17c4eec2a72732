package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev measurement main: run ONE query to a warm steady state (FeatureCache
  * built by the first iterations), then dump where its time goes at the
  * harness level the Spark UI would show if we had one —
  *
  *   - jobs / stages / tasks launched by one warm run (scheduling overhead
  *     is invisible in plan text but real at 109 queries x 3 runs);
  *   - per-stage task counts and ms so 32-tiny-task stages stand out;
  *   - the AQE-FINAL executed plan (the initial plan lies — r10 lesson).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.ExecDiag risk_features_incremental"
  */
object ExecDiag {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExecDiag <query> [warmIters]")
    val name = args(0)
    val warmIters = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, logLevel = "ERROR")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))

    (1 to warmIters).foreach(_ => fn(spark, sfDir).count())

    @volatile var jobs = 0
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long)]()
    @volatile var tasks = 0
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        stages.put(si.stageId, (si.name.take(60), si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(l)
    val df = fn(spark, sfDir)
    val t0 = System.nanoTime()
    df.count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let the listener bus drain
    spark.sparkContext.removeSparkListener(l)

    println(f"[exec-diag] $name warm run: $dt%.3f s  jobs=$jobs stages=${stages.size} tasks=$tasks")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (nm, nt, ms)) =>
      println(f"[exec-diag]   stage $id%4d tasks=$nt%4d ${ms}%6d ms  $nm")
    }
    println("[exec-diag] === AQE-final executed plan ===")
    println(df.queryExecution.executedPlan.toString.take(20000))
    spark.stop()
  }
}
