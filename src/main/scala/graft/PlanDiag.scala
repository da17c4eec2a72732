package graft

/** Dev main: compare one query's EXECUTED physical plan across scale dirs —
  * the adjudication tool for plan-shape transitions (a shuffle-growth
  * "suspect" between rungs is usually a strategy flip — broadcast→SMJ,
  * AQE coalesce boundaries — not super-linear work; the fix is to LOOK).
  * Counts the join/exchange node mix after AQE finalizes (an action runs
  * first: initial plans lie — the r10 lesson) and prints it per dir.
  *
  *   sbt "runMain graft.PlanDiag migration_checks /tmp/graft-sf1 /tmp/graft-sf3"
  */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PlanDiag <query> <dir> [dir2 ...]")
    val name = args(0)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), logLevel = "ERROR")
    val nodes = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "Exchange hashpartitioning",
      "Exchange rangepartitioning", "ReusedExchange", "AQEShuffleRead")
    args.drop(1).foreach { dir =>
      val df = fn(spark, dir)
      df.count() // finalize AQE
      val p = df.queryExecution.executedPlan.toString
      val mix = nodes.map(n => s"$n=${p.split(java.util.regex.Pattern.quote(n)).length - 1}")
        .mkString(" ")
      println(s"[plan-diag] $name @ $dir: $mix")
      // per-exchange record counts: WHICH shuffle carries the growth
      def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = {
        n match {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            val recs = Seq("shuffleRecordsWritten", "recordsWritten",
              "numOutputRows").flatMap(e.metrics.get).map(_.value)
              .headOption.getOrElse(-1L)
            val child = e.child.toString.linesIterator.next().take(90)
            println(s"[plan-diag]   exchange records=$recs " +
              s"[${e.metrics.keys.toSeq.sorted.mkString(",")}]  child: $child")
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ => ()
        }
        n.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    spark.stop()
  }
}
