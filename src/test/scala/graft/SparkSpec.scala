package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps sbt test
  * fast; suites must not mutate global state). */
object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // mirror Sessions.local: bucket pruning on bare filters needs the
    // bucketed scan kept (see the note there)
    .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf0001 = "/root/testdata/sf0.001"

  /** Count SQLExecutionStart events while `body` runs: drains the async
    * listener bus first (prior work's events keep arriving after their
    * actions return), then polls until the count stops moving. The shared
    * idiom for "this path runs N Spark jobs" pins (fused serving probe,
    * row-tier hits, TTL re-probes). */
  def sqlExecutionsDuring(body: => Unit): Int = {
    import java.util.concurrent.atomic.AtomicInteger
    Thread.sleep(1000) // let prior events drain off the async bus
    val execs = new AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.incrementAndGet(): Unit
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline && execs.get() != last) {
        last = execs.get(); Thread.sleep(200)
      }
      execs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
