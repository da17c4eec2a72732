package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{EventPipeline, VelocityFeatures}
import graft.streaming.VelocityFeatures.TxnEvent

/** Streaming throughput harness — the measured events/s of the two
  * streaming paths (PERF.md's gap until round 7: the streaming operators
  * were correctness-tested but unbenched):
  *
  *   1. wire path: JSON parse → validity envelope → type router (the
  *      stateless per-event work every ingested event pays);
  *   2. stateful path: the flatMapGroupsWithState velocity windows, under
  *      a uniform key distribution and under a 95%-hot-key skew at three
  *      buffer caps — the hot-key-cap degradation curve (the cap trades
  *      feature completeness for bounded state; this shows what it buys).
  *
  * MemoryStream feeds fixed-size chunks with processAllAvailable per chunk,
  * so the number is steady-state micro-batch throughput (batch boundaries
  * included), not one giant batch. Prints ONE JSON line.
  */
object StreamBench {

  private def eventJson(i: Long, uid: Long): String = {
    val sec = i % 86400
    val ts = f"2024-01-01T${sec / 3600}%02d:${sec % 3600 / 60}%02d:${sec % 60}%02dZ"
    val et = Seq("click", "view", "purchase", "signup", "error")((i % 5).toInt)
    s"""{"event_id":$i,"ts":"$ts","user_id":$uid,"event_type":"$et","value":${(i % 500) / 10.0},"props":"{}"}"""
  }

  private def txn(i: Long, uid: Long): TxnEvent =
    TxnEvent(uid, new Timestamp(1704067200000L + (i % 86400) * 1000),
      (i % 500) / 10.0, (i % 37).toInt, i % 10 != 0)

  /** Run a streaming query over `chunks` fed one-per-micro-batch. The FIRST
    * chunk is an untimed warm-up (query/state-store/shuffle init — the same
    * methodology on every path, so the published numbers compare); returns
    * events/s over the remaining chunks. */
  private def drive[A](input: MemoryStream[A], out: DataFrame,
                       chunks: Seq[Seq[A]],
                       sink: (DataFrame, Long) => Unit =
                         (b: DataFrame, _: Long) => { b.count(); () }): Long = {
    val q: StreamingQuery = out.writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sbench").toString)
      .outputMode("append")
      .start()
    input.addData(chunks.head); q.processAllAvailable() // warm-up, untimed
    val t0 = System.nanoTime()
    chunks.tail.foreach { c => input.addData(c); q.processAllAvailable() }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    (chunks.tail.map(_.size.toLong).sum / secs).toLong
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "100000").toLong
    val chunkSize = 10000
    val spark = graft.core.Sessions.local(cpus)
    import spark.implicits._

    def chunksOf[A](xs: IndexedSeq[A]): Seq[Seq[A]] =
      xs.grouped(chunkSize).map(_.toSeq).toSeq

    // -- wire path: parse → route over JSON strings --------------------
    val wire = (0L until n).map(i => eventJson(i, i % 200))
    val wireIn = MemoryStream[String](spark)
    val wireEps = drive(wireIn,
      EventPipeline.route(EventPipeline.parse(wireIn.toDF())), chunksOf(wire))

    // -- stateful path: velocity windows, uniform keys -----------------
    val uniform = (0L until n).map(i => txn(i, i % 200))
    val uniIn = MemoryStream[TxnEvent](spark)
    val uniEps = drive(uniIn,
      VelocityFeatures.stream(uniIn.toDS()).toDF(), chunksOf(uniform))

    // -- stateful path: 95% of events on one hot key, per buffer cap ---
    val hot = (0L until n).map(i => txn(i, if (i % 20 != 0) 0L else i % 200))
    val hotEps = Seq(10000, 1000, 100).map { cap =>
      val in = MemoryStream[TxnEvent](spark)
      cap -> drive(in,
        VelocityFeatures.stream(in.toDS(), maxEventsPerUser = cap).toDF(),
        chunksOf(hot))
    }

    // -- wire + the FUSED stream-side DQ monitor pair in foreachBatch --
    // (what the monitored ingest path costs: one extra (day, bucket)
    // aggregate per micro-batch, both monitors fed by driver-side
    // marginalization — running them separately costs two jobs/batch and
    // measured ~47% of wire throughput; the fused pass is the shipped
    // recommendation)
    val monIn = MemoryStream[String](spark)
    val ref = graft.streaming.DriftMonitor.reference(
      (1 to 500).map(_ / 10.0).toDF("v"), "v", 10)
    val pair = graft.streaming.MonitorPair(ref)
    val monEps = drive(monIn,
      EventPipeline.route(EventPipeline.parse(monIn.toDF())), chunksOf(wire),
      sink = (b: DataFrame, id: Long) => {
        b.count()
        pair.update(b, "ts", "value", id)
        ()
      })

    val hotJson = hotEps.map { case (c, e) => "\"cap" + c + "\":" + e }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_events_per_sec","events":$n,"chunk":$chunkSize,""" +
      s""""parse_route":$wireEps,"parse_route_monitored":$monEps,""" +
      s""""velocity_uniform":$uniEps,"velocity_hot95":$hotJson}""")
    spark.stop()
  }
}
