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

  private def eventJson(i: Long, uid: Long,
                        value: Double = Double.NaN): String = {
    val sec = i % 86400
    val ts = f"2024-01-01T${sec / 3600}%02d:${sec % 3600 / 60}%02d:${sec % 60}%02dZ"
    val et = Seq("click", "view", "purchase", "signup", "error")((i % 5).toInt)
    val v = if (value.isNaN) (i % 500) / 10.0 else value
    s"""{"event_id":$i,"ts":"$ts","user_id":$uid,"event_type":"$et","value":$v,"props":"{}"}"""
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
    val chunkSize = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNK", "10000").toInt
    val spark = graft.core.Sessions.local(cpus)
    // SPARK_GRAFT_STATE_PROVIDER=rocksdb swaps the state backend for every
    // stateful query in this run — the 100 TB lever (disk-bounded state
    // instead of executor-heap-bounded); RocksDbStateSpec pins output
    // parity, this knob prices it
    val stateProvider = sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "hdfs")
    if (stateProvider == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    def chunksOf[A](xs: IndexedSeq[A]): Seq[Seq[A]] =
      xs.grouped(chunkSize).map(_.toSeq).toSeq

    // -- wire path: parse → route over JSON strings --------------------
    val wire = (0L until n).map(i => eventJson(i, i % 200))
    val ref = graft.streaming.DriftMonitor.reference(
      (1 to 500).map(_ / 10.0).toDF("v"), "v", 10)

    /** One wire-path run: plain, with the fused two-job monitor pair, or
      * with the observe-piggyback pair. Each call builds a fresh stream +
      * a fresh Pair, so runs never share state. */
    def wireRun(data: IndexedSeq[String], mode: String): Long = {
      val in = MemoryStream[String](spark)
      val sink: (DataFrame, Long) => Unit = mode match {
        case "plain" => (b, _) => { b.count(); () }
        case "fused" => // the two-job form: sink action + cells aggregate
          val pair = graft.streaming.MonitorPair(ref)
          (b, id) => { b.count(); pair.update(b, "ts", "value", id); () }
        case "observed" => // metrics ride the sink's own action
          val obs = graft.streaming.MonitorPair.observed(ref)
          (b, id) => {
            val (inst, complete) = obs(b, "ts", "value", id)
            inst.count()
            complete(): Unit
          }
      }
      drive(in, EventPipeline.route(EventPipeline.parse(in.toDF())),
        chunksOf(data), sink)
    }
    // JIT-warm every flavor with a DISCARDED run each, then time — round
    // 10's tax figure compared a cold plain baseline against a warm
    // monitored run (first-run JIT costs ~2x on this path); the warm
    // protocol is the honest one
    Seq("plain", "fused", "observed").foreach(m => wireRun(wire, m): Unit)
    val wireEps = wireRun(wire, "plain")
    val monEps = wireRun(wire, "fused")
    val monObsEps = wireRun(wire, "observed")

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

    // -- monitored wire path under 95%-one-bucket value skew ------------
    // (VERDICT r10 item 5: re-measure the fused pair's tax under groupBy
    // skew — 19/20 events land in ONE (day, bucket) aggregation cell. The
    // per-batch aggregate output stays ≤ days×buckets rows either way;
    // what skew can cost is the map-side combine concentrating on one
    // reducer.)
    val wireHot = (0L until n).map(i =>
      eventJson(i, i % 200, if (i % 20 != 0) 25.0 else (i % 500) / 10.0))
    val hotWireEps = wireRun(wireHot, "plain")
    val monHotEps = wireRun(wireHot, "fused")
    val monObsHotEps = wireRun(wireHot, "observed")

    // -- end-to-end: wire + observed monitor + velocity state TOGETHER --
    // (VERDICT r11 next #6: each leg was measured alone). Topology: two
    // consumers of one source — the reference's own shape (the feature
    // pipeline and the monitor subscribe to the same events topic
    // independently); each query runs its own full plan, so the feature
    // leg re-parses the wire — that re-read is the honest cost of the
    // fork and is inside the published number. The all-in events/s is
    // n / (time until BOTH queries drained every chunk).
    import org.apache.spark.sql.functions.{col, lit, pmod}
    def e2eRun(data: IndexedSeq[String], observed: Boolean): Long = {
      val in = MemoryStream[String](spark)
      val routed = EventPipeline.route(EventPipeline.parse(in.toDF()))
      val txns = routed
        .filter(col("valid") && col("route") === "transaction_features")
        .select(col("user_id"), col("ts"), col("value").as("amount"),
          pmod(col("event_id"), lit(37)).cast("int").as("merchant_id"),
          lit(true).as("success"))
        .as[TxnEvent]
      val sink: (DataFrame, Long) => Unit =
        if (observed) {
          val o = graft.streaming.MonitorPair.observed(ref)
          (b, id) => {
            val (inst, complete) = o(b, "ts", "value", id)
            inst.count(); complete(): Unit
          }
        } else (b, _) => { b.count(); () }
      def ckpt = java.nio.file.Files.createTempDirectory("graft-sbench").toString
      val q1 = routed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      val q2 = VelocityFeatures.stream(txns).toDF().writeStream
        .foreachBatch((b: DataFrame, _: Long) => { b.count(); () })
        .option("checkpointLocation", ckpt).outputMode("append").start()
      val chunks = chunksOf(data)
      def drain(): Unit = { q1.processAllAvailable(); q2.processAllAvailable() }
      in.addData(chunks.head); drain() // warm-up, untimed
      val t0 = System.nanoTime()
      chunks.tail.foreach { c => in.addData(c); drain() }
      val secs = (System.nanoTime() - t0) / 1e9
      q1.stop(); q2.stop()
      (chunks.tail.map(_.size.toLong).sum / secs).toLong
    }
    // hot e2e frame: BOTH skews at once — 95% of events on one user
    // (velocity hot key) AND one value bucket (monitor groupBy skew)
    val e2eHot = (0L until n).map(i =>
      if (i % 20 != 0) eventJson(i, 0L, 25.0) else eventJson(i, i % 200))
    Seq((wire, false), (wire, true), (e2eHot, false), (e2eHot, true))
      .foreach { case (d, o) => e2eRun(d, o): Unit } // JIT-warm each flavor
    val e2eUni = e2eRun(wire, observed = false)
    val e2eUniObs = e2eRun(wire, observed = true)
    val e2eHot95 = e2eRun(e2eHot, observed = false)
    val e2eHot95Obs = e2eRun(e2eHot, observed = true)

    val hotJson = hotEps.map { case (c, e) => "\"cap" + c + "\":" + e }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_events_per_sec","events":$n,"chunk":$chunkSize,""" +
      s""""state_provider":"$stateProvider",""" +
      s""""parse_route":$wireEps,"parse_route_monitored":$monEps,""" +
      s""""parse_route_observed":$monObsEps,""" +
      s""""parse_route_hot95":$hotWireEps,"parse_route_monitored_hot95":$monHotEps,""" +
      s""""parse_route_observed_hot95":$monObsHotEps,""" +
      s""""velocity_uniform":$uniEps,"velocity_hot95":$hotJson,""" +
      s""""e2e_uniform":$e2eUni,"e2e_uniform_observed":$e2eUniObs,""" +
      s""""e2e_hot95":$e2eHot95,"e2e_hot95_observed":$e2eHot95Obs}""")
    spark.stop()
  }
}
