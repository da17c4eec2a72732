package graft.serving

import java.util.concurrent.ConcurrentLinkedQueue

import org.sparkproject.connect.grpc.{CallOptions, ManagedChannelBuilder}
import org.sparkproject.connect.grpc.stub.ClientCalls

import graft.serving.FeatureProto._

/** gRPC SLA measurement, the binary-protocol sibling of ApiBench — the
  * reference's perf suite asserts gRPC beats REST on the same workload
  * (tests/integration/test_performance.py:257; baseline gRPC p95 24-28 ms
  * vs REST 38 ms, docs/PERFORMANCE.md:14-22). Same methodology: warm a
  * seed set (row-tier steady state), then drive point reads round-robin
  * from N concurrent clients over one shared channel (HTTP/2 multiplexes;
  * one channel per process is the standard gRPC deployment shape). */
object GrpcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threads = sys.env.getOrElse("SPARK_GRAFT_API_THREADS", "8").toInt
    val requests = sys.env.getOrElse("SPARK_GRAFT_API_REQUESTS", "5000").toInt
    val spark = graft.core.Sessions.local(cpus)
    val service = new FeatureStoreService(spark, sfDir)
    val grpc = new FeatureGrpc(service)
    val port = grpc.start(0)
    val channel = ManagedChannelBuilder.forAddress("localhost", port)
      .usePlaintext().build()
    val allTypes = Seq("user", "transaction", "risk")

    def point(id: String): Double = {
      val t0 = System.nanoTime()
      val r = ClientCalls.blockingUnaryCall(channel, grpc.getUserFeaturesMethod,
        CallOptions.DEFAULT, PUserFeatureRequest(id, allTypes))
      require(r.uid == id, s"uid mismatch: ${r.uid}")
      (System.nanoTime() - t0) / 1e6
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(p * s.size).toInt - 1))
    }
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

    import org.apache.spark.sql.functions.col
    val ids = graft.jobs.UserFeaturesJob(spark, sfDir)
      .select(col("user_id")).limit(96).collect().map(_.getLong(0).toString).toSeq
    require(ids.size >= 32, s"need a real user population, got ${ids.size}")

    point(ids.head) // session/codegen warm-up, untimed
    val cold = ids.tail.take(31).map(point)
    ids.foreach(point) // warm the rest: every id below is a row-tier hit

    val lat = new ConcurrentLinkedQueue[Double]()
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val perThread = math.max(1, requests / threads)
    val t0 = System.nanoTime()
    val workers = (0 until threads).map { t =>
      new Thread(() => {
        var i = 0
        while (i < perThread) {
          try lat.add(point(ids((t * perThread + i) % ids.size)))
          catch { case e: Throwable =>
            errors.incrementAndGet()
            System.err.println(s"[grpc-bench] request failed: ${e.getMessage}")
          }
          i += 1
        }
      })
    }
    workers.foreach(_.start()); workers.foreach(_.join())
    val wallSec = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val warm = lat.asScala.toSeq
    require(warm.nonEmpty, s"no successful requests (${errors.get()} errors)")
    val health = (1 to 200).map { _ =>
      val h0 = System.nanoTime()
      ClientCalls.blockingUnaryCall(channel, grpc.healthCheckMethod,
        CallOptions.DEFAULT, PHealthCheckRequest("feature_store"))
      (System.nanoTime() - h0) / 1e6
    }

    println(s"""{"metric":"grpc_rps","value":${fmt(warm.size / wallSec)},""" +
      s""""unit":"req/sec","threads":$threads,"requests":${warm.size},""" +
      s""""errors":${errors.get()},""" +
      s""""warm_ms":{"p50":${fmt(pct(warm, 0.5))},"p95":${fmt(pct(warm, 0.95))},""" +
      s""""p99":${fmt(pct(warm, 0.99))},"max":${fmt(warm.max)}},""" +
      s""""cold_ms":{"p50":${fmt(pct(cold, 0.5))},"p95":${fmt(pct(cold, 0.95))}},""" +
      s""""health_ms":{"p50":${fmt(pct(health, 0.5))},"p95":${fmt(pct(health, 0.95))}},""" +
      s""""sf":"$sfDir"}""")
    channel.shutdownNow()
    grpc.stop()
    spark.stop()
  }
}
