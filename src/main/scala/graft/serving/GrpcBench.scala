package graft.serving

import org.sparkproject.connect.grpc.{CallOptions, Channel, ManagedChannelBuilder}
import org.sparkproject.connect.grpc.stub.ClientCalls

import graft.serving.FeatureProto._

/** gRPC SLA measurement, the binary-protocol sibling of ApiBench — the
  * reference's perf suite asserts gRPC beats REST on the same workload
  * (tests/integration/test_performance.py:257; baseline gRPC p95 24-28 ms
  * vs REST 38 ms, docs/PERFORMANCE.md:14-22). Same methodology by
  * construction: both faces run under the shared SlaBench harness; only
  * the transport closure differs (all workers multiplex one channel —
  * the standard one-channel-per-process gRPC deployment shape).
  */
object GrpcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    val service = new FeatureStoreService(spark, sfDir)
    val grpc = new FeatureGrpc(service)
    val port = grpc.start(0)
    val channel = ManagedChannelBuilder.forAddress("localhost", port)
      .usePlaintext().build()
    val allTypes = Seq("user", "transaction", "risk")

    SlaBench.run("grpc_rps", spark, sfDir, SlaBench.Transport[Channel](
      newClient = () => channel,
      point = (c, id) => {
        val t0 = System.nanoTime()
        val r = ClientCalls.blockingUnaryCall(c, grpc.getUserFeaturesMethod,
          CallOptions.DEFAULT, PUserFeatureRequest(id.toString, allTypes))
        require(r.uid == id.toString, s"uid mismatch: ${r.uid}")
        (System.nanoTime() - t0) / 1e6
      },
      health = c => {
        val t0 = System.nanoTime()
        ClientCalls.blockingUnaryCall(c, grpc.healthCheckMethod,
          CallOptions.DEFAULT, PHealthCheckRequest("feature_store"))
        (System.nanoTime() - t0) / 1e6
      }))
    channel.shutdownNow()
    grpc.stop()
    spark.stop()
  }
}
