package graft.serving

/** Standalone gRPC server entry — `runMain graft.serving.GrpcServerMain
  * [sfDir] [port]` brings up the feature store over a corpus dir and
  * serves the feature_store.FeatureStore service until killed (the
  * process face of the reference's `python src/grpc_server.py`, which
  * binds 50051 — the same default here). */
object GrpcServerMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val port = args.lift(1) match {
      case None => 50051
      case Some(p) => p.toIntOption.filter(x => x >= 0 && x <= 65535).getOrElse {
        System.err.println(s"usage: GrpcServerMain [sfDir] [port]; bad port '$p'")
        sys.exit(2)
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    val grpc = new FeatureGrpc(new FeatureStoreService(spark, dir))
    val bound = grpc.start(port)
    println(s"[grpc] serving $dir on port $bound (feature_store.FeatureStore)")
    Thread.currentThread().join() // serve until the process is killed
  }
}
