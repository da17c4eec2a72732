package graft.serving

import org.apache.spark.sql.SparkSession

/** Standalone REST server entry — `runMain graft.serving.FeatureApiMain
  * [sfDir] [port]` brings up the feature store over a corpus dir and
  * serves the api.py route set until killed (the process face of the
  * reference's `uvicorn src.main:app`). */
object FeatureApiMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val port = args.lift(1) match {
      case None => 8080
      case Some(p) => p.toIntOption.filter(x => x >= 0 && x <= 65535).getOrElse {
        System.err.println(s"usage: FeatureApiMain [sfDir] [port]; bad port '$p'")
        sys.exit(2)
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    val api = new FeatureApi(new FeatureStoreService(spark, dir))
    val bound = api.start(port)
    println(s"[api] serving $dir at http://localhost:$bound/features/health")
    Thread.currentThread().join() // serve until the process is killed
  }
}
