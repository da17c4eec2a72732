package graft.serving

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** REST SLA measurement against the reference's own performance gates
  * (tests/integration/test_performance.py:72-73,109: cached point reads
  * p95 < 40 ms; sustained > 1000 RPS under concurrent clients). Runs the
  * real wire path — HttpClient → FeatureApi → FeatureStoreService — under
  * the shared SlaBench methodology (seed-set warm-up, cold/warm split,
  * N concurrent clients round-robin; see SlaBench's scaladoc) and prints
  * one JSON line with latency percentiles and sustained RPS.
  */
object ApiBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    val service = new FeatureStoreService(spark, sfDir)
    val api = new FeatureApi(service)
    val port = api.start(0)
    val qs = "?feature_types=user&feature_types=transaction&feature_types=risk"

    def send(client: HttpClient, path: String): Double = {
      val t0 = System.nanoTime()
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
      require(r.statusCode() == 200, s"$path -> ${r.statusCode()}")
      (System.nanoTime() - t0) / 1e6
    }

    SlaBench.run("api_rps", spark, sfDir, SlaBench.Transport[HttpClient](
      newClient = () => HttpClient.newHttpClient(),
      point = (c, id) => send(c, s"/features/user/$id$qs"),
      health = c => send(c, "/features/health")))
    api.stop()
    spark.stop()
  }
}
