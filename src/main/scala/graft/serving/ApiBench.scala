package graft.serving

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.ConcurrentLinkedQueue

/** REST SLA measurement against the reference's own performance gates
  * (tests/integration/test_performance.py:72-73,109: cached point reads
  * p95 < 40 ms; sustained > 1000 RPS under concurrent clients). Runs the
  * real wire path — HttpClient → FeatureApi → FeatureStoreService — and
  * prints one JSON line with cold/warm point-read latency percentiles,
  * health latency, and sustained RPS at `threads` concurrent clients.
  *
  * Methodology mirrors the reference test: a seed set of users is warmed
  * (the reference's 93-96% Redis hit-rate steady state), then a fixed
  * request count is driven round-robin over the warm set from N client
  * threads. Cold latencies (first touch → fused Spark probe) are reported
  * separately, never mixed into the cached-read percentile the SLA names.
  */
object ApiBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threads = sys.env.getOrElse("SPARK_GRAFT_API_THREADS", "8").toInt
    val requests = sys.env.getOrElse("SPARK_GRAFT_API_REQUESTS", "5000").toInt
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
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(p * s.size).toInt - 1))
    }
    // Locale.ROOT: a comma-decimal default locale would corrupt the JSON
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

    val client = HttpClient.newHttpClient()
    import org.apache.spark.sql.functions.col
    val ids = graft.jobs.UserFeaturesJob(spark, sfDir)
      .select(col("user_id")).limit(96).collect().map(_.getLong(0)).toSeq
    require(ids.size >= 32, s"need a real user population, got ${ids.size}")

    // one throwaway request pays session/codegen warm-up, then COLD reads:
    // each id's first touch runs the fused probe
    send(client, s"/features/user/${ids.head}$qs")
    val cold = ids.tail.take(31).map(id => send(client, s"/features/user/$id$qs"))
    // warm the remainder so every id below is a row-tier hit
    ids.foreach(id => send(client, s"/features/user/$id$qs"))

    // sustained load: `requests` point reads round-robin over warm ids
    // from `threads` concurrent clients. Failed requests are COUNTED, not
    // silently dropped — a bench that loses a dead worker's samples would
    // report understated RPS as a clean measurement.
    val lat = new ConcurrentLinkedQueue[Double]()
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val perThread = math.max(1, requests / threads)
    val t0 = System.nanoTime()
    val workers = (0 until threads).map { t =>
      new Thread(() => {
        val c = HttpClient.newHttpClient()
        var i = 0
        while (i < perThread) {
          val id = ids((t * perThread + i) % ids.size)
          try lat.add(send(c, s"/features/user/$id$qs"))
          catch { case e: Throwable =>
            errors.incrementAndGet()
            System.err.println(s"[api-bench] request failed: ${e.getMessage}")
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
    val health = (1 to 200).map(_ => send(client, "/features/health"))

    println(s"""{"metric":"api_rps","value":${fmt(warm.size / wallSec)},""" +
      s""""unit":"req/sec","threads":$threads,"requests":${warm.size},""" +
      s""""errors":${errors.get()},""" +
      s""""warm_ms":{"p50":${fmt(pct(warm, 0.5))},"p95":${fmt(pct(warm, 0.95))},""" +
      s""""p99":${fmt(pct(warm, 0.99))},"max":${fmt(warm.max)}},""" +
      s""""cold_ms":{"p50":${fmt(pct(cold, 0.5))},"p95":${fmt(pct(cold, 0.95))}},""" +
      s""""health_ms":{"p50":${fmt(pct(health, 0.5))},"p95":${fmt(pct(health, 0.95))}},""" +
      s""""sf":"$sfDir"}""")
    api.stop()
    spark.stop()
  }
}
