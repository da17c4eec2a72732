package graft.serving

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession

/** The shared serving-SLA measurement harness behind ApiBench (REST) and
  * GrpcBench — ONE copy of the methodology both faces are compared under
  * (the PERF.md REST-vs-gRPC table is only meaningful if the two benches
  * can't drift): a seed set of users is warmed to the row-tier steady
  * state (the reference's 93-96% Redis hit-rate posture), cold first
  * touches are reported separately from the cached-read percentiles the
  * SLA names, then a fixed request count is driven round-robin over the
  * warm set from N concurrent client threads. Failed requests are COUNTED,
  * not silently dropped — a bench that loses a dead worker's samples
  * would report understated RPS as a clean measurement.
  *
  * Only the transport differs per face: `newClient()` builds a worker's
  * client state (REST: one HttpClient per thread; gRPC: every call shares
  * the one channel — HTTP/2 multiplexes, one channel per process is the
  * standard deployment shape), `point` runs+times one point read and
  * `health` one health probe, each returning elapsed milliseconds.
  */
private[serving] object SlaBench {

  final case class Transport[C](
      newClient: () => C,
      point: (C, Long) => Double,
      health: C => Double)

  def run[C](metric: String, spark: SparkSession, sfDir: String,
             transport: Transport[C]): Unit = {
    val threads = sys.env.getOrElse("SPARK_GRAFT_API_THREADS", "8").toInt
    val requests = sys.env.getOrElse("SPARK_GRAFT_API_REQUESTS", "5000").toInt

    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(p * s.size).toInt - 1))
    }
    // Locale.ROOT: a comma-decimal default locale would corrupt the JSON
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

    import org.apache.spark.sql.functions.col
    val ids = graft.jobs.UserFeaturesJob(spark, sfDir)
      .select(col("user_id")).limit(96).collect().map(_.getLong(0)).toSeq
    require(ids.size >= 32, s"need a real user population, got ${ids.size}")

    // one throwaway request pays session/codegen warm-up, then COLD reads:
    // each id's first touch runs the fused probe
    val client = transport.newClient()
    transport.point(client, ids.head)
    val cold = ids.tail.take(31).map(transport.point(client, _))
    // warm the remainder so every id below is a row-tier hit
    ids.foreach(transport.point(client, _))

    val lat = new ConcurrentLinkedQueue[Double]()
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val perThread = math.max(1, requests / threads)
    val t0 = System.nanoTime()
    val workers = (0 until threads).map { t =>
      new Thread(() => {
        val c = transport.newClient()
        var i = 0
        while (i < perThread) {
          try lat.add(transport.point(c, ids((t * perThread + i) % ids.size)))
          catch { case e: Throwable =>
            errors.incrementAndGet()
            System.err.println(s"[$metric] request failed: ${e.getMessage}")
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
    val health = (1 to 200).map(_ => transport.health(client))

    println(s"""{"metric":"$metric","value":${fmt(warm.size / wallSec)},""" +
      s""""unit":"req/sec","threads":$threads,"requests":${warm.size},""" +
      s""""errors":${errors.get()},""" +
      s""""warm_ms":{"p50":${fmt(pct(warm, 0.5))},"p95":${fmt(pct(warm, 0.95))},""" +
      s""""p99":${fmt(pct(warm, 0.99))},"max":${fmt(warm.max)}},""" +
      s""""cold_ms":{"p50":${fmt(pct(cold, 0.5))},"p95":${fmt(pct(cold, 0.95))}},""" +
      s""""health_ms":{"p50":${fmt(pct(health, 0.5))},"p95":${fmt(pct(health, 0.95))}},""" +
      s""""sf":"$sfDir"}""")
  }
}
