package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods.parse

import graft.serving.{FeatureApi, FeatureStoreService}

/** REST wire-shape parity with api.py: routes, status codes, response
  * models, and the serving semantics (all-types hit rule, freshness,
  * batch cap) observed THROUGH the HTTP boundary. */
class ApiSpec extends SparkSpec {

  private lazy val service = new FeatureStoreService(spark, sf0001)
  private lazy val api = new FeatureApi(service)
  private lazy val port = api.start(0)
  private val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET.build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /features/health reports healthy with component checks") {
    val r = get("/features/health")
    assert(r.statusCode() == 200)
    val j = parse(r.body())
    assert((j \ "status") == JString("healthy"))
    assert((j \ "checks" \ "overall") == JBool(true))
  }

  test("GET /features/user/{id} serves the full feature envelope") {
    import spark.implicits._
    val building = core.Roles.users(spark, sf0001)
      .filter($"recently_updated").select("user_id").as[Long].head()
    val r = get(s"/features/user/$building" +
      "?feature_types=user&feature_types=transaction&feature_types=risk")
    assert(r.statusCode() == 200)
    val j = parse(r.body())
    assert((j \ "cache_hit") == JBool(true))
    assert((j \ "user_features" \ "user_id") != JNothing)
    assert((j \ "risk_features") != JNull)
    assert((j \ "data_freshness_minutes") != JNull)
  }

  test("absent user misses through the wire (all-types hit rule)") {
    val r = get("/features/user/999999?feature_types=user")
    assert(r.statusCode() == 200)
    val j = parse(r.body())
    assert((j \ "cache_hit") == JBool(false))
    assert((j \ "user_features") == JNull)
    assert((j \ "data_freshness_minutes") == JNull)
  }

  test("validation: bad id and unknown feature type are 400s, bad route 404") {
    assert(get("/features/user/not-a-number").statusCode() == 400)
    assert(get("/features/user/5?feature_types=bogus").statusCode() == 400)
    assert(get("/features/user/5/extra").statusCode() == 404)
    // JDK context prefix-matching must not leak wrong handlers onto
    // near-miss routes (healthz → health, username → user/{id})
    assert(get("/features/healthz").statusCode() == 404)
    assert(get("/features/username").statusCode() == 404)
    assert(get("/features/user").statusCode() == 404)
  }

  test("POST /features/batch: envelope stats + order preserved + cap enforced") {
    val body =
      """{"requests":[
        |{"user_id":"4","feature_types":["user","transaction"]},
        |{"user_id":999999,"feature_types":["user","transaction"]},
        |{"user_id":"9"}]}""".stripMargin
    val r = post("/features/batch", body)
    assert(r.statusCode() == 200)
    val j = parse(r.body())
    assert((j \ "total_requests") == JInt(3))
    assert((j \ "failed_requests") == JInt(0))
    val JArray(resp) = (j \ "responses"): @unchecked
    assert(resp.map(x => (x \ "user_id").values) == List(4L, 999999L, 9L),
      "responses must come back in request order")
    assert((resp(1) \ "cache_hit") == JBool(false))
    val ratio = (j \ "cache_hit_ratio").values.asInstanceOf[Double]
    assert(ratio >= 0.0 && ratio <= 1.0)

    val over = (1 to 101).map(i => s"""{"user_id":$i}""").mkString(
      """{"requests":[""", ",", "]}")
    assert(post("/features/batch", over).statusCode() == 400)
    assert(post("/features/batch", """{"requests":[]}""").statusCode() == 400)
    assert(post("/features/batch", "not json").statusCode() == 400)
  }

  test("GET /features/stats exposes group counts; DELETE invalidates") {
    val r = get("/features/stats")
    assert(r.statusCode() == 200)
    val j = parse(r.body())
    service.featureGroups.foreach { g =>
      assert((j \ "database" \ g).values.asInstanceOf[BigInt] > 0, s"count for $g")
    }
    val d = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port/features/user/5"))
        .DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(d.statusCode() == 200)
    // post-invalidation reads still serve (tables rebuilt on demand)
    assert(get("/features/user/5?feature_types=user").statusCode() == 200)
  }

  test("row tier: warm point reads cost zero Spark jobs; DELETE evicts ONE user's keys") {
    val all = "?feature_types=user&feature_types=transaction&feature_types=risk"
    // warm users 4 and 9 through the wire (first touch probes)
    assert(get(s"/features/user/4$all").statusCode() == 200)
    assert(get(s"/features/user/9$all").statusCode() == 200)
    // warm reads are pure row-tier lookups — no SQL execution at all
    assert(sqlExecutionsDuring {
      assert(get(s"/features/user/4$all").statusCode() == 200)
      assert(get(s"/features/user/9$all").statusCode() == 200)
    } == 0, "warm point reads must not launch Spark work")
    // DELETE user 4: user 9's next read still costs nothing (the r7 shape
    // invalidated every group table for everyone — cache.py:167-196 evicts
    // per-user keys, which is what invalidateUser now does)
    val d = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port/features/user/4"))
        .DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(d.statusCode() == 200)
    assert(sqlExecutionsDuring {
      assert(get(s"/features/user/9$all").statusCode() == 200)
    } == 0, "an unrelated user's read after DELETE must stay a row-tier hit")
    // the deleted user re-probes: exactly one fused execution
    assert(sqlExecutionsDuring {
      assert(get(s"/features/user/4$all").statusCode() == 200)
    } == 1, "the deleted user's next read must re-probe once")
  }

  test("dispatch pool: health answers while another request is blocked in the service") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    // a service whose batch path parks on a latch — deterministic slowness,
    // no timing dependence: under single-threaded dispatch (the r7
    // setExecutor(null)) the health request could not even START until the
    // blocked request finished
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slowService = new FeatureStoreService(spark, sf0001) {
      override def getBatch(userIds: Seq[Long], types: Seq[String],
                            now: java.time.Instant): Seq[FeatureResult] = {
        entered.countDown()
        assert(release.await(30, TimeUnit.SECONDS))
        super.getBatch(userIds, types, now)
      }
    }
    val slowApi = new FeatureApi(slowService)
    val slowPort = slowApi.start(0)
    try {
      val slowClient = HttpClient.newHttpClient()
      val slowDone = new CountDownLatch(1)
      var slowStatus = 0
      new Thread(() => {
        val r = slowClient.send(
          HttpRequest.newBuilder(
            URI.create(s"http://localhost:$slowPort/features/user/4")).GET.build(),
          HttpResponse.BodyHandlers.ofString())
        slowStatus = r.statusCode()
        slowDone.countDown()
      }).start()
      assert(entered.await(30, TimeUnit.SECONDS), "the slow request never reached the service")
      // the slow request is provably parked inside its handler right now
      val h = slowClient.send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:$slowPort/features/health")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
      assert(h.statusCode() == 200, "health must answer while a request is in flight")
      assert(slowDone.getCount == 1, "the slow request must still be parked")
      release.countDown()
      assert(slowDone.await(30, TimeUnit.SECONDS))
      assert(slowStatus == 200)
    } finally {
      release.countDown()
      slowApi.stop()
    }
  }
}
