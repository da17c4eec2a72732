package graft

import org.sparkproject.connect.grpc.{ManagedChannelBuilder, StatusRuntimeException}
import org.sparkproject.connect.grpc.Status
import org.sparkproject.connect.grpc.stub.ClientCalls
import org.sparkproject.connect.protobuf.CodedInputStream

import graft.serving.{FeatureGrpc, FeatureStoreService}
import graft.serving.FeatureProto._

/** Wire-level gRPC parity with src/proto/feature_store.proto: the service
  * runs on the shaded Netty server and the tests call it through the
  * shaded client stubs with the SAME hand-written codecs — so a mismatch
  * between codec and wire format fails loudly on the real transport, not
  * in a loopback of the codec against itself. */
class GrpcSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val service = new FeatureStoreService(spark, sf0001)
  private lazy val grpc = new FeatureGrpc(service)
  private lazy val port = grpc.start(0)
  private var live = false // only tear down what a test actually started
  private lazy val channel = {
    live = true
    ManagedChannelBuilder.forAddress("localhost", port).usePlaintext().build()
  }

  override def afterAll(): Unit = {
    // the sbt test JVM is shared across invocations — leaking the bound
    // port, channel, and Netty event-loop threads would accumulate per run
    if (live) {
      channel.shutdownNow()
      grpc.stop()
    }
    super.afterAll()
  }

  private def call[Req, Resp](m: org.sparkproject.connect.grpc.MethodDescriptor[Req, Resp],
                              req: Req): Resp =
    ClientCalls.blockingUnaryCall(channel, m, org.sparkproject.connect.grpc.CallOptions.DEFAULT, req)

  test("proto3 wire bytes match the spec for a known message (hand-check)") {
    // HealthCheckRequest{service:"x"} = tag(1,len-delim)=0x0A, len=1, 'x'
    assert(encode(PHealthCheckRequest("x")).toSeq == Seq[Byte](0x0A, 0x01, 0x78))
    // UserFeatures{age:150} = tag(1,varint)=0x08, varint 150 = 0x96 0x01
    assert(encode(PUserFeatures(age = 150)).toSeq ==
      Seq[Byte](0x08, 0x96.toByte, 0x01))
    // default-valued message encodes to ZERO bytes (proto3 omission rule)
    assert(encode(PUserFeatures()).isEmpty)
  }

  test("codecs round-trip every message incl. nesting, repetition, defaults") {
    val uf = PUserFeatures(34, "DE", "Berlin", 7, 123.45f, 400, "credit_card", true)
    assert(decodeUserFeatures(CodedInputStream.newInstance(encode(uf))) == uf)
    val req = PUserFeatureRequest("42", Seq("user", "risk"), includeMetadata = true)
    assert(decodeUserFeatureRequest(CodedInputStream.newInstance(encode(req))) == req)
    val resp = PUserFeatureResponse("42", Some(uf), None, Some(PUserFeatures()),
      responseTime = 12L, cacheHit = true, freshnessMs = 9000000L, timestamp = 1700000000L)
    assert(decodeUserFeatureResponse(CodedInputStream.newInstance(encode(resp))) == resp)
    val batch = PBatchFeatureRequest(Seq(req, PUserFeatureRequest("7")))
    assert(decodeBatchFeatureRequest(CodedInputStream.newInstance(encode(batch))) == batch)
    val benv = PBatchFeatureResponse(2, 2, 0, 34L, 0.5f, Seq(resp))
    assert(decodeBatchFeatureResponse(CodedInputStream.newInstance(encode(benv))) == benv)
  }

  test("HealthCheck over the wire reports healthy") {
    val r = call(grpc.healthCheckMethod, PHealthCheckRequest("feature_store"))
    assert(r.status == "healthy" && r.version == "1.0.0" && r.timestamp > 0)
  }

  test("GetUserFeatures: present user hits with slots per group; absent user misses") {
    import spark.implicits._
    val building = core.Roles.users(spark, sf0001)
      .filter($"recently_updated").select("user_id").as[Long].head()
    val r = call(grpc.getUserFeaturesMethod,
      PUserFeatureRequest(building.toString, Seq("user", "risk")))
    assert(r.uid == building.toString)
    assert(r.demographics.nonEmpty && r.behavior.nonEmpty,
      "user group must fill demographics + behavior slots")
    assert(r.behavior.get.totalOrders > 0)
    assert(r.risk.nonEmpty, "risk group presence rides the slot")
    assert(r.cacheHit && r.freshnessMs > 0)

    val miss = call(grpc.getUserFeaturesMethod, PUserFeatureRequest("999999"))
    assert(miss.demographics.isEmpty && miss.behavior.isEmpty && miss.risk.isEmpty)
    assert(!miss.cacheHit && miss.freshnessMs == 0L)
  }

  test("validation maps to INVALID_ARGUMENT: bad id, unknown type, batch bounds") {
    def statusOf(f: => Any): Status.Code =
      intercept[StatusRuntimeException](f).getStatus.getCode
    assert(statusOf(call(grpc.getUserFeaturesMethod,
      PUserFeatureRequest("not-a-number"))) == Status.Code.INVALID_ARGUMENT)
    assert(statusOf(call(grpc.getUserFeaturesMethod,
      PUserFeatureRequest("5", Seq("bogus")))) == Status.Code.INVALID_ARGUMENT)
    assert(statusOf(call(grpc.getBatchFeaturesMethod,
      PBatchFeatureRequest())) == Status.Code.INVALID_ARGUMENT)
    assert(statusOf(call(grpc.getBatchFeaturesMethod,
      PBatchFeatureRequest((1 to 101).map(i => PUserFeatureRequest(i.toString)))))
      == Status.Code.INVALID_ARGUMENT)
  }

  test("GetBatchFeatures: request order preserved, envelope stats coherent") {
    val r = call(grpc.getBatchFeaturesMethod, PBatchFeatureRequest(Seq(
      PUserFeatureRequest("4", Seq("user")),
      PUserFeatureRequest("999999", Seq("user")),
      PUserFeatureRequest("9", Seq("user")))))
    assert(r.totalRequests == 3 && r.successfulRequests == 3 && r.failedRequests == 0)
    assert(r.responses.map(_.uid) == Seq("4", "999999", "9"),
      "responses must come back in request order")
    assert(!r.responses(1).cacheHit)
    assert(r.cacheHitRatio >= 0f && r.cacheHitRatio <= 1f)
  }
}
