package graft.serving

import java.io.{ByteArrayInputStream, InputStream}
import java.time.Instant

import org.apache.spark.sql.Row
import org.sparkproject.connect.grpc.{MethodDescriptor, Server, ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.netty.NettyServerBuilder
import org.sparkproject.connect.grpc.stub.{ServerCalls, StreamObserver}
import org.sparkproject.connect.protobuf.CodedInputStream

import graft.serving.FeatureProto._

/** gRPC serving face — the reference's FeatureStore service
  * (src/proto/feature_store.proto:62-67, src/grpc_server.py) over the SAME
  * FeatureStoreService the REST surface uses, with ZERO new dependencies:
  * Spark's own distribution ships a full shaded gRPC runtime
  * (spark-connect: org.sparkproject.connect.grpc — the server Spark
  * Connect itself runs on) and a shaded protobuf runtime; the method
  * descriptors and message codecs are written by hand against the proto
  * (FeatureProto), so no protoc toolchain is required. This closes the
  * last serving-surface waiver (rounds 4-7: "gRPC needs a protobuf
  * toolchain this environment doesn't ship" — the runtime was on the
  * classpath all along, only CODEGEN was missing, and hand-rolled codecs
  * replace codegen for a 7-message contract).
  *
  * RPC semantics (mirroring the REST face's documented divergences):
  * user ids must parse as the engine's BIGINT key → INVALID_ARGUMENT
  * otherwise (grpc_service.py:46-49 returns INVALID_ARGUMENT for a
  * missing uid the same way); unknown feature types → INVALID_ARGUMENT;
  * batch cap 100, all-or-nothing. The proto's one `UserFeatures` shape
  * serves all three response slots (its fields are user-group columns;
  * the reference's own servicer drifted to per-group messages that do
  * not exist in the proto — SURVEY §1.3, the proto is the wire
  * contract): `demographics` carries the identity fields and `behavior`
  * the behavioral fields of the "user" group when requested+found, and
  * `risk` is set (field-empty) iff the "risk" group was requested and
  * found — slot PRESENCE is the group-found signal, exactly proto3's
  * message-presence semantics. freshness_ms converts the service's
  * oldest-group minutes; response_time is wall ms.
  *
  * Batch requests fuse like the REST path: ONE service probe per
  * distinct requested type-set, never one per request. */
class FeatureGrpc(service: FeatureStoreService) {

  private var server: Option[Server] = None

  /** Start on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = synchronized {
    require(server.isEmpty, "already started")
    val s = NettyServerBuilder.forPort(port)
      .addService(serviceDefinition)
      .build()
      .start()
    server = Some(s)
    s.getPort
  }

  def stop(): Unit = synchronized {
    server.foreach(_.shutdownNow())
    server = None
  }

  // ---- wire plumbing ------------------------------------------------------

  private def marshaller[A](enc: A => Array[Byte],
                            dec: CodedInputStream => A): MethodDescriptor.Marshaller[A] =
    new MethodDescriptor.Marshaller[A] {
      override def stream(value: A): InputStream = new ByteArrayInputStream(enc(value))
      override def parse(stream: InputStream): A =
        dec(CodedInputStream.newInstance(stream))
    }

  private def unary[Req, Resp](name: String,
                               reqM: MethodDescriptor.Marshaller[Req],
                               respM: MethodDescriptor.Marshaller[Resp]) =
    MethodDescriptor.newBuilder(reqM, respM)
      .setType(MethodDescriptor.MethodType.UNARY)
      .setFullMethodName(
        MethodDescriptor.generateFullMethodName("feature_store.FeatureStore", name))
      .build()

  /** Method descriptors are PUBLIC: a stub-less client (like GrpcSpec or
    * any JVM caller) needs them to place calls — they ARE the generated-
    * stub surface protoc would have emitted. */
  val getUserFeaturesMethod =
    unary("GetUserFeatures",
      marshaller(encode(_: PUserFeatureRequest), decodeUserFeatureRequest),
      marshaller(encode(_: PUserFeatureResponse), decodeUserFeatureResponse))
  val getBatchFeaturesMethod =
    unary("GetBatchFeatures",
      marshaller(encode(_: PBatchFeatureRequest), decodeBatchFeatureRequest),
      marshaller(encode(_: PBatchFeatureResponse), decodeBatchFeatureResponse))
  val healthCheckMethod =
    unary("HealthCheck",
      marshaller(encode(_: PHealthCheckRequest), decodeHealthCheckRequest),
      marshaller(encode(_: PHealthCheckResponse), decodeHealthCheckResponse))

  private def handler[Req, Resp](f: Req => Resp) =
    ServerCalls.asyncUnaryCall(new ServerCalls.UnaryMethod[Req, Resp] {
      override def invoke(req: Req, obs: StreamObserver[Resp]): Unit =
        try {
          obs.onNext(f(req))
          obs.onCompleted()
        } catch {
          case e: IllegalArgumentException =>
            obs.onError(Status.INVALID_ARGUMENT
              .withDescription(e.getMessage).asRuntimeException())
          case e: Throwable =>
            obs.onError(Status.INTERNAL
              .withDescription(e.getMessage).asRuntimeException())
        }
    })

  private def serviceDefinition: ServerServiceDefinition =
    ServerServiceDefinition.builder("feature_store.FeatureStore")
      .addMethod(getUserFeaturesMethod, handler(getUserFeatures))
      .addMethod(getBatchFeaturesMethod, handler(getBatchFeatures))
      .addMethod(healthCheckMethod, handler(healthCheck))
      .build()

  // ---- RPC implementations ------------------------------------------------

  private def parsedId(raw: String): Long =
    raw.toLongOption.getOrElse(
      throw new IllegalArgumentException("user_id must be a numeric id"))

  private def typesOf(req: PUserFeatureRequest): Seq[String] =
    service.normalizeTypes(if (req.featureTypes.isEmpty) Seq("user") else req.featureTypes)

  private[serving] def getUserFeatures(req: PUserFeatureRequest): PUserFeatureResponse = {
    val t0 = System.nanoTime()
    val r = service.getFeatures(parsedId(req.userId), typesOf(req), Instant.now())
    toResponse(req.userId, r, (System.nanoTime() - t0) / 1000000L)
  }

  private[serving] def getBatchFeatures(req: PBatchFeatureRequest): PBatchFeatureResponse = {
    require(req.requests.nonEmpty && req.requests.size <= 100,
      "requests must contain between 1 and 100 items")
    val t0 = System.nanoTime()
    val parsed = req.requests.map(r => (parsedId(r.userId), typesOf(r), r.userId))
    // one fused probe per DISTINCT type-set (usually one) — REST parity
    val byTypes = parsed.zipWithIndex.groupBy(_._1._2)
    val results = byTypes.toSeq.flatMap { case (types, members) =>
      val rs = service.getBatch(members.map(_._1._1), types, Instant.now())
      members.map(_._2).zip(members.map(_._1._3).zip(rs))
    }.sortBy(_._1).map(_._2)
    val ms = (System.nanoTime() - t0) / 1000000L
    val (hits, total, ratio) = service.batchSummary(results.map(_._2))
    PBatchFeatureResponse(
      totalRequests = total, successfulRequests = total, failedRequests = 0,
      totalResponseTimeMs = ms, cacheHitRatio = ratio.toFloat,
      responses = results.map { case (raw, r) => toResponse(raw, r, ms / total) })
  }

  private[serving] def healthCheck(req: PHealthCheckRequest): PHealthCheckResponse = {
    val ok = service.alive && scala.util.Try(service.groupCounts.values.sum >= 0).isSuccess
    PHealthCheckResponse(
      status = if (ok) "healthy" else "unhealthy",
      timestamp = System.currentTimeMillis() / 1000L,
      version = "1.0.0")
  }

  // ---- row mapping --------------------------------------------------------

  private def get[A](row: Row, name: String): Option[A] =
    if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
      Some(row.getAs[A](name))
    else None

  private def intOf(row: Row, name: String): Int =
    get[Any](row, name).map {
      case x: Int => x; case x: Long => x.toInt; case x: Short => x.toInt
      case x => x.toString.toDouble.toInt
    }.getOrElse(0)

  private def floatOf(row: Row, name: String): Float =
    get[Any](row, name).map {
      case x: java.math.BigDecimal => x.floatValue()
      case x: Double => x.toFloat; case x: Float => x
      case x: Long => x.toFloat; case x: Int => x.toFloat
      case x => x.toString.toFloat
    }.getOrElse(0f)

  private def strOf(row: Row, name: String): String =
    get[Any](row, name).map(_.toString).getOrElse("")

  private def boolOf(row: Row, name: String): Boolean =
    get[Any](row, name) match { case Some(b: Boolean) => b; case _ => false }

  /** The user group row split across the proto's two user-shaped slots:
    * identity fields → demographics, behavioral fields → behavior. */
  private def demographicsOf(row: Row): PUserFeatures = PUserFeatures(
    age = intOf(row, "age"),
    locationCountry = strOf(row, "location_country"),
    locationCity = strOf(row, "location_city"))

  private def behaviorOf(row: Row): PUserFeatures = PUserFeatures(
    totalOrders = intOf(row, "total_orders"),
    avgOrderValue = floatOf(row, "avg_order_value"),
    daysSinceFirstOrder = intOf(row, "days_since_first_order"),
    preferredPaymentMethod = strOf(row, "preferred_payment_method"),
    accountVerified = boolOf(row, "account_verified"))

  private def toResponse(rawId: String, r: service.FeatureResult,
                         ms: Long): PUserFeatureResponse =
    PUserFeatureResponse(
      uid = rawId,
      demographics = r.features.get("user").map(demographicsOf),
      behavior = r.features.get("user").map(behaviorOf),
      // slot presence = group found; the proto's user-shaped message has
      // no risk-named fields to carry (see class scaladoc)
      risk = r.features.get("risk").map(_ => PUserFeatures()),
      responseTime = ms,
      cacheHit = r.cacheHit,
      freshnessMs = r.freshnessMinutes.map(_ * 60000L).getOrElse(0L),
      timestamp = System.currentTimeMillis() / 1000L)
}
