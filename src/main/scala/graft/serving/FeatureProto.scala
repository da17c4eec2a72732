package graft.serving

import java.io.ByteArrayOutputStream

import org.sparkproject.connect.protobuf.{CodedInputStream, CodedOutputStream}

/** Hand-written proto3 wire codecs for the reference's gRPC contract
  * (src/proto/feature_store.proto:1-67) — the messages are small and flat,
  * so the wire format is written BY HAND against the shaded protobuf
  * runtime Spark itself ships (spark-connect bundles
  * org.sparkproject.connect.protobuf; no protoc, no new dependency).
  *
  * proto3 encoding rules observed: scalar fields are omitted at their
  * default value; strings/embedded messages are length-delimited
  * (wire type 2); int32/int64/bool are varints (wire type 0); float is
  * 32-bit (wire type 5); repeated strings/messages are unpacked, one
  * tagged record each; unknown fields are skipped on read (forward
  * compatibility, the same posture protoc-generated parsers take).
  *
  * Field numbers mirror the proto exactly; see each message's comment.
  * The proto's `UserFeatures` message is user-feature-shaped but is
  * reused for all three response slots (demographics/behavior/risk) —
  * the reference's own servicer drifted to different message names
  * (grpc_service.py:216-237 vs the proto — SURVEY §1.3); the PROTO is
  * the wire contract this implements.
  */
object FeatureProto {

  // ---- message model ------------------------------------------------------

  /** feature_store.UserFeatures (proto:13-22): age=1, location_country=2,
    * location_city=3, total_orders=4, avg_order_value=5 (float),
    * days_since_first_order=6, preferred_payment_method=7,
    * account_verified=8. */
  final case class PUserFeatures(
    age: Int = 0, locationCountry: String = "", locationCity: String = "",
    totalOrders: Int = 0, avgOrderValue: Float = 0f,
    daysSinceFirstOrder: Int = 0, preferredPaymentMethod: String = "",
    accountVerified: Boolean = false)

  /** feature_store.UserFeatureRequest (proto:6-10): user_id=1,
    * feature_types=2 (repeated), include_metadata=3. */
  final case class PUserFeatureRequest(
    userId: String = "", featureTypes: Seq[String] = Nil,
    includeMetadata: Boolean = false)

  /** feature_store.UserFeatureResponse (proto:25-34): uid=1,
    * demographics=2, behavior=3, risk=4, response_time=5, cache_hit=6,
    * freshness_ms=7, timestamp=8. */
  final case class PUserFeatureResponse(
    uid: String = "", demographics: Option[PUserFeatures] = None,
    behavior: Option[PUserFeatures] = None, risk: Option[PUserFeatures] = None,
    responseTime: Long = 0L, cacheHit: Boolean = false,
    freshnessMs: Long = 0L, timestamp: Long = 0L)

  /** feature_store.BatchFeatureRequest (proto:37-39): requests=1. */
  final case class PBatchFeatureRequest(requests: Seq[PUserFeatureRequest] = Nil)

  /** feature_store.BatchFeatureResponse (proto:42-49): total_requests=1,
    * successful_requests=2, failed_requests=3, total_response_time_ms=4,
    * cache_hit_ratio=5 (float), responses=6. */
  final case class PBatchFeatureResponse(
    totalRequests: Int = 0, successfulRequests: Int = 0, failedRequests: Int = 0,
    totalResponseTimeMs: Long = 0L, cacheHitRatio: Float = 0f,
    responses: Seq[PUserFeatureResponse] = Nil)

  /** feature_store.HealthCheckRequest (proto:52-54): service=1. */
  final case class PHealthCheckRequest(service: String = "")

  /** feature_store.HealthCheckResponse (proto:56-60): status=1,
    * timestamp=2, version=3. */
  final case class PHealthCheckResponse(
    status: String = "", timestamp: Long = 0L, version: String = "")

  // ---- encoding -----------------------------------------------------------

  private def bytes(write: CodedOutputStream => Unit): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = CodedOutputStream.newInstance(baos)
    write(out)
    out.flush()
    baos.toByteArray
  }

  def encode(m: PUserFeatures): Array[Byte] = bytes { out =>
    if (m.age != 0) out.writeInt32(1, m.age)
    if (m.locationCountry.nonEmpty) out.writeString(2, m.locationCountry)
    if (m.locationCity.nonEmpty) out.writeString(3, m.locationCity)
    if (m.totalOrders != 0) out.writeInt32(4, m.totalOrders)
    if (m.avgOrderValue != 0f) out.writeFloat(5, m.avgOrderValue)
    if (m.daysSinceFirstOrder != 0) out.writeInt32(6, m.daysSinceFirstOrder)
    if (m.preferredPaymentMethod.nonEmpty) out.writeString(7, m.preferredPaymentMethod)
    if (m.accountVerified) out.writeBool(8, m.accountVerified)
  }

  def encode(m: PUserFeatureRequest): Array[Byte] = bytes { out =>
    if (m.userId.nonEmpty) out.writeString(1, m.userId)
    m.featureTypes.foreach(out.writeString(2, _))
    if (m.includeMetadata) out.writeBool(3, m.includeMetadata)
  }

  def encode(m: PUserFeatureResponse): Array[Byte] = bytes { out =>
    if (m.uid.nonEmpty) out.writeString(1, m.uid)
    m.demographics.foreach(f => out.writeByteArray(2, encode(f)))
    m.behavior.foreach(f => out.writeByteArray(3, encode(f)))
    m.risk.foreach(f => out.writeByteArray(4, encode(f)))
    if (m.responseTime != 0L) out.writeInt64(5, m.responseTime)
    if (m.cacheHit) out.writeBool(6, m.cacheHit)
    if (m.freshnessMs != 0L) out.writeInt64(7, m.freshnessMs)
    if (m.timestamp != 0L) out.writeInt64(8, m.timestamp)
  }

  def encode(m: PBatchFeatureRequest): Array[Byte] = bytes { out =>
    m.requests.foreach(r => out.writeByteArray(1, encode(r)))
  }

  def encode(m: PBatchFeatureResponse): Array[Byte] = bytes { out =>
    if (m.totalRequests != 0) out.writeInt32(1, m.totalRequests)
    if (m.successfulRequests != 0) out.writeInt32(2, m.successfulRequests)
    if (m.failedRequests != 0) out.writeInt32(3, m.failedRequests)
    if (m.totalResponseTimeMs != 0L) out.writeInt64(4, m.totalResponseTimeMs)
    if (m.cacheHitRatio != 0f) out.writeFloat(5, m.cacheHitRatio)
    m.responses.foreach(r => out.writeByteArray(6, encode(r)))
  }

  def encode(m: PHealthCheckRequest): Array[Byte] = bytes { out =>
    if (m.service.nonEmpty) out.writeString(1, m.service)
  }

  def encode(m: PHealthCheckResponse): Array[Byte] = bytes { out =>
    if (m.status.nonEmpty) out.writeString(1, m.status)
    if (m.timestamp != 0L) out.writeInt64(2, m.timestamp)
    if (m.version.nonEmpty) out.writeString(3, m.version)
  }

  // ---- decoding -----------------------------------------------------------

  private def tag(field: Int, wire: Int): Int = (field << 3) | wire

  private def readLoop(in: CodedInputStream)(handle: PartialFunction[Int, Unit]): Unit = {
    var t = in.readTag()
    while (t != 0) {
      if (handle.isDefinedAt(t)) handle(t) else in.skipField(t)
      t = in.readTag()
    }
  }

  /** Decode an embedded message with proto's length-delimited framing. */
  private def embedded[A](in: CodedInputStream)(dec: CodedInputStream => A): A = {
    val len = in.readRawVarint32()
    val limit = in.pushLimit(len)
    val v = dec(in)
    in.popLimit(limit)
    v
  }

  def decodeUserFeatures(in: CodedInputStream): PUserFeatures = {
    var m = PUserFeatures()
    readLoop(in) {
      case t if t == tag(1, 0) => m = m.copy(age = in.readInt32())
      case t if t == tag(2, 2) => m = m.copy(locationCountry = in.readString())
      case t if t == tag(3, 2) => m = m.copy(locationCity = in.readString())
      case t if t == tag(4, 0) => m = m.copy(totalOrders = in.readInt32())
      case t if t == tag(5, 5) => m = m.copy(avgOrderValue = in.readFloat())
      case t if t == tag(6, 0) => m = m.copy(daysSinceFirstOrder = in.readInt32())
      case t if t == tag(7, 2) => m = m.copy(preferredPaymentMethod = in.readString())
      case t if t == tag(8, 0) => m = m.copy(accountVerified = in.readBool())
    }
    m
  }

  def decodeUserFeatureRequest(in: CodedInputStream): PUserFeatureRequest = {
    var m = PUserFeatureRequest()
    readLoop(in) {
      case t if t == tag(1, 2) => m = m.copy(userId = in.readString())
      case t if t == tag(2, 2) => m = m.copy(featureTypes = m.featureTypes :+ in.readString())
      case t if t == tag(3, 0) => m = m.copy(includeMetadata = in.readBool())
    }
    m
  }

  def decodeUserFeatureResponse(in: CodedInputStream): PUserFeatureResponse = {
    var m = PUserFeatureResponse()
    readLoop(in) {
      case t if t == tag(1, 2) => m = m.copy(uid = in.readString())
      case t if t == tag(2, 2) => m = m.copy(demographics = Some(embedded(in)(decodeUserFeatures)))
      case t if t == tag(3, 2) => m = m.copy(behavior = Some(embedded(in)(decodeUserFeatures)))
      case t if t == tag(4, 2) => m = m.copy(risk = Some(embedded(in)(decodeUserFeatures)))
      case t if t == tag(5, 0) => m = m.copy(responseTime = in.readInt64())
      case t if t == tag(6, 0) => m = m.copy(cacheHit = in.readBool())
      case t if t == tag(7, 0) => m = m.copy(freshnessMs = in.readInt64())
      case t if t == tag(8, 0) => m = m.copy(timestamp = in.readInt64())
    }
    m
  }

  def decodeBatchFeatureRequest(in: CodedInputStream): PBatchFeatureRequest = {
    var m = PBatchFeatureRequest()
    readLoop(in) {
      case t if t == tag(1, 2) =>
        m = m.copy(requests = m.requests :+ embedded(in)(decodeUserFeatureRequest))
    }
    m
  }

  def decodeBatchFeatureResponse(in: CodedInputStream): PBatchFeatureResponse = {
    var m = PBatchFeatureResponse()
    readLoop(in) {
      case t if t == tag(1, 0) => m = m.copy(totalRequests = in.readInt32())
      case t if t == tag(2, 0) => m = m.copy(successfulRequests = in.readInt32())
      case t if t == tag(3, 0) => m = m.copy(failedRequests = in.readInt32())
      case t if t == tag(4, 0) => m = m.copy(totalResponseTimeMs = in.readInt64())
      case t if t == tag(5, 5) => m = m.copy(cacheHitRatio = in.readFloat())
      case t if t == tag(6, 2) =>
        m = m.copy(responses = m.responses :+ embedded(in)(decodeUserFeatureResponse))
    }
    m
  }

  def decodeHealthCheckRequest(in: CodedInputStream): PHealthCheckRequest = {
    var m = PHealthCheckRequest()
    readLoop(in) {
      case t if t == tag(1, 2) => m = m.copy(service = in.readString())
    }
    m
  }

  def decodeHealthCheckResponse(in: CodedInputStream): PHealthCheckResponse = {
    var m = PHealthCheckResponse()
    readLoop(in) {
      case t if t == tag(1, 2) => m = m.copy(status = in.readString())
      case t if t == tag(2, 0) => m = m.copy(timestamp = in.readInt64())
      case t if t == tag(3, 2) => m = m.copy(version = in.readString())
    }
    m
  }
}
