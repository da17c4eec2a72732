package graft

import org.apache.spark.sql.streaming.Trigger

/** S7/S8 integration gate: the Kafka source/sink wiring
  * (streaming/EventPipeline.kafkaSource/kafkaSink) resolves the connector
  * by format name at runtime, so whether it EXECUTES depends on the
  * environment, not the code. This spec makes the gate explicit:
  *
  *   - connector jar absent (this sandbox)      → canceled, with the reason
  *   - jar present but no broker configured     → canceled, with the reason
  *   - jar + `GRAFT_KAFKA_BOOTSTRAP` broker set → full produce→consume
  *     round-trip through parse()
  *
  * The day spark-sql-kafka lands on the classpath and a broker address is
  * exported, S7/S8 stop being environment-partial with zero code changes.
  */
class KafkaGateSpec extends SparkSpec {
  import spark.implicits._

  private val connectorClass = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  private def connectorPresent: Boolean =
    try { Class.forName(connectorClass); true }
    catch { case _: ClassNotFoundException => false }

  test("kafka round-trip: produce via batch sink, consume via kafkaSource, parse") {
    assume(connectorPresent,
      s"$connectorClass not on classpath — to enable the wire test add " +
        "spark-sql-kafka-0-10_2.13-4.1.2.jar (plus its kafka-clients and " +
        "commons-pool2 deps) to /opt/spark/jars (no egress in this sandbox, " +
        "so it cannot be vendored here)")
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "GRAFT_KAFKA_BOOTSTRAP not set — no broker to integrate against")

    val topic = s"graft-it-${java.util.UUID.randomUUID()}"
    Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00Z","user_id":5,"event_type":"purchase","value":42.0,"props":"{}"}""",
      """not-json-at-all""")
      .toDF("value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap.get)
      .option("topic", topic)
      .save()

    val q = streaming.EventPipeline.parse(
        streaming.EventPipeline.kafkaSource(spark, bootstrap.get, topic,
          startingOffsets = "earliest"))
      .writeStream.format("memory").queryName("kafka_rt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val rows = spark.table("kafka_rt").collect()
    assert(rows.length == 2, "both produced records must arrive")
    val valid = rows.filter(_.getAs[Boolean]("valid"))
    assert(valid.length == 1 && valid(0).getAs[Long]("event_id") == 1L)
  }
}
