package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.VelocityFeatures
import graft.streaming.VelocityFeatures.TxnEvent

/** State-backend parity: the RocksDB state store provider (ships in the
  * Spark distribution + rocksdbjni) is THE streaming lever at 100 TB —
  * the default HDFS-backed store keeps every key's state on the executor
  * HEAP, so total state is bounded by cluster memory, while RocksDB
  * spills to local disk and is bounded by local storage. A backend that
  * changed RESULTS would be unusable, so the pin is byte-parity of the
  * velocity operator's full output across providers, driven through the
  * same multi-batch + late-data shapes the HDFS-path tests use.
  *
  * Each run uses `spark.newSession()` — own SQLConf over the shared
  * context, so the provider choice never leaks into other suites (the
  * shared-session no-global-mutation rule). */
class RocksDbStateSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // batch 1 caps the watermark at 09:10 (max ts 10:10 − 1h), so the late
  // 09:30 arrival in batch 2 is ADMITTED (out-of-order but inside the
  // delay); batch 3 then advances time a day — both providers must walk
  // the identical admit/evict sequence
  private val batch1 = Seq(
    TxnEvent(1L, ts("2024-01-01 10:00:00"), 100.0, 1, success = true),
    TxnEvent(1L, ts("2024-01-01 10:03:00"), 50.0, 2, success = false),
    TxnEvent(2L, ts("2024-01-01 10:10:00"), 75.0, 3, success = true))
  private val batch2 = Seq(
    TxnEvent(1L, ts("2024-01-01 09:30:00"), 5.0, 2, success = false))
  private val batch3 = Seq(
    TxnEvent(1L, ts("2024-01-01 10:59:00"), 25.0, 1, success = true),
    TxnEvent(2L, ts("2024-01-02 11:00:00"), 10.0, 3, success = true))

  private def run(provider: Option[String]): Set[VelocityFeatures.VelocityRow] = {
    val s = spark.newSession()
    provider.foreach(p =>
      s.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    import s.implicits._
    val input = MemoryStream[TxnEvent](s)
    val name = s"vel_${provider.fold("hdfs")(_ => "rocks")}_${System.nanoTime()}"
    val q = VelocityFeatures.stream(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    Seq(batch1, batch2, batch3).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    s.table(name).as[VelocityFeatures.VelocityRow].collect().toSet
  }

  test("velocity windows are byte-identical under the RocksDB state store " +
      "(multi-batch, multi-user, late data)") {
    val rocks = run(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val hdfs = run(None)
    assert(rocks.size == batch1.size + batch2.size + batch3.size,
      s"row per admitted event expected: $rocks")
    assert(rocks == hdfs,
      "state backend must never change operator output")
  }
}
