package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus the decode/feature-extract stage shape.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * STUB — a deterministic fake that derives "features" from the payload
  * bytes. Everything around it is the real Spark shape a production pipeline
  * needs: binary column + metadata struct schema, partition-preserving
  * mapPartitions with a batched iterator (the Scala analogue of
  * mapInPandas' batch contract), and an explicit output schema.
  *
  * Scale: decode is embarrassingly parallel and partition-local — no
  * shuffle. Batch size is governed by parquet row-group sizing upstream;
  * memory per task = batch × payload size, the knob that matters at 100 TB.
  */
object Multimodal {

  /** Wrap the documents corpus as a media table: payload = utf-8 bytes
    * (standing in for image/audio bytes), metadata = typed struct. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("n_chars").cast("long").as("content_length"),
        col("source").as("origin")).as("meta"))

  /** Payload accounting — the oracle-checkable part of the media table. */
  def mediaStats(docs: DataFrame): DataFrame =
    asMediaTable(docs).select(
      col("media_id"),
      length(col("payload")).as("payload_bytes"),
      col("meta.mime").as("mime"),
      col("meta.content_length").as("content_length"))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("feature_dim", IntegerType),
    StructField("feature_norm", DoubleType)))

  /** Decode + feature-extract stage. STUB KERNEL: a real deployment swaps
    * `fakeDecode` for a codec call (e.g. JNI/ONNX); the iterator/batching
    * contract and output schema are the production shape. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.grouped(64).flatMap { batch => // batched like mapInPandas
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val fake = fakeDecode(bytes)
          Row(id, fake.length, math.sqrt(fake.map(x => x * x).sum))
        }
      }
    }(enc)
  }

  /** STUB: deterministic fake "decoded features" from byte statistics.
    * Replace with a real codec; kept pure so tests are reproducible. */
  private def fakeDecode(bytes: Array[Byte]): Array[Double] =
    Array.tabulate(8)(i => bytes.drop(i).grouped(8).map(g => (g.head & 0xff).toDouble / 255.0).sum)
}
