package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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

  /** RESIZE stage (image-resize analogue): nearest-neighbor resampling of a
    * feature/pixel vector to a fixed dimension, as a pure column expression
    * — out[i] = in[floor(i*n/dim)]. Partition-local, codegen-friendly; the
    * interpolation kernel is the only thing a real deployment would swap. */
  def resizeVector(v: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => element_at(v, ((i * size(v)) / dim).cast("int") + 1))

  /** FRAME-SAMPLE stage (video analogue): the payload is treated as a frame
    * container and every `stride`-th `frameBytes`-sized chunk becomes one
    * output row — the Spark shape of sampling frames before a decode stage.
    * Pure column ops (sequence → filter → explode → substring): the frame
    * index array is built per row WITHOUT materializing unsampled frames,
    * and no shuffle — sampling is embarrassingly parallel over media rows.
    * Each frame carries its checksum so downstream stages can dedupe or
    * verify without re-reading the payload. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("long")
    val sampled = when(nFrames > 0,
      filter(sequence(lit(0L), nFrames - 1), i => i % stride === 0)
    ).otherwise(array().cast("array<bigint>"))
    media.select(col("media_id"), col("payload"), explode(sampled).as("frame_no"))
      .select(col("media_id"), col("frame_no"),
        expr(s"substring(payload, cast(frame_no * $frameBytes + 1 as int), $frameBytes)")
          .as("frame"))
      .select(col("media_id"), col("frame_no"),
        length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
  }
}
