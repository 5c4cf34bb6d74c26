package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal columns (SURVEY.md §2.11 X5): image/audio/video payloads
  * are opaque `BinaryType` columns with a typed metadata struct. The Spark
  * plumbing — schema, partition-sized batch processing, feature schema — is
  * real; the actual codec decode is STUBBED (this container has no
  * image/audio libraries) behind [[decodeStub]], which produces
  * deterministic fake features so the pipeline is testable end-to-end.
  *
  * Scale: decode runs via `mapPartitions` so each task amortizes
  * decoder/model setup over a whole partition (the same batching contract a
  * `mapInPandas` UDF gives a Python decoder); binary payloads never pass
  * through a shuffle — features are extracted first, payloads dropped.
  */
object Multimodal {

  /** Media row schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("format", StringType),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** STUB decoder — deterministic fake in place of a real codec. A real
    * deployment replaces this body with e.g. an image decode + embed; the
    * signature (bytes in, fixed-length feature out) is the contract. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Double] = {
    // ??? <- real codec goes here; deterministic byte-histogram fake below
    val f = new Array[Double](dim)
    if (payload != null) payload.foreach(b => f((b & 0xff) % dim) += 1.0)
    f
  }

  /** Per-partition feature extraction over a media frame. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        // one decoder instance per partition (amortized setup)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"),
            if (payload == null) 0L else payload.length.toLong,
            r.getAs[String]("format"),
            decodeStub(payload))
        }
      }(enc)
  }

  /** STUB resize — a real implementation decodes, resamples, re-encodes;
    * the deterministic fake strides/pads the payload to exactly w*h bytes,
    * preserving the contract (fixed output size, metadata updated). */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // ??? <- real image resample goes here
    val out = new Array[Byte](w * h)
    if (payload != null && payload.length > 0) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** Resize a media frame: per-partition processing, payload replaced,
    * typed metadata updated to the new dimensions. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select(col("media_id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = r.getStruct(2)
          val payload = r.getAs[Array[Byte]]("payload")
          // missing media stays missing: resizing null into a zero-filled
          // w*h buffer would make absent data indistinguishable from a
          // genuine black image downstream
          val resized = if (payload == null) null else resizeStub(payload, w, h)
          Row(r.getLong(0), resized,
            Row(if (meta == null) null else meta.getString(0), w, h))
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** STUB frame sampling — a real implementation seeks keyframes; the fake
    * treats the payload as fixed-size frames and emits every `everyN`-th.
    * One output row per sampled frame (video → frame table), the shape a
    * training pipeline feeds to per-frame featurization. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    // validate on the driver — a bad argument should fail here, not as an
    // opaque ArithmeticException inside a task
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          if (payload == null) Iterator.empty
          // fixed-size-frame contract: the trailing partial chunk is
          // dropped, never emitted as a short "frame" a per-frame
          // featurizer would mis-decode
          else payload.grouped(frameBytes).zipWithIndex
            .filter { case (frame, idx) =>
              idx % everyN == 0 && frame.length == frameBytes }
            .map { case (frame, idx) => Row(r.getLong(0), idx, frame) }
        }
      }(enc)
  }

  /** Build a media frame from the documents table (text bytes as a
    * stand-in payload — there is no binary fixture, TESTDATA.md). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height")).as("meta"))
}
