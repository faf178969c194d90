package graft.multimodal

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample are per-row (or per-partition-batched) transforms
  * over the binary payload.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `fakeDecodeFeatures` derives a deterministic feature vector
  * from the payload bytes so the Spark-side plumbing — schema, partitioning,
  * batch shape, column pruning around a large binary column — is real and
  * testable. A production build swaps `decodeStub` for a JNI/library call
  * with the identical signature.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("payload", BinaryType, nullable = true),   // opaque bytes
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("magic", StringType, nullable = true),   // first-8-bytes hex
      StructField("declared_w", IntegerType, nullable = true),
      StructField("declared_h", IntegerType, nullable = true))), nullable = true)))

  /** Wrap any table with a string column into a media table (payload = the
    * UTF-8 bytes) — the harness has no real binary fixtures, so this supplies
    * deterministic ones while keeping the schema honest. */
  def asMediaTable(df: DataFrame, idCol: String, payloadFrom: String,
                   kind: String = "image"): DataFrame = {
    val payload = col(payloadFrom).cast("binary")
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      payload.as("payload"),
      struct(
        length(payload).cast("long").as("byte_len"),
        hex(substring(payload, 1, 8)).as("magic"),
        lit(null).cast("int").as("declared_w"),
        lit(null).cast("int").as("declared_h")).as("meta"))
  }

  /** STUB decode: a real build would decode `payload` (JPEG/WAV/...) here.
    * Deterministic fake: feature[i] = normalized byte histogram moment i, so
    * outputs are stable across partitionings and runs. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(dim)(0.0f)
    val hist = new Array[Long](256)
    for (b <- payload) hist(b & 0xFF) += 1
    val n = payload.length.toDouble
    Array.tabulate(dim) { i =>
      var acc = 0.0
      var v = 0
      while (v < 256) {
        acc += hist(v) / n * math.cos((i + 1) * math.Pi * (v + 0.5) / 256)
        v += 1
      }
      acc.toFloat
    }
  }

  /** Per-partition batched feature extraction over the payload column —
    * the mapInPandas-equivalent batch shape: one iterator pass per
    * partition, payload column pruned away after use. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val f = udf((payload: Array[Byte]) => decodeStub(payload, dim))
    media.withColumn("features", f(col("payload")))
      .select("media_id", "kind", "meta", "features")
  }

  /** Frame sampling for video-kind payloads: deterministic stride slicing of
    * the payload into `nFrames` pseudo-frames (stub for real frame decode;
    * the partition/batch shape is what matters). */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val f = udf { (payload: Array[Byte]) =>
      if (payload == null || payload.isEmpty) Seq.empty[Array[Byte]]
      else {
        val stride = math.max(payload.length / nFrames, 1)
        (0 until math.min(nFrames, payload.length)).map { i =>
          payload.slice(i * stride, math.min(i * stride + stride, payload.length))
        }
      }
    }
    media.withColumn("frames", f(col("payload")))
  }
}
