package graft.multimodal

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample are per-row (or per-partition-batched) transforms
  * over the binary payload.
  *
  * Image decode is REAL — `javax.imageio` (PNG/JPEG/GIF/BMP readers ship
  * with the JDK, fully headless). Audio decode is REAL for WAV/PCM —
  * `javax.sound.sampled` parses RIFF containers with no audio device
  * (only playback needs one). Undecodable payloads produce null decode
  * columns rather than failing the task, so mixed/corrupt corpora
  * survive a full scan — the posture a 100 TB crawl requires. Compressed
  * audio/video codecs are not on this JVM; those payloads keep the
  * byte-level feature path (`byteHistogramFeatures`) and the stride
  * frame sampler (`sampleFrames`), content fingerprints, not decodes.
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

  /** Deterministic synthetic PNG fixture: a solid-color image whose
    * dimensions and channel values are closed-form in `id` — so a SQL oracle
    * can predict what decoding it must yield (the JDK PNG writer emits no
    * timestamp chunks; output bytes are stable). Used by q50 and specs;
    * the harness ships no binary fixtures. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 4 + (id % 13).toInt
    val h = 3 + (id % 7).toInt
    val rgb = (((id * 37) % 256).toInt << 16) | (((id * 59) % 256).toInt << 8) | ((id * 83) % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bytes = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bytes)
    bytes.toByteArray
  }

  /** Deterministic synthetic GRADIENT PNG fixture: 8-bit grayscale with
    * pixel(x, y) = (x*ax + y*by + c) mod 256 where ax/by/c and the
    * dimensions are closed-form in `id` — unlike [[syntheticPng]]'s solid
    * fill, every pixel differs, so tile-level sums pin the decoder's full
    * raster readback, not just a constant. PNG grayscale is lossless; the
    * JDK writer emits no timestamp chunks, so the round trip is exact. */
  def syntheticGradientPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 6 + (id % 5).toInt
    val ax = 1 + (id % 5).toInt
    val by = 1 + (id % 3).toInt
    val c = (id % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, (x * ax + y * by + c) % 256); x += 1 }
      y += 1
    }
    val bytes = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bytes)
    bytes.toByteArray
  }

  /** Per-tile integer pixel sums of band 0: decode, cut the raster into
    * `tileW` x `tileH` tiles (edge tiles ragged), and emit one row per tile
    * with its pixel count and EXACT integer luminance sum — the thumbnail-
    * grid feature a vision-data pipeline computes per image. Narrow per-row
    * map + posexplode; rows with undecodable payloads emit nothing. */
  def tileStats(media: DataFrame, tileW: Int, tileH: Int): DataFrame = {
    require(tileW >= 1 && tileH >= 1)
    val f = udf { (payload: Array[Byte]) =>
      val in =
        if (payload == null || payload.isEmpty) None
        else try Option(ImageIO.read(new ByteArrayInputStream(payload)))
        catch { case _: Exception => None }
      in.map { bi =>
        val raster = bi.getRaster
        val (w, h) = (bi.getWidth, bi.getHeight)
        val tx = (w + tileW - 1) / tileW
        val ty = (h + tileH - 1) / tileH
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
        var j = 0
        while (j < ty) {
          var i = 0
          while (i < tx) {
            var sum = 0L
            var n = 0L
            var y = j * tileH
            while (y < math.min((j + 1) * tileH, h)) {
              var x = i * tileW
              while (x < math.min((i + 1) * tileW, w)) {
                sum += raster.getSample(x, y, 0)
                n += 1
                x += 1
              }
              y += 1
            }
            out += ((i, j, n, sum))
            i += 1
          }
          j += 1
        }
        out.toSeq
      }.getOrElse(Seq.empty)
    }
    media
      .select(col("media_id"), explode(f(col("payload"))).as("t"))
      .select(col("media_id"), col("t._1").as("tile_x"), col("t._2").as("tile_y"),
        col("t._3").as("n_px"), col("t._4").as("sum_lum"))
  }

  /** One decoded image: dimensions plus per-channel mean/std (population),
    * channels in raster band order (e.g. R,G,B[,A]). */
  final case class DecodedImage(width: Int, height: Int, bands: Int,
                                channelMean: Array[Double], channelStd: Array[Double])

  /** Decode an image payload with javax.imageio; None when no registered
    * reader accepts the bytes (text, corrupt, or non-image payloads). */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None } // corrupt container past the magic
    img.map { bi =>
      val raster = bi.getRaster
      val (w, h, nb) = (bi.getWidth, bi.getHeight, raster.getNumBands)
      val sum = new Array[Double](nb)
      val sum2 = new Array[Double](nb)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < nb) {
            val v = raster.getSampleDouble(x, y, b)
            sum(b) += v
            sum2(b) += v * v
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val mean = sum.map(_ / n)
      val std = Array.tabulate(nb)(b => math.sqrt(math.max(sum2(b) / n - mean(b) * mean(b), 0.0)))
      DecodedImage(w, h, nb, mean, std)
    }
  }

  /** Real per-image decode stats: width/height/band-count and per-channel
    * mean/std columns; all null for payloads no image reader accepts.
    * Narrow per-row map — payload pruned after the decode. */
  def imageStats(media: DataFrame): DataFrame = {
    val f = udf { (payload: Array[Byte]) => decodeImage(payload) }
    media.withColumn("img", f(col("payload")))
      .select(col("media_id"), col("kind"), col("meta"),
        col("img.width").as("width"), col("img.height").as("height"),
        col("img.bands").as("bands"),
        col("img.channelMean").as("channel_mean"),
        col("img.channelStd").as("channel_std"))
  }

  /** Decode + bilinear-resize + re-encode PNG; null where decode fails.
    * The scaled draw runs on a headless Graphics2D — no display needed. */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame = {
    val f = udf { (payload: Array[Byte]) =>
      val in =
        if (payload == null || payload.isEmpty) None
        else try Option(ImageIO.read(new ByteArrayInputStream(payload)))
        catch { case _: Exception => None }
      in.map { bi =>
        val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(bi, 0, 0, width, height, null)
        } finally g.dispose()
        val bytes = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bytes)
        bytes.toByteArray
      }.orNull
    }
    media.withColumn("payload", f(col("payload")))
  }

  /** Byte-histogram cosine moments of an opaque payload — the non-decoding
    * content fingerprint used for kinds with no JVM codec (audio/video) and
    * as a decode-free similarity feature: feature[i] = histogram moment i,
    * stable across partitionings and runs. */
  private[multimodal] def byteHistogramFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
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
    val f = udf((payload: Array[Byte]) => byteHistogramFeatures(payload, dim))
    media.withColumn("features", f(col("payload")))
      .select("media_id", "kind", "meta", "features")
  }

  /** Deterministic synthetic WAV fixture (RIFF/WAVE, PCM16 mono little-
    * endian): sample count, rate, and every sample value are closed-form in
    * `id`, so a SQL oracle can predict what decoding must yield —
    *   n    = 1024 + id % 257
    *   rate = 8000 + (id % 3) * 4000
    *   s(t) = ((id * 40503 + t * 2654435761) mod 65536) - 32768
    * (all exact in 64-bit integers at any plausible id). The container is
    * hand-rolled here; the PRODUCT path decodes it with the JDK's real
    * `javax.sound.sampled` reader, so the round trip proves the decoder,
    * not this writer. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (1024 + id % 257).toInt
    val rate = (8000 + (id % 3) * 4000).toInt
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def putLE(off: Int, v: Int, nBytes: Int): Unit = {
      var i = 0
      while (i < nBytes) { out(off + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
    }
    def putTag(off: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, 4)
    putTag(0, "RIFF"); putLE(4, 36 + dataLen, 4); putTag(8, "WAVE")
    putTag(12, "fmt "); putLE(16, 16, 4)
    putLE(20, 1, 2)            // PCM
    putLE(22, 1, 2)            // mono
    putLE(24, rate, 4)
    putLE(28, rate * 2, 4)     // byte rate
    putLE(32, 2, 2)            // block align
    putLE(34, 16, 2)           // bits per sample
    putTag(36, "data"); putLE(40, dataLen, 4)
    var t = 0
    while (t < n) {
      val v = ((id * 40503L + t * 2654435761L) % 65536L).toInt - 32768
      putLE(44 + 2 * t, v & 0xFFFF, 2)
      t += 1
    }
    out
  }

  /** One decoded PCM16 clip: rate, channel count, and the channel-
    * interleaved 16-bit samples. */
  final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Int])

  /** Decode an audio payload with the JDK's javax.sound.sampled reader;
    * None when no installed reader accepts the bytes or the stream is not
    * 16-bit signed PCM (the only encoding this JVM ships a parser for). */
  def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            samples(i) =
              if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF)
              else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)
            i += 1
          }
          Some(DecodedAudio(fmt.getSampleRate.toInt, fmt.getChannels, samples))
        }
      } finally in.close()
    } catch { case _: Exception => None } // unsupported container / truncated
  }

  /** Real per-clip decode stats, all integer-exact so a SQL oracle can
    * hash-match them bit-for-bit (no float summation-order hazard):
    * frame count, peak = max |s|, energy = sum of s^2 (fits a long:
    * n * 32768^2), and strict sign-change zero crossings
    * (s(t-1) * s(t) < 0), counted PER CHANNEL over the interleaved stream
    * (stride = channels) and summed — a flip between the last sample of one
    * channel and the first of the next is not a crossing. Identical to the
    * flat count for mono. Narrow per-row map; payload pruned after decode;
    * all null where no reader accepts the payload. */
  def audioStats(media: DataFrame): DataFrame = {
    val f = udf { (payload: Array[Byte]) =>
      decodeAudio(payload).map { a =>
        var peak = 0
        var sumSq = 0L
        var zc = 0L
        val nCh = math.max(a.channels, 1)
        var i = 0
        while (i < a.samples.length) {
          val v = a.samples(i)
          if (math.abs(v) > peak) peak = math.abs(v)
          sumSq += v.toLong * v
          if (i >= nCh && a.samples(i - nCh).toLong * v < 0) zc += 1
          i += 1
        }
        (a.sampleRate, a.channels, a.samples.length.toLong / a.channels, peak, sumSq, zc)
      }
    }
    media.withColumn("au", f(col("payload")))
      .select(col("media_id"), col("kind"), col("meta"),
        col("au._1").as("sample_rate"), col("au._2").as("channels"),
        col("au._3").as("n_samples"), col("au._4").as("peak"),
        col("au._5").as("sum_sq"), col("au._6").as("zero_crossings"))
  }

  /** Frame sampling for video-kind payloads: deterministic stride slicing of
    * the payload into `nFrames` pseudo-frames (no video codec on this JVM;
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
