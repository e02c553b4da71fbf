package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio as opaque `binary` columns with
  * typed metadata, batched decode + feature extraction via the typed
  * mapPartitions contract (the Scala analog of `mapInPandas`).
  *
  * Decoders are REAL pure-JVM implementations for container-free formats:
  * RIFF/WAVE PCM audio (8/16-bit, any channel count) and binary PPM (P6)
  * images, plus nearest-neighbor image resize — no codec library needed.
  * Compressed formats (JPEG/MP3/MP4) would require codecs this environment
  * lacks; payloads that match no known magic fall back to a documented
  * deterministic byte-fold so pipelines never drop rows.
  */
object Multimodal {

  case class MediaRow(id: Long, payload: Array[Byte], width: Int, height: Int)
  case class FeatureRow(id: Long, kind: String, dim: Int,
      features: Array[Float], checksum: Long)
  case class FrameRow(id: Long, frame_idx: Long, n_frames: Long,
      mean_byte: Double, checksum: Long)

  val FEATURE_DIM = 8

  // ------------------------------------------------------------- WAV/PCM
  /** Interleaved samples normalized to [-1, 1]. */
  case class Wav(numChannels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Double])

  /** RIFF/WAVE PCM decoder (format tag 1, 8- or 16-bit). */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // Long walk over UNTRUSTED 32-bit chunk lengths: a negative len would
    // stall (len = -8 advances by 0) or crash the executor task, and large
    // ones could overflow the Int offset. Reject negatives; with len >= 0
    // the Long offset strictly increases by >= 8, so the walk terminates.
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None // offset, length
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val id = tag(o)
      val len = bb.getInt(o + 4)
      if (len < 0) return None
      if (id == "fmt " && o + 24 <= bytes.length) {
        val audioFormat = bb.getShort(o + 8).toInt
        if (audioFormat != 1) return None // PCM only
        fmt = Some((bb.getShort(o + 10).toInt, bb.getInt(o + 12),
          bb.getShort(o + 22).toInt))
      } else if (id == "data") {
        data = Some((o + 8, math.min(len, bytes.length - o - 8)))
      }
      off += 8L + len + (len & 1)
    }
    for ((ch, rate, bits) <- fmt; (doff, dlen) <- data;
         if bits == 8 || bits == 16) yield {
      val n = dlen / (bits / 8)
      val samples = new Array[Double](n)
      var i = 0
      while (i < n) {
        samples(i) =
          if (bits == 16) bb.getShort(doff + 2 * i) / 32768.0
          else ((bytes(doff + i) & 0xff) - 128) / 128.0
        i += 1
      }
      Wav(ch, rate, bits, samples)
    }
  }

  // ------------------------------------------------------------ PPM (P6)
  /** Packed 0xRRGGBB pixels, row-major. */
  case class Image(width: Int, height: Int, rgb: Array[Int])

  /** Binary PPM (P6, maxval 255) decoder with comment support. */
  def decodePpm(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def nextInt(): Int = {
      while (pos < bytes.length &&
        (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      var v = 0
      while (pos < bytes.length && bytes(pos).toChar.isDigit) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val (w, h, maxv) = (nextInt(), nextInt(), nextInt())
    pos += 1 // single whitespace after maxval
    // 3L * w * h: the Int product overflows for untrusted header dims
    // (e.g. 40000 x 40000 claims a negative size and slips past the bound).
    if (w <= 0 || h <= 0 || maxv != 255 || pos.toLong + 3L * w * h > bytes.length)
      return None
    val rgb = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      rgb(i) = ((bytes(pos + 3 * i) & 0xff) << 16) |
        ((bytes(pos + 3 * i + 1) & 0xff) << 8) | (bytes(pos + 3 * i + 2) & 0xff)
      i += 1
    }
    Some(Image(w, h, rgb))
  }

  /** Nearest-neighbor resize (the mapInPandas 'resize' transform). */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = math.min(img.height - 1, y * img.height / h)
      var x = 0
      while (x < w) {
        val sx = math.min(img.width - 1, x * img.width / w)
        out(y * w + x) = img.rgb(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Integer luma plane: (299 r + 587 g + 114 b) / 1000 with floor
    * division — all-integer arithmetic so any oracle recomputing it from
    * the raw pixels lands on the identical value, no float rounding. */
  def grayLuma(img: Image): Array[Int] = img.rgb.map { p =>
    (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
  }

  /** 60-bit difference hash (dHash): nearest-resize the integer-luma plane
    * to an 11x6 grid (same index mapping as `resizeNearest`) and set bit
    * `y*10 + x` iff lum(y, x+1) > lum(y, x). Uniform brightness shifts
    * leave every comparison — hence the hash — unchanged. 60 bits rather
    * than the classic 64 keeps the fingerprint inside the engine's
    * sign-safe 60-bit convention (TextOps.wordHash60, SimHash) so
    * `Dedup.fingerprintPairs` banding is shared between text and image
    * near-dup detection. */
  def dhash60(img: Image): Long = {
    val gw = 11; val gh = 6
    val lum = grayLuma(img)
    val small = Array.tabulate(gh, gw) { (y, x) =>
      val sy = math.min(img.height - 1, y * img.height / gh)
      val sx = math.min(img.width - 1, x * img.width / gw)
      lum(sy * img.width + sx)
    }
    var h = 0L
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw - 1) {
        if (small(y)(x + 1) > small(y)(x)) h |= 1L << (y * 10 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  // ------------------------------------------------------------ features
  /** Audio features: duration, RMS, zero-crossing rate, peak, mean,
    * normalized rate/channels/bits. */
  def wavFeatures(w: Wav): Array[Float] = {
    val n = w.samples.length
    if (n == 0) return new Array[Float](FEATURE_DIM)
    var sum = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val v = w.samples(i)
      sum += v; sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && math.signum(v) != math.signum(w.samples(i - 1))) zc += 1
      i += 1
    }
    Array(
      (n.toDouble / (w.sampleRate * w.numChannels)).toFloat,
      math.sqrt(sumSq / n).toFloat, zc.toFloat / n, peak.toFloat,
      (sum / n).toFloat, w.sampleRate / 48000f, w.numChannels.toFloat,
      w.bitsPerSample / 32f)
  }

  /** Image features: normalized dims, mean RGB, luma mean/std, aspect. */
  def imageFeatures(img: Image): Array[Float] = {
    val n = img.rgb.length.max(1)
    var r = 0.0; var g = 0.0; var b = 0.0; var l = 0.0; var l2 = 0.0
    img.rgb.foreach { p =>
      val (pr, pg, pb) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      r += pr; g += pg; b += pb
      val luma = 0.299 * pr + 0.587 * pg + 0.114 * pb
      l += luma; l2 += luma * luma
    }
    Array(
      img.width / 1024f, img.height / 1024f,
      (r / n / 255).toFloat, (g / n / 255).toFloat, (b / n / 255).toFloat,
      (l / n / 255).toFloat,
      (math.sqrt(math.max(0, l2 / n - (l / n) * (l / n))) / 255).toFloat,
      if (img.height == 0) 0f else img.width.toFloat / img.height)
  }

  /** Deterministic byte-fold for payloads matching no known magic —
    * documented fallback, not a decoder. Lanes accumulate in DOUBLE (one
    * float32 rounding at the end) so the value is reproducible from the
    * byte stream by any engine: per-term byte/255.0 and the ascending
    * sequential sum are bit-identical in IEEE doubles — the SQL oracle
    * recomputes it from hex(payload). */
  def byteFoldFeatures(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Double](FEATURE_DIM)
    var i = 0
    while (i < payload.length) {
      acc(i % FEATURE_DIM) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    acc.map(_.toFloat)
  }

  /** Decode dispatch by magic bytes: ("wav"|"ppm"|"opaque", features).
    * Each decoder is additionally fenced with Try so ANY malformed payload
    * — not just the shapes the validators anticipate — degrades to the
    * byte-fold path instead of failing the executor task. */
  def decode(payload: Array[Byte]): (String, Array[Float]) =
    scala.util.Try(decodeWav(payload).map(w => "wav" -> wavFeatures(w)))
      .toOption.flatten
      .orElse(scala.util.Try(
        decodePpm(payload).map(i => "ppm" -> imageFeatures(i))).toOption.flatten)
      .getOrElse("opaque" -> byteFoldFeatures(payload))

  /** Attach a typed media struct to documents: payload = utf-8 bytes of
    * the text standing in for media bytes; metadata derived
    * deterministically. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("payload"),
      (length(col(textCol)) % 64 + 1).cast("int").as("width"),
      (length(col(textCol)) % 48 + 1).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Video frame sampling over opaque binary payloads (the multimodal
    * frame-sample operation): the payload is treated as a raw stream of
    * `frameBytes`-byte frames — the codec stub; a real build swaps an
    * MJPEG/MP4 decoder behind the same signature — and every
    * max(1, nFrames/targetFrames)-th frame is sampled. Per sampled frame:
    * mean byte value and a modular byte-fold checksum. Memory stays
    * bounded at one payload row per iterator step; emitted rows carry
    * only frame-level scalars, never pixel data, so a 100 TB video
    * column reduces to a narrow frame-stats table in one pass. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 96,
      targetFrames: Int = 4): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(frameBytes > 0 && targetFrames > 0)
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = (r.payload.length / frameBytes).toLong
        if (n == 0L) Iterator.empty
        else {
          val k = math.max(1L, n / targetFrames)
          (0L until n by k).iterator.map { fi =>
            var sum = 0L
            var ck = 17L
            var j = (fi * frameBytes).toInt
            val end = j + frameBytes
            while (j < end) {
              val b = r.payload(j) & 0xff
              sum += b
              ck = (ck * 31 + b) % 1000000007L
              j += 1
            }
            FrameRow(r.id, fi, n, sum.toDouble / frameBytes, ck)
          }
        }
      }
    }
  }

  /** Batched decode + feature extraction: executed partition-at-a-time so
    * decoder state amortizes per batch (the mapInPandas batch shape). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (kind, f) = decode(r.payload)
        // double multiply before rounding: float*1000 rounds differently
        // from the oracle's double arithmetic
        val checksum = f.foldLeft(17L)((a, v) =>
          a * 31 + math.round(v.toDouble * 1000))
        FeatureRow(r.id, kind, FEATURE_DIM, f, checksum)
      }
    }
  }
}
