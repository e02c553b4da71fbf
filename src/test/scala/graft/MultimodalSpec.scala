package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal

/** Real pure-JVM multimodal decoders: RIFF/WAVE PCM, binary PPM,
  * nearest-neighbor resize, and magic-byte dispatch through the batched
  * mapPartitions extraction path. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def wavBytes(samples: Array[Short], rate: Int, channels: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1)
    bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def ppmBytes(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"P6\n# test\n$w $h\n255\n".getBytes("US-ASCII"))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      out.write(r); out.write(g); out.write(b)
    }
    out.toByteArray
  }

  test("WAV PCM decode: header fields and normalized samples") {
    val sine = Array.tabulate(480)(i =>
      (math.sin(2 * math.Pi * 440 * i / 48000.0) * 16384).toShort)
    val wav = Multimodal.decodeWav(wavBytes(sine, 48000, 1)).get
    assert(wav.sampleRate == 48000 && wav.numChannels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.length == 480)
    assert(math.abs(wav.samples(0)) < 1e-9)
    sine.indices.foreach(i =>
      assert(math.abs(wav.samples(i) - sine(i) / 32768.0) < 1e-12))
    assert(Multimodal.decodeWav("not a wav at all".getBytes).isEmpty)
  }

  test("PPM decode + nearest-neighbor resize") {
    val img = Multimodal.decodePpm(
      ppmBytes(4, 2, (x, y) => (x * 60, y * 100, 255 - x * 60))).get
    assert(img.width == 4 && img.height == 2)
    assert(img.rgb(0) == ((0 << 16) | (0 << 8) | 255))
    assert(img.rgb(1 * 4 + 3) == ((180 << 16) | (100 << 8) | 75))
    val small = Multimodal.resizeNearest(img, 2, 1)
    assert(small.width == 2 && small.height == 1)
    assert(small.rgb(0) == img.rgb(0) && small.rgb(1) == img.rgb(2))
    assert(Multimodal.decodePpm("P3 ascii not supported".getBytes).isEmpty)
  }

  test("malformed payloads degrade to opaque instead of hanging or crashing") {
    // len = -8 advances the naive chunk walk by 0 (infinite loop); -9 by -1;
    // other negatives used to throw NegativeArraySizeException.
    for (badLen <- Seq(-8, -9, -1, Int.MinValue, Int.MaxValue)) {
      val bb = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(56); bb.put("WAVE".getBytes)
      bb.put("data".getBytes); bb.putInt(badLen)
      val (kind, f) = Multimodal.decode(bb.array())
      assert(kind == "opaque" && f.length == Multimodal.FEATURE_DIM)
    }
    // PPM claiming 40000x40000: 3*w*h overflows Int to a negative number
    // and used to slip past the size bound.
    val hugePpm = "P6\n40000 40000\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Multimodal.decode(hugePpm)._1 == "opaque")
    // truncated real WAV header with a data chunk longer than the payload
    val wav = wavBytes(Array.tabulate(10)(_.toShort), 8000, 1)
    val truncated = wav.take(50)
    val (k2, f2) = Multimodal.decode(truncated)
    assert(f2.length == Multimodal.FEATURE_DIM) // decoded-short or opaque, never a crash
  }

  test("frame sampling: stride, bounds, and sub-frame payloads") {
    import spark.implicits._
    // 10 frames of 4 bytes each: frame i = [i, i+1, i+2, i+3]
    val vid = Array.tabulate(40)(j => (j / 4 + j % 4).toByte)
    val short = Array[Byte](1, 2) // shorter than one frame -> no rows
    val rows = Seq(
      Multimodal.MediaRow(1L, vid, 0, 0),
      Multimodal.MediaRow(2L, short, 0, 0)).toDS()
    val frames = Multimodal.frameSample(rows, frameBytes = 4, targetFrames = 4)
      .collect().sortBy(f => (f.id, f.frame_idx))
    assert(frames.forall(_.id == 1L)) // sub-frame payload emits nothing
    // n=10, target=4 -> stride k=2 -> frames 0,2,4,6,8
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    assert(frames.forall(_.n_frames == 10L))
    // frame 2 bytes = [2,3,4,5] -> mean 3.5
    assert(frames.find(_.frame_idx == 2L).get.mean_byte == 3.5)
    // checksum is the documented modular fold
    val expect = Array(2, 3, 4, 5).foldLeft(17L)((a, b) => (a * 31 + b) % 1000000007L)
    assert(frames.find(_.frame_idx == 2L).get.checksum == expect)
  }

  test("magic-byte dispatch through the batched extraction path") {
    import spark.implicits._
    val wav = wavBytes(Array.tabulate(100)(i => (i * 300).toShort), 8000, 1)
    val ppm = ppmBytes(3, 3, (_, _) => (10, 20, 30))
    val rows = Seq(
      Multimodal.MediaRow(1L, wav, 0, 0),
      Multimodal.MediaRow(2L, ppm, 3, 3),
      Multimodal.MediaRow(3L, "plain text".getBytes, 0, 0)).toDS()
    val feats = Multimodal.extractFeatures(rows).collect().sortBy(_.id)
    assert(feats.map(_.kind).toSeq == Seq("wav", "ppm", "opaque"))
    assert(feats.forall(_.features.length == Multimodal.FEATURE_DIM))
    // ppm mean RGB normalized
    val p = feats(1).features
    assert(math.abs(p(2) - 10f / 255) < 1e-6)
    assert(math.abs(p(3) - 20f / 255) < 1e-6)
    assert(math.abs(p(4) - 30f / 255) < 1e-6)
  }

  test("dHash: brightness invariance, patch locality, checked-in fixtures") {
    def img(f: (Int, Int) => (Int, Int, Int)) =
      Multimodal.decodePpm(ppmBytes(16, 12, f)).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // same deterministic image family as tools/iofixtures.py imgset
    val base = (x: Int, y: Int) => {
      val i = y * 16 + x
      ((i * 7 + 3) % 236, (i * 13 + 5) % 236, (i * 29 + 11) % 236)
    }
    val h0 = Multimodal.dhash60(img(base))
    // uniform +10 per channel shifts integer luma by exactly +10 -> every
    // neighbor comparison, hence the hash, is unchanged
    val h1 = Multimodal.dhash60(img((x, y) => {
      val (r, g, b) = base(x, y); (r + 10, g + 10, b + 10)
    }))
    assert(h0 == h1)
    // a localized white patch flips a few comparisons, not the whole hash
    val h2 = Multimodal.dhash60(img((x, y) =>
      if (y >= 4 && y <= 8 && x >= 4 && x <= 7) (255, 255, 255) else base(x, y)))
    assert(ham(h0, h2) > 0 && ham(h0, h2) <= 12)
    // an unrelated image is far (random hashes: expected hamming 30)
    val h3 = Multimodal.dhash60(img((x, y) =>
      ((x * 11 + y * 53) % 236, (x * 3 + y * 41) % 236, (x * 19 + y * 5) % 236)))
    assert(ham(h0, h3) > 12)
    // the checked-in fixture set reproduces the same relationships through
    // the binaryFile scan path (q122/q123's exact pipeline)
    val dir = s"${sys.props("user.dir")}/src/test/resources/io/imgset"
    val hashes = graft.queries.IoQueries.queries("q122_image_dhash")(spark, "")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hashes.size == 8 && new java.io.File(dir).list().length == 8)
    assert(hashes("img0") == hashes("img1"))
    assert(ham(hashes("img0"), hashes("img2")) <= 12)
    val pairs = graft.queries.IoQueries.queries("q123_image_dup_pairs")(spark, "")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(pairs(("img0", "img1")) == 0)
    assert(pairs.contains(("img0", "img2")) && pairs(("img0", "img2")) > 0)
  }

  test("WHT band energies: integer-exact and Parseval-consistent") {
    val rows = graft.queries.IoQueries.queries("q124_wav_wht")(spark, "")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.size == 6 * 4) // 6 full windows x 4 sequency bands
    // Parseval for the +/-1 WHT kernel: sum_k coef_k^2 = 64 * sum_n x_n^2,
    // so per window the band energies must add up to exactly 64 * energy
    // of the raw int16 samples — an integer identity, no tolerance.
    val samples = (0 until 384).map(i => (((i * 37 + 11) % 2048) - 1024) * 13L)
    (0 until 6).foreach { w =>
      val raw = samples.slice(w * 64, w * 64 + 64)
      val lhs = (0 until 4).map(b => rows((w.toLong, b))).sum
      assert(lhs == 64L * raw.map(s => s * s).sum)
    }
  }
}
