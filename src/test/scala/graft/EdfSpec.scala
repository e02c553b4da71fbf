package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Edf

class EdfSpec extends AnyFunSuite {

  /** Build a minimal valid EDF byte image: 2 channels, 3 one-second
    * records, ECG at 32 sps and X at 8 sps. */
  private def syntheticEdf(): (Array[Byte], Array[Int], Array[Int]) = {
    val ns = 2
    val nRecords = 3
    val sps = Array(32, 8)
    def pad(s: String, w: Int): Array[Byte] =
      (s + " " * w).substring(0, w).getBytes(StandardCharsets.US_ASCII)
    val headerLen = 256 + 256 * ns
    val header = new java.io.ByteArrayOutputStream()
    header.write(pad("0", 8)) // version
    header.write(pad("patient", 80))
    header.write(pad("recording", 80))
    header.write(pad("02.01.20", 8)) // 2 Jan 2020
    header.write(pad("10.30.00", 8))
    header.write(pad(headerLen.toString, 8))
    header.write(pad("", 44)) // reserved
    header.write(pad(nRecords.toString, 8))
    header.write(pad("1", 8)) // record duration 1 s
    header.write(pad(ns.toString, 4))
    // signal header blocks: field-by-field across signals
    header.write(pad("ECG", 16)); header.write(pad("X", 16))
    for (_ <- 0 until ns) header.write(pad("transducer", 80))
    header.write(pad("mV", 8)); header.write(pad("g", 8))
    header.write(pad("-1", 8)); header.write(pad("-4", 8)) // physMin
    header.write(pad("1", 8)); header.write(pad("4", 8)) // physMax
    header.write(pad("-32768", 8)); header.write(pad("-128", 8)) // digMin
    header.write(pad("32767", 8)); header.write(pad("127", 8)) // digMax
    for (_ <- 0 until ns) header.write(pad("", 80)) // prefiltering
    header.write(pad("32", 8)); header.write(pad("8", 8)) // samples/record
    for (_ <- 0 until ns) header.write(pad("", 32)) // reserved

    val ecgDig = Array.tabulate(nRecords * 32)(i => i * 100 - 1600)
    val xDig = Array.tabulate(nRecords * 8)(i => i * 10 - 120)
    val body = new java.io.ByteArrayOutputStream()
    for (r <- 0 until nRecords) {
      for (s <- 0 until 32) {
        val v = ecgDig(r * 32 + s)
        body.write(v & 0xff); body.write((v >> 8) & 0xff)
      }
      for (s <- 0 until 8) {
        val v = xDig(r * 8 + s)
        body.write(v & 0xff); body.write((v >> 8) & 0xff)
      }
    }
    (header.toByteArray ++ body.toByteArray, ecgDig, xDig)
  }

  test("EDF parse: header, scaling, per-channel fs, timestamps") {
    val (bytes, ecgDig, xDig) = syntheticEdf()
    val edf = Edf.parse(bytes)
    assert(edf.channels.map(_.label) == Seq("ECG", "X"))
    assert(edf.nRecords == 3 && edf.recordDurationS == 1.0)
    assert(edf.fsOf(0) == 32.0 && edf.fsOf(1) == 8.0)
    // start: 2020-01-02 10:30:00 UTC
    assert(edf.startEpochUs == 1577961000L * 1000000L)
    // scaling: ECG phys [-1,1] over dig [-32768,32767]
    val scale = 2.0 / 65535.0
    for (i <- ecgDig.indices)
      assert(math.abs(edf.samples(0)(i) - ((ecgDig(i) + 32768) * scale - 1.0)) < 1e-12)
    val xScale = 8.0 / 255.0
    for (i <- xDig.indices)
      assert(math.abs(edf.samples(1)(i) - ((xDig(i) + 128) * xScale - 4.0)) < 1e-12)
  }

  test("EDF read: long-format frame with synthesized clocks") {
    val (bytes, _, _) = syntheticEdf()
    val f = java.io.File.createTempFile("graft", ".edf")
    val os = new java.io.FileOutputStream(f)
    os.write(bytes); os.close()
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    val df = Edf.read(spark, f.getAbsolutePath)
    import org.apache.spark.sql.functions._
    assert(df.count() == 96 + 24)
    val ecg = df.filter(col("channel") === "ECG")
    assert(ecg.count() == 96)
    // second ECG sample is 1/32 s after start
    val ts = ecg.filter(col("idx") === 1).select("ts_us").head().getLong(0)
    assert(ts == 1577961000L * 1000000L + 31250L)
    f.delete()
  }
}
