package graft.io

import java.io.{DataInputStream, FileInputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** EDF (European Data Format) reader (SURVEY S1; reference
  * `Actiwave.preprocess`, physioview.py:50-159, reads ECG + X/Y/Z channels
  * via pyedflib and synthesizes per-sample timestamps from the header
  * start time and sampling rate).
  *
  * EDF is a fixed-layout ASCII-header binary format (public spec,
  * edfplus.info): 256-byte main header, 256 bytes per signal of field
  * blocks, then data records of 2-byte little-endian integers, scaled
  * per signal by (physical range / digital range).
  *
  * Decode happens driver-side (device files are small; the reference's
  * fixture is 427 KB) into a long-format DataFrame
  * `(channel, idx, ts_us, value)`; at scale, many files parallelize as
  * one task per file via the same `parse` on executors.
  */
object Edf {

  case class Channel(label: String, samplesPerRecord: Int, physMin: Double,
      physMax: Double, digMin: Int, digMax: Int)

  case class EdfFile(startEpochUs: Long, recordDurationS: Double,
      nRecords: Int, channels: Seq[Channel],
      samples: Seq[Array[Double]]) {
    def fsOf(ch: Int): Double = channels(ch).samplesPerRecord / recordDurationS
  }

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, StandardCharsets.US_ASCII).trim

  /** S13: Actiwave-EDF validity probe (reference `_check_edf`,
    * dashboard/utils.py:289-296): the file must parse as EDF and expose an
    * 'ECG0' channel label. */
  def isValidActiwave(bytes: Array[Byte]): Boolean =
    try parse(bytes).channels.exists(_.label.contains("ECG0"))
    catch { case scala.util.control.NonFatal(_) => false }

  /** Parse an EDF file into per-channel physical-value arrays. */
  def parse(bytes: Array[Byte]): EdfFile = {
    require(bytes.length >= 256, "truncated EDF header")
    val startDate = ascii(bytes, 168, 8) // dd.mm.yy
    val startTime = ascii(bytes, 176, 8) // hh.mm.ss
    val headerLen = ascii(bytes, 184, 8).toInt
    val nRecords = ascii(bytes, 236, 8).toInt
    val recDur = ascii(bytes, 244, 8).toDouble
    val ns = ascii(bytes, 252, 4).toInt

    def sigField(fieldOff: Int, width: Int, i: Int): String =
      ascii(bytes, 256 + fieldOff * ns + width * i, width)
    val channels = (0 until ns).map { i =>
      Channel(
        label = sigField(0, 16, i),
        samplesPerRecord = ascii(bytes,
          256 + (16 + 80 + 8 + 8 + 8 + 8 + 8 + 80) * ns + 8 * i, 8).toInt,
        physMin = sigField2(bytes, ns, 16 + 80 + 8, i).toDouble,
        physMax = sigField2(bytes, ns, 16 + 80 + 8 + 8, i).toDouble,
        digMin = sigField2(bytes, ns, 16 + 80 + 8 + 8 + 8, i).toDouble.toInt,
        digMax = sigField2(bytes, ns, 16 + 80 + 8 + 8 + 8 + 8, i).toDouble.toInt)
    }

    val samples = channels.map(c => new Array[Double](c.samplesPerRecord * nRecords))
    var pos = headerLen
    var r = 0
    while (r < nRecords) {
      var ch = 0
      while (ch < channels.length) {
        val c = channels(ch)
        val scale = (c.physMax - c.physMin) / (c.digMax - c.digMin).toDouble
        var s = 0
        while (s < c.samplesPerRecord) {
          val lo = bytes(pos) & 0xff
          val hi = bytes(pos + 1)
          val dig = (hi << 8) | lo
          samples(ch)(r * c.samplesPerRecord + s) =
            (dig - c.digMin) * scale + c.physMin
          pos += 2
          s += 1
        }
        ch += 1
      }
      r += 1
    }

    // dd.mm.yy + hh.mm.ss -> epoch µs (EDF clips years to 1985-2084)
    val Array(dd, mm, yy) = startDate.split('.').map(_.toInt)
    val Array(hh, mi, ss) = startTime.split('.').map(_.toInt)
    val year = if (yy >= 85) 1900 + yy else 2000 + yy
    val epochS = java.time.LocalDateTime.of(year, mm, dd, hh, mi, ss)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    EdfFile(epochS * 1000000L, recDur, nRecords, channels, samples)
  }

  private def sigField2(bytes: Array[Byte], ns: Int, fieldOff: Int, i: Int): String =
    ascii(bytes, 256 + fieldOff * ns + 8 * i, 8)

  /** Long-format frame: (channel, idx, ts_us, value) with timestamps
    * synthesized as start + idx/fs per channel. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val in = new DataInputStream(new FileInputStream(path))
    val bytes =
      try in.readAllBytes()
      finally in.close()
    val edf = parse(bytes)
    val rows = edf.channels.zipWithIndex.flatMap { case (c, ch) =>
      val fs = edf.fsOf(ch)
      edf.samples(ch).zipWithIndex.map { case (v, i) =>
        Row(c.label, i.toLong, edf.startEpochUs + math.round(i / fs * 1e6), v)
      }
    }
    val schema = StructType(Seq(
      StructField("channel", StringType),
      StructField("idx", LongType),
      StructField("ts_us", LongType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }
}
