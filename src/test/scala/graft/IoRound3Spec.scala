package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Edf, EngineConfig, Readers}
import graft.kernels.Fft

/** Round-3 IO surface: S6 batch-CSV source, S11 config round-trip, S13 EDF
  * validity probe, K2 Gaussian FFT low-pass. */
class IoRound3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("S6 batch-CSV source: one scan, subject from file name, per-subject idx") {
    val dir = Files.createTempDirectory("batch_").toString
    Files.writeString(Paths.get(dir, "alice.csv"), "mv\n1.0\n2.0\n3.0\n")
    Files.writeString(Paths.get(dir, "bob.csv"), "mv\n7.0\n8.0\n")
    val df = Readers.batchCsvDir(spark, dir, Map("mv" -> "ECG"))
    val rows = df.collect().map(r =>
      (r.getAs[String]("subject"), r.getAs[Long]("idx"), r.getAs[Double]("ECG")))
    assert(rows.toSet == Set(
      ("alice", 0L, 1.0), ("alice", 1L, 2.0), ("alice", 2L, 3.0),
      ("bob", 0L, 7.0), ("bob", 1L, 8.0)))
  }

  test("S6 batch-CSV: Timestamp-mapped clock orders by timestamp (splittable path)") {
    val dir = Files.createTempDirectory("batch_ts_").toString
    // rows deliberately NOT in timestamp order inside the file: the idx
    // clock must follow the Timestamp role, not physical row order
    Files.writeString(Paths.get(dir, "carol.csv"), "t,mv\n30,3.0\n10,1.0\n20,2.0\n")
    val df = Readers.batchCsvDir(spark, dir,
      Map("t" -> "Timestamp", "mv" -> "ECG"))
    val rows = df.collect().map(r =>
      (r.getAs[Long]("idx"), r.getAs[Int]("Timestamp"), r.getAs[Double]("ECG"))).sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 10, 1.0), (1L, 20, 2.0), (2L, 30, 3.0)))
  }

  test("S6 batch-CSV: idx stays in file order even under split pressure") {
    // Force maxPartitionBytes far below the file size: a splittable scan
    // would shatter the file and scramble the monotonic-id clock. The
    // multiLine whole-file path must keep idx == line order regardless.
    val dir = Files.createTempDirectory("batch_split_").toString
    val n = 5000
    val body = "mv\n" + (0 until n).map(i => s"$i.5").mkString("\n") + "\n"
    Files.writeString(Paths.get(dir, "big.csv"), body)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes", null)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try {
      val rows = Readers.batchCsvDir(spark, dir, Map("mv" -> "ECG"))
        .collect().map(r => (r.getAs[Long]("idx"), r.getAs[Double]("ECG")))
      assert(rows.length == n)
      // idx k must carry the k-th line's value — any split-induced
      // reordering breaks this for some k
      assert(rows.forall { case (idx, v) => v == idx + 0.5 })
    } finally {
      if (prev == null) spark.conf.unset("spark.sql.files.maxPartitionBytes")
      else spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
  }

  test("S11 config JSON round-trip") {
    val dir = Files.createTempDirectory("cfg_").toString + "/cfg"
    val cfg = EngineConfig(
      source = "E4", dataType = "BVP", samplingRate = 64, segmentSize = 60,
      filters = true, scrDetection = false, scrAmplitude = 0.1,
      artifactMethod = "hegarty", artifactTolerance = 1.0,
      useTemperature = true, temperatureVariable = Some("TEMP"),
      minEda = Some(0.2), maxEda = Some(40.0),
      headers = Some(Map("millivolts" -> "ECG")))
    EngineConfig.save(spark, cfg, dir)
    assert(EngineConfig.load(spark, dir) == cfg)
  }

  /** Minimal one-channel EDF byte image with the given channel label. */
  private def tinyEdf(label: String): Array[Byte] = {
    import java.nio.charset.StandardCharsets
    def pad(s: String, w: Int): Array[Byte] =
      (s + " " * w).substring(0, w).getBytes(StandardCharsets.US_ASCII)
    val out = new java.io.ByteArrayOutputStream()
    out.write(pad("0", 8)); out.write(pad("p", 80)); out.write(pad("r", 80))
    out.write(pad("02.01.20", 8)); out.write(pad("10.30.00", 8))
    out.write(pad((256 + 256).toString, 8)); out.write(pad("", 44))
    out.write(pad("1", 8)); out.write(pad("1", 8)); out.write(pad("1", 4))
    out.write(pad(label, 16)); out.write(pad("t", 80)); out.write(pad("mV", 8))
    out.write(pad("-1", 8)); out.write(pad("1", 8))
    out.write(pad("-32768", 8)); out.write(pad("32767", 8))
    out.write(pad("", 80)); out.write(pad("2", 8)); out.write(pad("", 32))
    out.write(Array[Byte](0, 0, 1, 0)) // 2 samples, little-endian int16
    out.toByteArray
  }

  test("S8 sinks: header CSV and parquet round-trip") {
    import spark.implicits._
    val df = Seq((1L, 2.5, "a"), (2L, 3.5, "b")).toDF("idx", "v", "tag")
    val base = Files.createTempDirectory("sink_").toString
    Readers.writeCsvSingle(df, s"$base/csv")
    val csvBack = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/csv")
    assert(csvBack.columns.toSeq == Seq("idx", "v", "tag"))
    assert(csvBack.count() == 2)
    Readers.writeParquet(df, s"$base/pq")
    val pqBack = spark.read.parquet(s"$base/pq")
    // parquet reads back nullable; names and types round-trip exactly
    assert(pqBack.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(pqBack.count() == 2)
  }

  test("S13 EDF validity probe: ECG0 channel label required") {
    assert(Edf.isValidActiwave(tinyEdf("ECG0")))
    assert(!Edf.isValidActiwave(tinyEdf("X")))
    assert(!Edf.isValidActiwave(Array[Byte](1, 2, 3)))
  }

  test("K2 Gaussian FFT low-pass: DC preserved, high frequency attenuated") {
    val fs = 32.0
    val n = 256
    val dc = Array.fill(n)(3.0)
    val outDc = Fft.gaussianLowpass(fs, cutoff = 1.0)(dc)
    assert(outDc.forall(v => math.abs(v - 3.0) < 1e-9))
    // 8 Hz tone with cutoff 1 Hz: gain exp(-0.5*64) ~ 0
    val tone = Array.tabulate(n)(i => math.sin(2 * math.Pi * 8.0 * i / fs))
    val outTone = Fft.gaussianLowpass(fs, cutoff = 1.0)(tone)
    assert(outTone.forall(v => math.abs(v) < 1e-9))
    // mixture: low-frequency component survives (gain exp(-0.5*(0.5)^2))
    val mix = Array.tabulate(n)(i =>
      math.sin(2 * math.Pi * 0.5 * i / fs) + math.sin(2 * math.Pi * 8.0 * i / fs))
    val outMix = Fft.gaussianLowpass(fs, cutoff = 1.0)(mix)
    val expGain = math.exp(-0.5 * 0.25)
    val expected = Array.tabulate(n)(i =>
      expGain * math.sin(2 * math.Pi * 0.5 * i / fs))
    outMix.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }
}
