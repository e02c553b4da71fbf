package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Edf, Readers}
import graft.kernels.{BeatDetectors, Iir}
import graft.sqa.Cardio

/** SURVEY §5.2 item 3: the reference's real device fixtures through the
  * full cardiac plan end to end — EDF scan → bandpass filtfilt → beat
  * detection → segmentation → SQA metrics — as ONE lazy DataFrame plan,
  * and the E4 archive through the ZIP readers. Runs only when the
  * reference snapshot is present (read-only sample data). */
class EndToEndSpec extends AnyFunSuite {

  private val EDF = "/root/reference/examples/sample_actiwave.edf"
  private val E4 = "/root/reference/examples/sample_e4_data.zip"

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("Actiwave EDF -> filter -> detect -> per-segment SQA metrics") {
    assume(new java.io.File(EDF).exists())
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(EDF))
    assert(Edf.isValidActiwave(bytes))
    val edf = Edf.parse(bytes)
    val ecgCh = edf.channels.indexWhere(_.label.contains("ECG0"))
    assert(ecgCh >= 0)
    val fs = edf.fsOf(ecgCh)
    assert(fs > 0 && fs % 1 == 0.0)

    val frame = Edf.read(spark, EDF)
      .filter(col("channel").contains("ECG0"))
      .withColumn("subject", lit(1L))
      .select("subject", "idx", "ts_us", "value")
    val n = frame.count()
    assert(n == edf.samples(ecgCh).length)

    // full cardiac plan: default elliptic 1-15 Hz bandpass (ECG.py:140-189)
    // + Pan-Tompkins detection + 60 s segmentation + SQA metrics
    val fsi = fs.toInt
    val (b, a) = Iir.ellip(2, 0.15, 80.0, Seq(1.0 / (fs / 2), 15.0 / (fs / 2)), "bandpass")
    val beats = graft.core.KernelRunner.detectIndices(frame, "value") { x =>
      BeatDetectors.panTompkinsKernel(fsi)(Iir.filtfilt(b, a, x))
    }
    val nBeats = beats.count()
    assert(nBeats > 100, s"expected a plausible beat count, got $nBeats")

    val annotated = frame.join(
      beats.withColumn("beat", lit(1)), Seq("subject", "idx"), "left")
      .withColumn("artifact", lit(null).cast("int"))
    val metrics = Cardio.computeMetrics(annotated, fsi, segSize = 60)
    val rows = metrics.orderBy("segment").collect()
    assert(rows.nonEmpty)
    // plausible human heart rates in at least the interior segments
    val interior = rows.dropRight(1)
    assert(interior.nonEmpty)
    interior.foreach { r =>
      val det = r.getAs[Long]("n_detected")
      assert(det > 20 && det < 220, s"segment ${r.getAs[Long]("segment")}: $det beats")
    }
  }

  test("dispatch-routed mixed directory: EDF + E4 zip + mapped CSV lifecycle") {
    assume(new java.io.File(EDF).exists() && new java.io.File(E4).exists())
    val dir = java.nio.file.Files.createTempDirectory("mixed").toFile
    val temp = new java.io.File(dir, "temp")
    val render = new java.io.File(dir, "_render")
    try {
      // assemble the mixed directory: real device files + a mapped CSV
      java.nio.file.Files.copy(java.nio.file.Paths.get(EDF),
        new java.io.File(dir, "subjA.edf").toPath)
      java.nio.file.Files.copy(java.nio.file.Paths.get(E4),
        new java.io.File(dir, "subjB.zip").toPath)
      java.nio.file.Files.copy(java.nio.file.Paths.get(
        "src/test/resources/io/mapped.csv"),
        new java.io.File(dir, "subjC.csv").toPath)
      // and two files the dispatcher must skip
      java.nio.file.Files.write(new java.io.File(dir, "notes.txt").toPath,
        "not physiological".getBytes)
      java.nio.file.Files.write(new java.io.File(dir, "bad.edf").toPath,
        Array.fill[Byte](64)(7))

      val opts = graft.ops.RunPipeline.Options(
        segSize = 10, e4Dtype = "EDA", csvDtype = "EDA", csvFs = 1,
        csvMapping = Map("when" -> "Timestamp", "microsiemens" -> "EDA",
          "temp_c" -> "TEMP"))
      val outs = graft.ops.RunPipeline.runDirectory(
        spark, dir.getPath, temp.getPath, render.getPath, opts)

      // all three modality chains ran; the undispatchable files did not
      assert(outs.map(o => (o.file, o.source.name, o.dtype)) == Seq(
        ("subjA", "Actiwave", "ECG"),
        ("subjB", "E4", "EDA"),
        ("subjC", "csv", "EDA")))

      // each chain's metrics table is non-trivial
      val byFile = outs.map(o => o.file -> o).toMap
      val ecgMetrics = byFile("subjA").metrics.collect()
      assert(ecgMetrics.length > 5)
      assert(ecgMetrics.forall(r => r.getAs[Long]("n_detected") >= 0))
      val interiorBeats = ecgMetrics.dropRight(1).map(_.getAs[Long]("n_detected"))
      assert(interiorBeats.exists(_ > 0), "EDF cardiac chain found no beats")
      val edaMetrics = byFile("subjB").metrics.collect()
      assert(edaMetrics.nonEmpty)
      assert(byFile("subjB").metrics.columns.contains("pct_temp_out_of_range"))
      val csvMetrics = byFile("subjC").metrics.collect()
      assert(csvMetrics.nonEmpty)

      // the reference's output surface landed through the real sinks
      def nonEmptyCsvDir(p: String): Boolean = {
        val fl = Option(new java.io.File(p).listFiles())
          .getOrElse(Array.empty[java.io.File])
        fl.exists(f => f.getName.endsWith(".csv") && f.length > 0)
      }
      outs.foreach { o =>
        assert(nonEmptyCsvDir(o.outFiles("signal")), s"${o.file} signal sink")
        assert(nonEmptyCsvDir(o.outFiles("sqa")), s"${o.file} sqa sink")
        assert(nonEmptyCsvDir(o.outFiles("render")), s"${o.file} render sink")
      }
      assert(byFile("subjA").outFiles.contains("ibi"))
      assert(nonEmptyCsvDir(byFile("subjA").outFiles("ibi")))
      assert(byFile("subjB").outFiles.contains("acc"))
    } finally {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(del)
        f.delete()
      }
      del(dir)
    }
  }

  test("E4 ZIP archive: all modalities + IBI parse with real device data") {
    assume(new java.io.File(E4).exists())
    val eda = Readers.e4Modality(spark, E4, "EDA.csv")
    val bvp = Readers.e4Modality(spark, E4, "BVP.csv")
    val acc = Readers.e4Modality(spark, E4, "ACC.csv")
    val ibi = Readers.e4Ibi(spark, E4)
    assert(eda.count() > 0 && bvp.count() > 0 && acc.count() > 0)
    assert(acc.columns.contains("Magnitude"))
    assert(ibi.count() > 0)
    // IBIs are in plausible ms range
    val ibis = ibi.select("IBI").collect().map(_.getDouble(0))
    assert(ibis.forall(v => v > 200 && v < 3000))
  }
}
