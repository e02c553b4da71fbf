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
