package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.KernelRunner
import graft.kernels.{BeatDetectors, Iir}

/** 100 TB rehearsal (round-7 verdict item 7): one recording LONGER than
  * the production bucket length through the cardiac chain
  * (filtfilt -> Pan-Tompkins -> per-segment SQA metrics) at the PRODUCTION
  * DefaultBucketLen/halo, asserting from inside the kernel that no task
  * ever materializes more than bucketLen + 2*halo samples. This is the
  * local[k] stand-in for "a multi-day recording becomes many bounded
  * tasks": the same plan, the same defaults, a genuinely-split group.
  */
class LongRecordingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("2.4M-sample recording: bounded tasks, correct chain output") {
    val fs = 32
    val n = 2500000L // 2.38x DefaultBucketLen -> 3 buckets
    val bucketLen = KernelRunner.DefaultBucketLen
    val halo = KernelRunner.defaultHalo(fs)

    // clean 48-bpm pulse train over a small ripple, generated distributed
    // (no driver-side array): beat every 40 samples at i % 40 == 20
    val sig = spark.range(n).select(
      lit(7L).as("subject"),
      col("id").as("idx"),
      (when(col("id") % 40 === 20, 10.0).otherwise(0.0) +
        lit(0.05) * sin(lit(2 * math.Pi * 1.1 / fs) * col("id"))).as("value"))

    // slice-size witness: every kernel invocation reports its input length
    val sliceLens = spark.sparkContext.collectionAccumulator[Long]("sliceLens")
    val (b, a) = Iir.butter(2, Seq(0.5 / 16.0, 15.0 / 16.0), "bandpass")
    val beats = KernelRunner.detectIndicesBucketed(sig, "value", bucketLen, halo) { x =>
      sliceLens.add(x.length.toLong)
      BeatDetectors.panTompkinsKernel(fs)(Iir.filtfilt(b, a, x))
    }

    // chain the detections into the flagship per-segment metrics table
    val annotated = sig
      .join(beats.withColumn("beat", lit(1)), Seq("subject", "idx"), "left")
      .select(col("subject"), col("idx"), (col("idx") * (1000000L / fs)).as("ts_us"),
        col("value"), col("beat"), lit(null).cast("int").as("artifact"))
    val metrics = graft.sqa.Cardio.computeMetrics(annotated, fs, segSize = 60)
    val mrows = metrics.collect()

    // ---- bounded-task contract, witnessed from inside the tasks
    val lens = sliceLens.value
    import scala.jdk.CollectionConverters._
    val lensScala = lens.asScala.toSeq
    assert(lensScala.size >= 3, s"expected >=3 kernel tasks, got ${lensScala.size}")
    assert(lensScala.max <= bucketLen + 2L * halo,
      s"a task saw ${lensScala.max} samples > bucketLen + 2*halo = ${bucketLen + 2L * halo}")
    // total duplicated rows stay within the documented <=2*halo/bucketLen bound
    val dup = lensScala.sum - n
    assert(dup <= 2L * halo * (lensScala.size - 1),
      s"halo duplication $dup exceeds bound")

    // ---- chain output is the expected physiology, not just nonempty
    val nBeats = spark.range(n).select(lit(7L).as("subject"), col("id").as("idx"))
      .join(beats, Seq("subject", "idx")).count()
    val expected = n / 40
    assert(math.abs(nBeats - expected) <= expected / 100,
      s"detected $nBeats beats, expected ~$expected")
    // 2.5M samples at 32 Hz = ~21.7 h -> ~1302 one-minute segments
    assert(mrows.length >= 1300 && mrows.length <= 1310,
      s"unexpected segment count ${mrows.length}")
    // interior segments: 72 detected beats/min (48 bpm pulse train has
    // beats every 40 samples = 1.25 s -> 48/min; MWA peaks offset does not
    // change counts), no invalid flags
    val interior = mrows.filter(r => r.getLong(1) > 1 && r.getLong(1) < 1300)
    assert(interior.forall(r => math.abs(r.getLong(3) - 48L) <= 1),
      "interior segment beat counts off")
    assert(interior.forall(r => r.isNullAt(9)), "unexpected invalid flags")
  }
}
