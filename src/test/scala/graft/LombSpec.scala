package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sqa.HrvFreq

class LombSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** Direct Scargle-1982 reference implementation. */
  private def lombRef(t: Array[Double], y: Array[Double], f: Double): Double = {
    val n = y.length
    val ybar = y.sum / n
    val vr = y.map(v => (v - ybar) * (v - ybar)).sum / (n - 1)
    val w = 2 * math.Pi * f
    val s2 = t.map(ti => math.sin(2 * w * ti)).sum
    val c2 = t.map(ti => math.cos(2 * w * ti)).sum
    val tau = math.atan2(s2, c2) / (2 * w)
    val ph = t.map(ti => w * (ti - tau))
    val yc = y.map(_ - ybar)
    val sc = yc.zip(ph).map { case (v, p) => v * math.cos(p) }.sum
    val ss = yc.zip(ph).map { case (v, p) => v * math.sin(p) }.sum
    val cc = ph.map(p => math.cos(p) * math.cos(p)).sum
    val sq = ph.map(p => math.sin(p) * math.sin(p)).sum
    (sc * sc / cc + ss * ss / sq) / (2 * vr)
  }

  test("lombScargle matches the direct implementation and peaks at the true frequency") {
    import spark.implicits._
    // uneven sampling: jittered times; 0.1 Hz oscillation
    val t = Array.tabulate(120)(i => i * 1.0 + 0.3 * math.sin(i * 1.7))
    val y = t.map(ti => 800.0 + 50.0 * math.sin(2 * math.Pi * 0.1 * ti))
    val df = t.zip(y).map { case (ti, yi) => (1L, ti, yi) }.toSeq.toDF("subject", "t_s", "y")
    val freqs = (1 to 50).map(_ * 0.005)
    val got = HrvFreq.lombScargle(df, freqs).collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toMap
    // exact agreement with the direct implementation at every frequency
    freqs.foreach { f =>
      val expect = lombRef(t, y, f)
      assert(math.abs(got(f) - expect) < 1e-8 * math.max(1.0, expect), s"f=$f")
    }
    // the periodogram peaks at 0.1 Hz
    val peak = got.maxBy(_._2)._1
    assert(math.abs(peak - 0.1) < 0.006)
  }
}
