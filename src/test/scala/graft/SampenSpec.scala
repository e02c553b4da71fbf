package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sqa.Hrv

/** Sample entropy (A15 nl) against a direct brute-force computation of the
  * Richman-Moorman definition (m=2, r=0.2·population std, Chebyshev, i<j
  * pairs) on the same series. */
class SampenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def brute(x: Array[Double]): (Long, Long, Option[Double]) = {
    val n = x.length
    val mean = x.sum / n
    val sd = math.sqrt(x.map(v => (v - mean) * (v - mean)).sum / n)
    val r = 0.2 * sd
    def cheb(i: Int, j: Int, m: Int): Double =
      (0 until m).map(k => math.abs(x(i + k) - x(j + k))).max
    var b = 0L; var a = 0L
    for (i <- 0 until n; j <- i + 1 until n) {
      if (i + 1 < n && j + 1 < n && cheb(i, j, 2) <= r) b += 1
      if (i + 2 < n && j + 2 < n && cheb(i, j, 3) <= r) a += 1
    }
    (b, a, if (a > 0 && b > 0) Some(-math.log(a.toDouble / b)) else None)
  }

  test("relational SampEn == brute-force Richman-Moorman on one window") {
    import spark.implicits._
    val fs = 4
    // deterministic pseudo-IBI series, exact binary values (k/64 * 1000)
    val x = Array.tabulate(48)(i => ((i * 37 + 11) % 24 + 40) / 64.0 * 1000)
    // place beats so all land in window 1 (idx < fs*60)
    val beats = x.zipWithIndex.map { case (v, i) => (1L, (i * 4).toLong, v) }
      .toSeq.toDF("subject", "idx", "ibi")
    val row = Hrv.sampleEntropy(beats, fs, windowS = 60)
      .collect().map(r => (r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).head
    val (b, a, se) = brute(x)
    assert(row._1 == b, s"B: ${row._1} vs $b")
    assert(row._2 == a, s"A: ${row._2} vs $a")
    (row._3, se) match {
      case (Some(got), Some(want)) => assert(math.abs(got - want) < 1e-6)
      case (g, w) => assert(g.isEmpty == w.isEmpty)
    }
  }
}
