package graft.kernels

import Iir.{C, Zpk}

/** Elliptic (Cauer) analog lowpass prototype (SURVEY K1 — the reference's
  * default ECG bandpass `_elliptic_*` designs, ECG.py:140-189,
  * EDA.py:59-93). Degree equation and pole/zero placement via descending
  * Landen transformations of the Jacobi cd/sn functions — the standard
  * construction (Orfanidis, "Lecture Notes on Elliptic Filter Design",
  * public).
  */
object Ellip {

  private val TOL = 1e-15

  /** Descending Landen modulus sequence k_1..k_M (k_M ~ 0). */
  private def landen(k0: Double): Array[Double] = {
    val buf = collection.mutable.ArrayBuffer.empty[Double]
    var k = k0
    var i = 0
    while (k > TOL && i < 32) {
      k = math.pow(k / (1 + math.sqrt(1 - k * k)), 2)
      buf += k
      i += 1
    }
    buf.toArray
  }

  // -------------------------------------------------- complex helpers on C
  private def ccos(z: C): C =
    C(math.cos(z.re) * math.cosh(z.im), -math.sin(z.re) * math.sinh(z.im))
  private def csin(z: C): C =
    C(math.sin(z.re) * math.cosh(z.im), math.cos(z.re) * math.sinh(z.im))
  private def cln(z: C): C = C(math.log(z.abs), math.atan2(z.im, z.re))
  private def casin(z: C): C = {
    val i = C(0, 1)
    -i * cln(i * z + (C.one - z * z).sqrt)
  }

  /** cd(u·K, k) for normalized complex u: Gauss descending recursion with
    * seed cos(uπ/2) at the k→0 end. */
  private def cde(u: C, k: Double): C = {
    val vs = landen(k)
    var w = ccos(u * C(math.Pi / 2))
    var i = vs.length - 1
    while (i >= 0) {
      val v = C(vs(i))
      w = (C.one + v) * w / (C.one + v * w * w)
      i -= 1
    }
    w
  }

  /** sn(u·K, k) — same recursion, sine seed. */
  private def sne(u: C, k: Double): C = {
    val vs = landen(k)
    var w = csin(u * C(math.Pi / 2))
    var i = vs.length - 1
    while (i >= 0) {
      val v = C(vs(i))
      w = (C.one + v) * w / (C.one + v * w * w)
      i -= 1
    }
    w
  }

  /** Inverse sn in normalized units: u with sn(u·K, k) = w. */
  private def asne(w0: C, k: Double): C = {
    val vs = landen(k)
    var w = w0
    var kPrev = k
    var i = 0
    while (i < vs.length) {
      val kn = vs(i)
      val disc = (C.one - (C(kPrev) * C(kPrev)) * w * w).sqrt
      w = w * C(2) / (C(1 + kn) * (C.one + disc))
      kPrev = kn
      i += 1
    }
    casin(w) * C(2 / math.Pi)
  }

  /** Degree equation: modulus k from order N and k1 = eps_p/eps_s. */
  private def ellipdeg(n: Int, k1: Double): Double = {
    val l = n / 2
    val k1c = math.sqrt(1 - k1 * k1)
    var prod = 1.0
    var i = 1
    while (i <= l) {
      val ui = (2.0 * i - 1) / n
      prod *= sne(C(ui), k1c).re
      i += 1
    }
    val kc = math.pow(k1c, n) * math.pow(prod, 4)
    math.sqrt(1 - kc * kc)
  }

  /** Analog elliptic lowpass prototype (scipy ellipap equivalent):
    * passband ripple rp dB, stopband attenuation rs dB, edge at 1 rad/s. */
  def ellipAp(n: Int, rp: Double, rs: Double): Zpk = {
    require(n >= 1)
    val epsP = math.sqrt(math.pow(10, 0.1 * rp) - 1)
    val epsS = math.sqrt(math.pow(10, 0.1 * rs) - 1)
    val k1 = epsP / epsS
    val k = ellipdeg(n, k1)
    val l = n / 2
    val j = C(0, 1)

    val zeros = collection.mutable.ArrayBuffer.empty[C]
    val poles = collection.mutable.ArrayBuffer.empty[C]
    // v0 from the passband-ripple equation
    val v0 = (asne(j / C(epsP), k1) / C(n)) * C(0, -1)
    if (n % 2 == 1) poles += j * sne(j * v0, k)
    var i = 1
    while (i <= l) {
      val ui = (2.0 * i - 1) / n
      val zi = j / (C(k) * cde(C(ui), k))
      val pi = j * cde(C(ui) - j * v0, k)
      zeros += zi; zeros += C(zi.re, -zi.im)
      poles += pi; poles += C(pi.re, -pi.im)
      i += 1
    }
    val num = zeros.foldLeft(C.one)((a, z) => a * (-z))
    val den = poles.foldLeft(C.one)((a, p) => a * (-p))
    var gain = (den / num).re
    if (n % 2 == 0) gain *= math.pow(10, -rp / 20.0)
    Zpk(zeros.toArray, poles.toArray, gain)
  }
}
