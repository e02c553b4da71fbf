package graft.kernels

/** IIR filter design and zero-phase filtering in pure Scala (SURVEY K1).
  *
  * Implements the classical design pipeline from public DSP theory
  * (analog prototype → frequency transform → bilinear transform →
  * polynomial coefficients) for Butterworth and Chebyshev I/II filters,
  * plus `lfilter` (direct form II transposed), steady-state initial
  * conditions (`lfilterZi`) and odd-padded forward-backward filtering
  * (`filtfilt`) matching the conventions the reference relies on
  * (scipy.signal; reference pipeline/ECG.py:140-189, 685-757,
  * pipeline/PPG.py:76-128, pipeline/EDA.py:33-93).
  *
  * Elliptic (Cauer) design lives in Ellip.scala (Jacobi cd/sn via Landen
  * transformations) and feeds `ellip` below — the reference's default ECG
  * bandpass (oracle query q55).
  */
object Iir {

  // ---------------------------------------------------------------- complex
  final case class C(re: Double, im: Double) {
    def +(o: C) = C(re + o.re, im + o.im)
    def -(o: C) = C(re - o.re, im - o.im)
    def *(o: C) = C(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: C) = {
      val d = o.re * o.re + o.im * o.im
      C((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
    def unary_- = C(-re, -im)
    def abs: Double = math.hypot(re, im)
    def sqrt: C = {
      val m = math.sqrt(this.abs)
      val a = math.atan2(im, re) / 2
      C(m * math.cos(a), m * math.sin(a))
    }
  }
  object C {
    val zero = C(0, 0)
    val one = C(1, 0)
    def apply(re: Double): C = C(re, 0)
  }

  /** Zeros, poles, gain. */
  final case class Zpk(z: Array[C], p: Array[C], k: Double)

  // ------------------------------------------------------ analog prototypes
  /** Butterworth analog lowpass prototype: poles on the unit circle. */
  def butterAp(n: Int): Zpk = {
    val poles = (0 until n).map { m =>
      val theta = math.Pi * (2 * m + n + 1) / (2 * n)
      C(math.cos(theta), math.sin(theta))
    }.toArray
    Zpk(Array.empty, poles, 1.0)
  }

  /** Chebyshev type-I analog prototype (passband ripple rp dB). */
  def cheby1Ap(n: Int, rp: Double): Zpk = {
    val eps = math.sqrt(math.pow(10, 0.1 * rp) - 1)
    val mu = math.log((1.0 + math.sqrt(1.0 + eps * eps)) / eps) / n
    val poles = (0 until n).map { m =>
      val theta = math.Pi / 2.0 * (2.0 * (m + 1) - 1) / n
      // -sinh(mu)sin(theta) + j cosh(mu)cos(theta), rotated like scipy
      C(-math.sinh(mu) * math.sin(theta), math.cosh(mu) * math.cos(theta))
    }.toArray
    var k = poles.map(p => -p).foldLeft(C.one)(_ * _).re
    if (n % 2 == 0) k /= math.sqrt(1.0 + eps * eps)
    Zpk(Array.empty, poles, k)
  }

  /** Chebyshev type-II analog prototype (stopband attenuation rs dB). */
  def cheby2Ap(n: Int, rs: Double): Zpk = {
    val de = 1.0 / math.sqrt(math.pow(10, 0.1 * rs) - 1)
    val mu = asinh(1.0 / de) / n
    // zeros on the imaginary axis at ±1/sin(theta); center skipped for odd n
    val ms: Seq[Int] =
      if (n % 2 == 1) ((-(n - 1)) to (n - 1) by 2).filterNot(_ == 0)
      else (-(n - 1)) to (n - 1) by 2
    val zeros = ms.map { m =>
      val theta = math.Pi * m / (2.0 * n)
      C(0, -1.0 / math.sin(theta))
    }.toArray
    val poles = (0 until n).map { m =>
      val theta = math.Pi * (2 * m + 1) / (2.0 * n) + math.Pi / 2.0
      val base = C(math.cos(theta), math.sin(theta))
      C.one / C(math.sinh(mu) * base.re, math.cosh(mu) * base.im)
    }.toArray
    val num = zeros.map(z => -z).foldLeft(C.one)(_ * _)
    val den = poles.map(p => -p).foldLeft(C.one)(_ * _)
    Zpk(zeros, poles, (den / num).re)
  }

  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1))

  // --------------------------------------------------- frequency transforms
  def lp2lp(zpk: Zpk, w0: Double): Zpk = {
    val z = zpk.z.map(_ * C(w0))
    val p = zpk.p.map(_ * C(w0))
    val k = zpk.k * math.pow(w0, zpk.p.length - zpk.z.length)
    Zpk(z, p, k)
  }

  def lp2hp(zpk: Zpk, w0: Double): Zpk = {
    val z = zpk.z.map(zz => C(w0) / zz)
    val p = zpk.p.map(pp => C(w0) / pp)
    val extra = Array.fill(zpk.p.length - zpk.z.length)(C.zero)
    // k' = k * real(prod(-z)/prod(-p))
    val num = zpk.z.map(zz => -zz).foldLeft(C.one)(_ * _)
    val den = zpk.p.map(pp => -pp).foldLeft(C.one)(_ * _)
    Zpk(z ++ extra, p, zpk.k * (num / den).re)
  }

  def lp2bp(zpk: Zpk, w0: Double, bw: Double): Zpk = {
    val degree = zpk.p.length - zpk.z.length
    val zlp = zpk.z.map(_ * C(bw / 2))
    val plp = zpk.p.map(_ * C(bw / 2))
    def split(x: C): Array[C] = {
      val d = (x * x - C(w0 * w0)).sqrt
      Array(x + d, x - d)
    }
    val zbp = zlp.flatMap(split) ++ Array.fill(degree)(C.zero)
    val pbp = plp.flatMap(split)
    Zpk(zbp, pbp, zpk.k * math.pow(bw, degree))
  }

  def lp2bs(zpk: Zpk, w0: Double, bw: Double): Zpk = {
    val degree = zpk.p.length - zpk.z.length
    val zhp = zpk.z.map(zz => C(bw / 2) / zz)
    val php = zpk.p.map(pp => C(bw / 2) / pp)
    def split(x: C): Array[C] = {
      val d = (x * x - C(w0 * w0)).sqrt
      Array(x + d, x - d)
    }
    val zbs = zhp.flatMap(split) ++
      Array.fill(degree)(C(0, w0)) ++ Array.fill(degree)(C(0, -w0))
    val pbs = php.flatMap(split)
    val num = zpk.z.map(zz => -zz).foldLeft(C.one)(_ * _)
    val den = zpk.p.map(pp => -pp).foldLeft(C.one)(_ * _)
    Zpk(zbs, pbs, zpk.k * (num / den).re)
  }

  /** Bilinear transform with sampling frequency fs (pre-warped upstream). */
  def bilinear(zpk: Zpk, fs: Double): Zpk = {
    val fs2 = 2.0 * fs
    val degree = zpk.p.length - zpk.z.length
    val zd = zpk.z.map(z => (C(fs2) + z) / (C(fs2) - z))
    val pd = zpk.p.map(p => (C(fs2) + p) / (C(fs2) - p))
    val zExtra = Array.fill(degree)(C(-1.0))
    val num = zpk.z.map(z => C(fs2) - z).foldLeft(C.one)(_ * _)
    val den = zpk.p.map(p => C(fs2) - p).foldLeft(C.one)(_ * _)
    Zpk(zd ++ zExtra, pd, zpk.k * (num / den).re)
  }

  /** Polynomial with given roots (complex conjugates -> real coefficients). */
  def poly(roots: Array[C]): Array[Double] = {
    var coeffs = Array(C.one)
    roots.foreach { r =>
      val next = Array.fill(coeffs.length + 1)(C.zero)
      for (i <- coeffs.indices) {
        next(i) = next(i) + coeffs(i)
        next(i + 1) = next(i + 1) - coeffs(i) * r
      }
      coeffs = next
    }
    coeffs.map(_.re)
  }

  def zpk2tf(zpk: Zpk): (Array[Double], Array[Double]) =
    (poly(zpk.z).map(_ * zpk.k), poly(zpk.p))

  // --------------------------------------------------------- design surface
  /** Normalized digital design: wn in (0,1) as a fraction of Nyquist
    * (the scipy convention the reference uses throughout). */
  private def design(proto: Zpk, wn: Seq[Double], btype: String): (Array[Double], Array[Double]) = {
    val fs = 2.0
    val warped = wn.map(w => 2.0 * fs * math.tan(math.Pi * w / fs))
    val analog = btype match {
      case "lowpass"  => lp2lp(proto, warped.head)
      case "highpass" => lp2hp(proto, warped.head)
      case "bandpass" =>
        val (w1, w2) = (warped(0), warped(1))
        lp2bp(proto, math.sqrt(w1 * w2), w2 - w1)
      case "bandstop" =>
        val (w1, w2) = (warped(0), warped(1))
        lp2bs(proto, math.sqrt(w1 * w2), w2 - w1)
    }
    zpk2tf(bilinear(analog, fs))
  }

  def butter(n: Int, wn: Seq[Double], btype: String): (Array[Double], Array[Double]) =
    design(butterAp(n), wn, btype)

  def cheby1(n: Int, rp: Double, wn: Seq[Double], btype: String): (Array[Double], Array[Double]) =
    design(cheby1Ap(n, rp), wn, btype)

  def cheby2(n: Int, rs: Double, wn: Seq[Double], btype: String): (Array[Double], Array[Double]) =
    design(cheby2Ap(n, rs), wn, btype)

  /** Elliptic (Cauer) design — scipy ellip equivalent (K1: the reference's
    * default ECG band 1-15 Hz and EDA low-pass designs). */
  def ellip(n: Int, rp: Double, rs: Double, wn: Seq[Double], btype: String): (Array[Double], Array[Double]) =
    design(Ellip.ellipAp(n, rp, rs), wn, btype)

  /** Digital notch filter (Hz units): iirnotch(w0, Q) equivalent. */
  def notch(w0: Double, q: Double): (Array[Double], Array[Double]) = {
    // standard RBJ biquad notch on normalized frequency w0 (fraction of Nyquist)
    val omega = math.Pi * w0
    val alpha = math.sin(omega) / (2.0 * q)
    val b = Array(1.0, -2.0 * math.cos(omega), 1.0)
    val a = Array(1.0 + alpha, -2.0 * math.cos(omega), 1.0 - alpha)
    (b.map(_ / a(0)), a.map(_ / a(0)))
  }

  // ------------------------------------------------------------- filtering
  /** Direct form II transposed linear filter with optional initial state. */
  def lfilter(b: Array[Double], a: Array[Double], x: Array[Double],
      zi: Array[Double] = null): Array[Double] = {
    val n = math.max(a.length, b.length)
    val bn = b.padTo(n, 0.0).map(_ / a(0))
    val an = a.padTo(n, 0.0).map(_ / a(0))
    val z = if (zi != null) zi.clone() else Array.fill(n - 1)(0.0)
    val y = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      val xi = x(i)
      val yi = bn(0) * xi + (if (n > 1) z(0) else 0.0)
      var j = 0
      while (j < n - 2) {
        z(j) = bn(j + 1) * xi + z(j + 1) - an(j + 1) * yi
        j += 1
      }
      if (n > 1) z(n - 2) = bn(n - 1) * xi - an(n - 1) * yi
      y(i) = yi
      i += 1
    }
    y
  }

  /** Steady-state initial conditions for a step input of height 1
    * (scipy lfilter_zi): solve (I - A^T) zi = B. */
  def lfilterZi(b: Array[Double], a: Array[Double]): Array[Double] = {
    val n = math.max(a.length, b.length)
    val an = a.padTo(n, 0.0).map(_ / a(0))
    val bn = b.padTo(n, 0.0).map(_ / a(0))
    val m = n - 1
    // companion(a): first row = -a[1:]/a[0]; subdiagonal ones. A^T transposed.
    val IminusAT = Array.ofDim[Double](m, m)
    for (i <- 0 until m; j <- 0 until m) {
      val aT = (if (j == 0) -an(i + 1) else if (i == j - 1) 1.0 else 0.0)
      IminusAT(i)(j) = (if (i == j) 1.0 else 0.0) - aT
    }
    val rhs = (0 until m).map(i => bn(i + 1) - an(i + 1) * bn(0)).toArray
    solveLinear(IminusAT, rhs)
  }

  private def solveLinear(mIn: Array[Array[Double]], vIn: Array[Double]): Array[Double] = {
    val n = vIn.length
    val m = mIn.map(_.clone())
    val v = vIn.clone()
    for (col <- 0 until n) {
      var piv = col
      for (r <- col + 1 until n) if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val tv = v(col); v(col) = v(piv); v(piv) = tv
      val d = m(col)(col)
      for (r <- col + 1 until n) {
        val f = m(r)(col) / d
        for (c <- col until n) m(r)(c) -= f * m(col)(c)
        v(r) -= f * v(col)
      }
    }
    val x = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = v(r)
      for (c <- r + 1 until n) s -= m(r)(c) * x(c)
      x(r) = s / m(r)(r)
    }
    x
  }

  /** Zero-phase forward-backward filter with odd-extension padding,
    * padlen = 3 * max(len(a), len(b)) (the scipy filtfilt defaults the
    * reference relies on). `padlenOpt >= 0` overrides (the decimation path
    * passes min(3*taps, len-1), utils.py:513-515). */
  def filtfilt(b: Array[Double], a: Array[Double], x: Array[Double],
      padlenOpt: Int = -1): Array[Double] = {
    val ntaps = math.max(a.length, b.length)
    val padlen = if (padlenOpt >= 0) padlenOpt else 3 * ntaps
    require(x.length > padlen, s"input length ${x.length} must exceed padlen $padlen")
    // odd extension: 2*x[0] - x[padlen..1], x, 2*x[-1] - x[-2..-padlen-1]
    val ext = new Array[Double](x.length + 2 * padlen)
    for (i <- 0 until padlen) ext(i) = 2 * x(0) - x(padlen - i)
    System.arraycopy(x, 0, ext, padlen, x.length)
    for (i <- 0 until padlen)
      ext(padlen + x.length + i) = 2 * x(x.length - 1) - x(x.length - 2 - i)
    val zi = lfilterZi(b, a)
    val fwd = lfilter(b, a, ext, zi.map(_ * ext(0)))
    val rev = fwd.reverse
    val bwd = lfilter(b, a, rev, zi.map(_ * rev(0)))
    bwd.reverse.slice(padlen, padlen + x.length)
  }
}
