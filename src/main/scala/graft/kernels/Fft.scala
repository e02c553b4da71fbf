package graft.kernels

/** Minimal complex FFT for kernel use: iterative radix-2 with Bluestein's
  * chirp-z fallback for arbitrary lengths (standard textbook algorithms),
  * plus the scipy-style analytic-signal helper (SURVEY K3) used by the
  * Manikandan-Soman detector.
  */
object Fft {

  /** In-place radix-2 FFT (n must be a power of two). */
  private def fftPow2(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (invert) 2 else -2) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var k = 0
      while (k < n) {
        var cwr = 1.0; var cwi = 0.0
        var l = 0
        while (l < len / 2) {
          val ur = re(k + l); val ui = im(k + l)
          val vr = re(k + l + len / 2) * cwr - im(k + l + len / 2) * cwi
          val vi = re(k + l + len / 2) * cwi + im(k + l + len / 2) * cwr
          re(k + l) = ur + vr; im(k + l) = ui + vi
          re(k + l + len / 2) = ur - vr; im(k + l + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          l += 1
        }
        k += len
      }
      len <<= 1
    }
    if (invert) {
      var t = 0
      while (t < n) { re(t) /= n; im(t) /= n; t += 1 }
    }
  }

  /** Forward (invert=false) / inverse (invert=true) FFT of arbitrary n —
    * radix-2 directly, Bluestein otherwise. Arrays are mutated. */
  def fft(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    if (n == 0) return
    if ((n & (n - 1)) == 0) { fftPow2(re, im, invert); return }
    // Bluestein: X_k = b*_k · ((a·b) circular-convolved)_k with
    // a_j = x_j·w^{j²}, b_j = w^{-j²}, w = e^{-iπ/n} (sign flipped for
    // the inverse transform).
    val sign = if (invert) 1.0 else -1.0
    var m = 1
    while (m < 2 * n + 1) m <<= 1
    val ar = new Array[Double](m); val ai = new Array[Double](m)
    val br = new Array[Double](m); val bi = new Array[Double](m)
    val cr = new Array[Double](n); val ci = new Array[Double](n)
    var j = 0
    while (j < n) {
      val ang = sign * math.Pi * ((j.toLong * j) % (2L * n)) / n
      cr(j) = math.cos(ang); ci(j) = math.sin(ang)
      ar(j) = re(j) * cr(j) - im(j) * ci(j)
      ai(j) = re(j) * ci(j) + im(j) * cr(j)
      br(j) = cr(j); bi(j) = -ci(j)
      if (j > 0) { br(m - j) = br(j); bi(m - j) = bi(j) }
      j += 1
    }
    fftPow2(ar, ai, invert = false)
    fftPow2(br, bi, invert = false)
    var k = 0
    while (k < m) {
      val tr = ar(k) * br(k) - ai(k) * bi(k)
      ai(k) = ar(k) * bi(k) + ai(k) * br(k); ar(k) = tr
      k += 1
    }
    fftPow2(ar, ai, invert = true)
    j = 0
    while (j < n) {
      re(j) = ar(j) * cr(j) - ai(j) * ci(j)
      im(j) = ar(j) * ci(j) + ai(j) * cr(j)
      j += 1
    }
    if (invert) {
      j = 0
      while (j < n) { re(j) /= n; im(j) /= n; j += 1 }
    }
  }

  /** K2: frequency-domain Gaussian low-pass (reference
    * `Filters.lowpass_gaussian`, pipeline/EDA.py:95-133; Nabian 2018):
    * FFT → multiply by exp(-(f/cutoff)²/2) over the two-sided fftfreq
    * grid → real part of the inverse FFT. */
  def gaussianLowpass(fs: Double, cutoff: Double = 1.0)(
      x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n == 0) return Array.empty
    val re = x.clone(); val im = new Array[Double](n)
    fft(re, im, invert = false)
    var k = 0
    while (k < n) {
      val fk = (if (k <= (n - 1) / 2) k.toDouble else k.toDouble - n) * fs / n
      val g = math.exp(-0.5 * (fk / cutoff) * (fk / cutoff))
      re(k) *= g; im(k) *= g
      k += 1
    }
    fft(re, im, invert = true)
    re
  }

  /** Imaginary part of the analytic signal (scipy.signal.hilbert). */
  def hilbertImag(x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n == 0) return Array.empty
    val re = x.clone(); val im = new Array[Double](n)
    fft(re, im, invert = false)
    // one-sided spectrum doubling
    val half = n / 2
    var k = 1
    while (k < (if (n % 2 == 0) half else half + 1)) {
      re(k) *= 2; im(k) *= 2
      k += 1
    }
    k = (if (n % 2 == 0) half + 1 else half + 1)
    while (k < n) { re(k) = 0; im(k) = 0; k += 1 }
    fft(re, im, invert = true)
    im
  }
}
