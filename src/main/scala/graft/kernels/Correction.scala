package graft.kernels

import scala.collection.mutable.ArrayBuffer

/** Beat-correction FSM (SURVEY K14; Hegarty-Craver et al. 2018; reference
  * `SQA.Cardio.correct_interval`, pipeline/SQA.py:725-1415).
  *
  * Sequential by construction — corrections rewrite already-emitted history
  * (pull-ups, FIFO mutation, limit repairs), so this runs as a
  * per-recording kernel under the sorted-group contract. All arithmetic is
  * on doubles (the reference mixes numpy ints and floats; every value stays
  * integral or half-integral, far below 2^53, so double is exact).
  *
  * Faithfully ported reference quirks:
  *  - the previous-IBI FIFO seeds with the auto-estimated first IBI twice;
  *  - `np.median([])` is NaN, so flags evaluated on short FIFO slices fall
  *    through every comparison to 'Extra Long' and acceptance checks fail;
  *  - `_insert_interval` re-derives current_ibi from beat positions but
  *    flags it with the SPLIT ibi value;
  *  - the correction-failure FIFO only advances on accepts, and three
  *    failures reset the estimate FIFO to the initial IBI;
  *  - min/max-BPM limit repair shifts the previous beat and re-flags both
  *    intervals.
  */
object Correction {

  /** Cumulative FSM work units since JVM start: one unit per main-loop
    * iteration plus the FIFO length touched that iteration (so an
    * unbounded-FIFO regression shows up), plus one per inserted split
    * interval. Monotone and thread-safe; the per-kernel-call overhead is a
    * single LongAdder.add. Exists so tests can witness the FSM's linear
    * cost by WORK rather than wall clock (wall clock is nondeterministic
    * under shared-JVM suite pressure). */
  val workUnits = new java.util.concurrent.atomic.LongAdder

  case class Params(
      initialHr: Option[Double] = None,
      prevN: Int = 6,
      minBpm: Int = 40,
      maxBpm: Int = 200,
      hrEstimateWindow: Int = 6,
      shortThreshold: Double = 24.0 / 32,
      longThreshold: Double = 44.0 / 32,
      extraThreshold: Double = 52.0 / 32)

  /** (pos, ibiMs, ibiIdx, beat, correctionFlag) — row 0 is the first beat
    * with null IBI. */
  case class OrigRow(pos: Int, ibiMs: Option[Double], ibi: Option[Double],
      beat: Double, correction: Int)

  /** (pos, ibiMs, ibiIdx, beat, flag). */
  case class CorrRow(pos: Int, ibiMs: Option[Double], ibi: Option[Double],
      beat: Double, flag: Option[String])

  private class MaxNFifo(maxN: Int, init: Option[Double]) {
    val q: ArrayBuffer[Double] = ArrayBuffer.empty[Double]
    init.foreach { v => q += v; q += v }
    def push(v: Double): Unit = { q += v; if (q.length > maxN + 1) q.remove(0) }
    def changeLast(v: Double): Unit = q(q.length - 1) = v
    def reset(v: Double): Unit = { q.clear(); q += v; q += v }
  }

  /** np.median: NaN on empty, mean of middle two on even length. */
  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) Double.NaN
    else {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

  /** Banker's rounding to `d` decimals (np.round). */
  private def roundEven(x: Double, d: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** Run the FSM over one recording's beat sample indices (ascending).
    * Returns (original, corrected) row tables. */
  def correctInterval(fs: Int, p: Params = Params())(
      beatsIx: Array[Double]): (Array[OrigRow], Array[CorrRow]) = {
    if (beatsIx.length < 2) {
      val orig = beatsIx.map(b => OrigRow(0, None, None, b, 0))
      val corr = beatsIx.map(b => CorrRow(0, None, None, b, None))
      return (orig, corr)
    }
    val ibis = beatsIx.sliding(2).map(w => w(1) - w(0)).toArray
    val beats = beatsIx.drop(1)
    var ops = 0L // accumulated locally, published to workUnits once at the end

    // Initial IBI estimate: the hr_estimate_window consecutive IBIs with
    // the smallest mean absolute successive difference.
    val firstIbi = p.initialHr match {
      case Some(hr) => fs * 60.0 / hr
      case None =>
        val w = p.hrEstimateWindow
        if (ibis.length <= w) ibis.sum / ibis.length
        else {
          val sd = ibis.sliding(2).map(x => math.abs(x(1) - x(0))).toArray
          var best = 0; var bestV = Double.MaxValue
          var i = 0
          while (i + w <= sd.length) {
            var s = 0.0; var j = 0
            while (j < w) { s += sd(i + j); j += 1 }
            if (s / w < bestV) { bestV = s / w; best = i }
            i += 1
          }
          ibis.slice(best, best + w).sum / w
        }
    }

    val fifo = new MaxNFifo(p.prevN, Some(firstIbi))
    val failed = new MaxNFifo(p.prevN - 1, None)

    val corrIbis = ArrayBuffer.empty[Double]
    val corrBeats = ArrayBuffer.empty[Double]
    val corrFlags = ArrayBuffer.empty[String]
    val correctionFlags = Array.fill(beats.length)(0)

    var cnt = 0
    var prevIbi = 0.0; var prevBeat = 0.0; var prevFlag: String = null
    var curIbi = 0.0; var curBeat = 0.0; var curFlag: String = null

    val minIbi = math.floor(fs * 60.0 / p.maxBpm)
    val maxIbi = math.floor(fs * 60.0 / p.minBpm)

    def returnFlag(ibi: Double, prev: Seq[Double]): String = {
      val est = median(prev)
      val low = p.shortThreshold * est
      val high = p.longThreshold * est
      val extra = p.extraThreshold * est
      if (low <= ibi && ibi <= high) "Correct"
      else if (ibi < low) "Short"
      else if (ibi > high && ibi < extra) "Long"
      else "Extra Long"
    }

    def acceptanceCheck(ibi: Double, prev: Seq[Double]): Boolean = {
      val est = median(prev)
      ibi >= p.shortThreshold * est && ibi <= p.longThreshold * est
    }

    def checkLimits(n: Int): Unit = {
      if (prevIbi < minIbi) {
        val rem = minIbi - prevIbi
        prevBeat += rem
        prevIbi = minIbi
        prevFlag = returnFlag(prevIbi, fifo.q.dropRight(1).toSeq)
        curIbi -= rem
        curFlag = returnFlag(curIbi, fifo.q.drop(1).toSeq)
        correctionFlags(n - 1) = 1; correctionFlags(n) = 1
        cnt += 1
      } else if (prevIbi > maxIbi) {
        val rem = prevIbi - maxIbi
        prevBeat -= rem
        prevIbi = maxIbi
        prevFlag = returnFlag(prevIbi, fifo.q.dropRight(1).toSeq)
        curIbi += rem
        curFlag = returnFlag(curIbi, fifo.q.drop(1).toSeq)
        correctionFlags(n - 1) = 1; correctionFlags(n) = 1
        cnt += 1
      }
    }

    def acceptIbi(n: Int, failedFlag: Int = 0): Unit = {
      checkLimits(n)
      corrIbis += prevIbi; corrBeats += prevBeat; corrFlags += prevFlag
      fifo.push(prevIbi)
      prevIbi = curIbi; prevBeat = curBeat; prevFlag = curFlag
      cnt = math.max(0, cnt - 1)
      failed.push(failedFlag.toDouble)
    }

    def addPrevAndCurrent(n: Int): Unit = {
      val corrected = prevIbi + curIbi
      if (acceptanceCheck(corrected, fifo.q.drop(1).toSeq)) {
        curIbi = corrected
        curFlag = returnFlag(curIbi, fifo.q.drop(1).toSeq)
        if (n == 1 || corrIbis.isEmpty) {
          prevIbi = curIbi; prevBeat = curBeat; prevFlag = curFlag
        } else {
          prevIbi = corrIbis.last; prevBeat = corrBeats.last; prevFlag = corrFlags.last
          checkLimits(n)
          corrIbis(corrIbis.length - 1) = prevIbi
          corrBeats(corrBeats.length - 1) = prevBeat
          corrFlags(corrFlags.length - 1) = prevFlag
          fifo.changeLast(prevIbi)
          prevIbi = curIbi; prevBeat = curBeat; prevFlag = curFlag
        }
        correctionFlags(n - 1) = 1; correctionFlags(n) = 1
        cnt += 1
      } else acceptIbi(n, failedFlag = 1)
    }

    def addSecondPrevAndPrev(n: Int): Unit = {
      val corrected = corrIbis.last + prevIbi
      if (acceptanceCheck(corrected, fifo.q.dropRight(2).toSeq)) {
        prevIbi = corrected
        prevFlag = returnFlag(prevIbi, fifo.q.dropRight(2).toSeq)
        checkLimits(n)
        corrIbis(corrIbis.length - 1) = prevIbi
        corrBeats(corrBeats.length - 1) = prevBeat
        corrFlags(corrFlags.length - 1) = prevFlag
        fifo.changeLast(prevIbi)
        prevIbi = curIbi; prevBeat = curBeat; prevFlag = curFlag
        correctionFlags(n - 2) = 1; correctionFlags(n - 1) = 1
        cnt += 1
      } else acceptIbi(n, failedFlag = 1)
    }

    def insertInterval(n: Int): Unit = {
      val est = median(fifo.q.drop(1).toSeq)
      val nSplitD = roundEven((prevIbi + curIbi) / est, 0)
      if (nSplitD.isNaN || nSplitD.isInfinite || nSplitD < 1) {
        acceptIbi(n, failedFlag = 1); return
      }
      val nSplit = nSplitD.toInt
      val ibi = math.floor((prevIbi + curIbi) / nSplit)
      if (acceptanceCheck(ibi, fifo.q.drop(1).toSeq)) {
        var i = 0
        while (i < nSplit - 2) {
          ops += 1
          corrIbis += ibi
          corrFlags += returnFlag(ibi, fifo.q.drop(1).toSeq)
          if ((n == 1 && i == 0) || corrBeats.isEmpty)
            corrBeats += beatsIx(0) + ibi
          else
            corrBeats += corrBeats.last + ibi
          fifo.push(ibi)
          i += 1
        }
        prevIbi = ibi
        prevBeat = if (corrBeats.nonEmpty) corrBeats.last + ibi else beatsIx(0) + ibi
        prevFlag = returnFlag(ibi, fifo.q.dropRight(1).toSeq)
        curIbi = curBeat - prevBeat
        curFlag = returnFlag(ibi, fifo.q.drop(1).toSeq)
        checkLimits(n)
        corrIbis += prevIbi; corrBeats += prevBeat; corrFlags += prevFlag
        fifo.push(prevIbi)
        prevIbi = curIbi; prevBeat = curBeat; prevFlag = curFlag
        correctionFlags(n - 1) = 1; correctionFlags(n) = 1
        cnt += nSplit - 1
      } else acceptIbi(n, failedFlag = 1)
    }

    def averagePrevAndCurrent(n: Int): Unit = {
      val ibi = math.floor((prevIbi + curIbi) / 2)
      if (acceptanceCheck(ibi, fifo.q.drop(1).toSeq)) {
        prevIbi = ibi
        prevBeat = if (n == 1 || corrBeats.isEmpty) beatsIx(0) + ibi
          else corrBeats.last + ibi
        prevFlag = returnFlag(ibi, fifo.q.dropRight(1).toSeq)
        curIbi = curBeat - prevBeat
        curFlag = returnFlag(ibi, fifo.q.drop(1).toSeq)
        checkLimits(n)
        corrIbis += prevIbi; corrBeats += prevBeat; corrFlags += prevFlag
        fifo.push(prevIbi)
        prevIbi = curIbi; prevBeat = curBeat; prevFlag = curFlag
        correctionFlags(n - 1) = 1; correctionFlags(n) = 1
        cnt += 1
      } else acceptIbi(n, failedFlag = 1)
    }

    var n = 0
    while (n < ibis.length) {
      ops += 1L + fifo.q.length
      curIbi = ibis(n)
      curBeat = beats(n)
      if (n == 0) {
        curFlag = returnFlag(curIbi, fifo.q.toSeq)
        prevIbi = curIbi; prevBeat = curBeat; prevFlag = curFlag
      } else {
        curFlag = returnFlag(curIbi, fifo.q.dropRight(1).toSeq)
        (curFlag, prevFlag) match {
          case ("Correct", "Correct") | ("Correct", "Long") => acceptIbi(n)
          case ("Correct", "Short") =>
            // corrIbis can only be empty here if n==1 took a non-emitting
            // path (the reference would IndexError); treat as the n==1 case.
            if (n == 1 || corrIbis.isEmpty) addPrevAndCurrent(n)
            else if (corrIbis.last > curIbi) addPrevAndCurrent(n)
            else addSecondPrevAndPrev(n)
          case ("Correct", "Extra Long") => insertInterval(n)
          case ("Short", "Correct") => acceptIbi(n)
          case ("Short", "Short") => addPrevAndCurrent(n)
          case ("Short", "Long") | ("Short", "Extra Long") => averagePrevAndCurrent(n)
          case ("Long", "Correct") | ("Long", "Long") => acceptIbi(n)
          case ("Long", "Short") => averagePrevAndCurrent(n)
          case ("Long", "Extra Long") => insertInterval(n)
          case ("Extra Long", "Correct") | ("Extra Long", "Long") |
               ("Extra Long", "Extra Long") => insertInterval(n)
          case ("Extra Long", "Short") => averagePrevAndCurrent(n)
          case _ => // unreachable: flags are always one of the four
        }
      }
      if (failed.q.sum >= 3) fifo.reset(firstIbi)
      n += 1
    }
    corrIbis += curIbi; corrBeats += curBeat; corrFlags += curFlag
    workUnits.add(ops)

    val orig = OrigRow(0, None, None, beatsIx(0), 0) +:
      ibis.indices.map(i => OrigRow(i + 1,
        Some(roundEven(ibis(i) / fs * 1000.0, 2)), Some(ibis(i)),
        beats(i), correctionFlags(i))).toArray
    val corr = CorrRow(0, None, None, beatsIx(0), None) +:
      corrIbis.indices.map(i => CorrRow(i + 1,
        Some(roundEven(corrIbis(i) / fs * 1000.0, 2)), Some(corrIbis(i)),
        corrBeats(i), Some(corrFlags(i)))).toArray
    (orig, corr)
  }
}
