package graft.multimodal

/** Pure-JVM DSP kernel for the audio half of the multimodal surface:
  * an iterative radix-2 FFT plus the window/spectrum helpers
  * [[Multimodal.extractAudioSpectral]] builds on. Hand-rolled because
  * no FFT library ships in this environment — and deterministic by
  * construction (StrictMath trig, fixed iteration order), so spectral
  * features are identical under any partitioning, retry, or JVM.
  */
object Dsp {

  /** In-place iterative radix-2 Cooley–Tukey FFT. `re`/`im` length
    * must be a power of two. O(n log n), no allocation beyond the
    * caller's arrays. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0,
      "fft length must be a power of two")
    if (n <= 1) return
    // bit-reversal permutation
    var i = 1
    var j = 0
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
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = StrictMath.cos(ang)
      val wi = StrictMath.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(base + k) = ar + tr; im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr; im(base + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Hann window coefficients (periodic form), length `n`. */
  def hann(n: Int): Array[Double] =
    Array.tabulate(n)(i =>
      0.5 - 0.5 * StrictMath.cos(2.0 * math.Pi * i / n))

  /** Power spectrum (|X_k|², bins 0..n/2) of up to `maxWindows`
    * Hann-windowed frames of `fftSize` samples evenly spaced over the
    * signal, averaged across frames. Signals shorter than `fftSize`
    * are zero-padded into a single frame. */
  def averagePowerSpectrum(samples: Array[Double], fftSize: Int,
      maxWindows: Int): Array[Double] = {
    require(fftSize > 1 && (fftSize & (fftSize - 1)) == 0)
    val w = hann(fftSize)
    val half = fftSize / 2
    val acc = Array.ofDim[Double](half + 1)
    val nFrames =
      if (samples.length <= fftSize) 1
      else math.min(maxWindows,
        math.max(1, samples.length / fftSize))
    val lastStart = math.max(0, samples.length - fftSize)
    var f = 0
    while (f < nFrames) {
      val start = if (nFrames == 1) 0
        else f * lastStart / math.max(1, nFrames - 1)
      val re = Array.ofDim[Double](fftSize)
      val im = Array.ofDim[Double](fftSize)
      var i = 0
      while (i < fftSize) {
        val s = if (start + i < samples.length) samples(start + i) else 0.0
        re(i) = s * w(i)
        i += 1
      }
      fft(re, im)
      var k = 0
      while (k <= half) {
        acc(k) += re(k) * re(k) + im(k) * im(k)
        k += 1
      }
      f += 1
    }
    var k = 0
    while (k <= half) { acc(k) /= nFrames; k += 1 }
    acc
  }

  /** Mel scale (HTK convention): `2595·log10(1 + f/700)`. */
  def hzToMel(f: Double): Double =
    2595.0 * StrictMath.log10(1.0 + f / 700.0)

  def melToHz(m: Double): Double =
    700.0 * (StrictMath.pow(10.0, m / 2595.0) - 1.0)

  /** Log-mel band energies — the standard audio-ML front end one step
    * short of MFCC (no DCT): `nMels` triangular filters spaced evenly
    * on the mel scale from 0 to Nyquist, applied to the power
    * spectrum, then `ln(e + 1e-12)`. Same deterministic arithmetic
    * discipline as the rest of [[Dsp]]. */
  def logMelEnergies(power: Array[Double], sampleRate: Int,
      fftSize: Int, nMels: Int): Array[Double] = {
    require(nMels > 0)
    val half = fftSize / 2
    val binHz = sampleRate.toDouble / fftSize
    val maxMel = hzToMel(sampleRate / 2.0)
    // filter m spans mel centers m-1 .. m+1 on an nMels+2 point grid
    val centers = Array.tabulate(nMels + 2)(i =>
      melToHz(i * maxMel / (nMels + 1)))
    val out = Array.ofDim[Double](nMels)
    var m = 0
    while (m < nMels) {
      val lo = centers(m); val c = centers(m + 1); val hi = centers(m + 2)
      var e = 0.0
      var k = 1
      while (k <= half) {
        val f = k * binHz
        val w =
          if (f <= lo || f >= hi) 0.0
          else if (f <= c) (f - lo) / (c - lo)
          else (hi - f) / (hi - c)
        e += w * power(k)
        k += 1
      }
      out(m) = StrictMath.log(e + 1e-12)
      m += 1
    }
    out
  }

  /** MFCCs — the DCT-II of the log-mel energies, the classic compact
    * audio-ML feature (the step [[logMelEnergies]] stops short of).
    * Orthonormal DCT-II with fixed-order StrictMath arithmetic, so
    * coefficients are bit-deterministic like everything else here.
    * `nCoeffs` ≤ nMels; coefficient 0 carries overall log-energy. */
  def mfcc(logMel: Array[Double], nCoeffs: Int): Array[Double] = {
    val n = logMel.length
    require(nCoeffs > 0 && nCoeffs <= n)
    val out = Array.ofDim[Double](nCoeffs)
    var k = 0
    while (k < nCoeffs) {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += logMel(i) *
          StrictMath.cos(StrictMath.PI * k * (2 * i + 1) / (2.0 * n))
        i += 1
      }
      val scale = if (k == 0) StrictMath.sqrt(1.0 / n)
        else StrictMath.sqrt(2.0 / n)
      out(k) = s * scale
      k += 1
    }
    out
  }

  /** Spectral summary of a power spectrum over bins 1..n/2 (DC
    * excluded everywhere): (dominantBin, centroidHz, rolloffHz,
    * flatness, bandEnergies). `rolloff` is the lowest frequency below
    * which `rolloffFrac` of the non-DC energy lies; `flatness` is the
    * geometric/arithmetic mean ratio (1 = white, →0 = tonal);
    * `bandEnergies` are energy fractions over `bands` equal-width
    * bins. Ties in the peak resolve to the LOWEST bin. */
  def spectralSummary(power: Array[Double], sampleRate: Int,
      fftSize: Int, bands: Int, rolloffFrac: Double = 0.85)
      : (Int, Double, Double, Double, Array[Double]) = {
    val half = fftSize / 2
    val binHz = sampleRate.toDouble / fftSize
    var dom = 1
    var total = 0.0
    var centNum = 0.0
    var logSum = 0.0
    var k = 1
    while (k <= half) {
      val p = power(k)
      if (p > power(dom)) dom = k
      total += p
      centNum += k * binHz * p
      logSum += StrictMath.log(p + 1e-300)
      k += 1
    }
    val centroid = if (total > 0) centNum / total else 0.0
    var cum = 0.0
    var roll = half
    var found = false
    k = 1
    while (k <= half && !found) {
      cum += power(k)
      if (cum >= rolloffFrac * total && total > 0) { roll = k; found = true }
      k += 1
    }
    val flat = if (total > 0)
      StrictMath.exp(logSum / half) / (total / half) else 0.0
    val be = Array.ofDim[Double](bands)
    k = 1
    while (k <= half) {
      val b = math.min(bands - 1, (k - 1) * bands / half)
      be(b) += power(k)
      k += 1
    }
    if (total > 0) { var b = 0; while (b < bands) { be(b) /= total; b += 1 } }
    (dom, centroid, roll * binHz, flat, be)
  }
}
