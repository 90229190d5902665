package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DspSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def naiveDft(re: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re.length
    val or = Array.ofDim[Double](n)
    val oi = Array.ofDim[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      or(k) += re(t) * StrictMath.cos(ang)
      oi(k) += re(t) * StrictMath.sin(ang)
    }
    (or, oi)
  }

  test("fft matches the naive DFT on random signals (n = 8..128)") {
    val rnd = new scala.util.Random(99)
    for (n <- Seq(8, 32, 128)) {
      val sig = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val re = sig.clone(); val im = Array.ofDim[Double](n)
      Dsp.fft(re, im)
      val (er, ei) = naiveDft(sig)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-9 * n, s"re n=$n k=$k")
        assert(math.abs(im(k) - ei(k)) < 1e-9 * n, s"im n=$n k=$k")
      }
    }
  }

  test("fft satisfies Parseval's theorem") {
    val rnd = new scala.util.Random(7)
    val n = 256
    val sig = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = sig.clone(); val im = Array.ofDim[Double](n)
    Dsp.fft(re, im)
    val timeE = sig.map(x => x * x).sum
    val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeE - freqE) < 1e-8 * n)
  }

  test("an exact-bin sine concentrates its power in that bin") {
    val n = 1024
    val sr = 8000
    val k = 37 // frequency k * sr / n, exactly on a bin
    val samples = Array.tabulate(4096)(i =>
      StrictMath.sin(2.0 * math.Pi * k * i / n))
    val pow = Dsp.averagePowerSpectrum(samples, n, maxWindows = 4)
    val (dom, cent, roll, flat, be) = Dsp.spectralSummary(pow, sr, n, 8)
    assert(dom == k, s"dominant bin $dom != $k")
    // centroid and rolloff sit at the tone (Hann leakage spreads ±2
    // bins); flatness is near zero for a pure tone
    val binHz = sr.toDouble / n
    assert(math.abs(cent - k * binHz) < 3 * binHz, s"centroid $cent")
    assert(math.abs(roll - k * binHz) < 3 * binHz, s"rolloff $roll")
    assert(flat < 1e-6, s"flatness $flat")
    // all the band energy lands in the tone's band
    assert(be((k - 1) * 8 / (n / 2)) > 0.99)
  }

  test("flatness orders white noise above a pure tone") {
    val rnd = new scala.util.Random(5)
    val noise = Array.fill(4096)(rnd.nextDouble() * 2 - 1)
    val tone = Array.tabulate(4096)(i =>
      StrictMath.sin(2.0 * math.Pi * 100 * i / 1024))
    def flat(s: Array[Double]) =
      Dsp.spectralSummary(Dsp.averagePowerSpectrum(s, 1024, 4),
        8000, 1024, 8)._4
    assert(flat(noise) > 0.3 && flat(tone) < 1e-6)
  }

  test("logMelEnergies: a tone peaks in the band containing its mel") {
    val sr = 8000
    val n = 1024
    for (k <- Seq(30, 120, 400)) { // 234 Hz, 937 Hz, 3125 Hz
      val tone = Array.tabulate(4096)(i =>
        StrictMath.sin(2.0 * math.Pi * k * i / n))
      val pow = Dsp.averagePowerSpectrum(tone, n, 4)
      val mel = Dsp.logMelEnergies(pow, sr, n, 16)
      val fHz = k.toDouble * sr / n
      // the winning band's center must be the closest (or adjacent)
      // to the tone on the mel scale
      val maxMel = Dsp.hzToMel(sr / 2.0)
      val centers = Array.tabulate(16)(m =>
        Dsp.melToHz((m + 1) * maxMel / 17))
      val win = mel.indices.maxBy(mel(_))
      val nearest = centers.indices.minBy(m =>
        math.abs(Dsp.hzToMel(centers(m)) - Dsp.hzToMel(fHz)))
      assert(math.abs(win - nearest) <= 1,
        s"k=$k tone ${fHz}Hz won band $win, nearest center $nearest")
    }
    // monotone mel scale round-trip
    assert(math.abs(Dsp.melToHz(Dsp.hzToMel(1234.5)) - 1234.5) < 1e-6)
  }

  test("wavSamples round-trips encodePcm16Wav, folds stereo") {
    val mono = Multimodal.encodePcm16Wav(8000, 1,
      Array[Short](0, 16384, -16384, 32767))
    val (sr, s) = Multimodal.wavSamples(mono).get
    assert(sr == 8000 && s.length == 4)
    assert(math.abs(s(1) - 0.5) < 1e-4 && math.abs(s(2) + 0.5) < 1e-4)
    val stereo = Multimodal.encodePcm16Wav(44100, 2,
      Array[Short](16384, -16384, 8192, 8192))
    val (sr2, s2) = Multimodal.wavSamples(stereo).get
    assert(sr2 == 44100 && s2.length == 2)
    assert(math.abs(s2(0)) < 1e-4) // L+R cancel
    assert(math.abs(s2(1) - 0.25) < 1e-4)
    assert(Multimodal.wavSamples("not a wav".getBytes).isEmpty)
  }

  test("extractAudioSpectral finds each row's planted tone, drops " +
      "unparseable rows, deterministic under repartitioning") {
    import spark.implicits._
    val sr = 8000
    val n = 1024
    def toneWav(k: Int): Array[Byte] =
      Multimodal.encodePcm16Wav(sr, 1, Array.tabulate[Short](2048)(i =>
        (StrictMath.sin(2.0 * math.Pi * k * i / n) * 12000).toShort))
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", toneWav(25), 0, 0, 1.0),
      Multimodal.MediaRow(2L, "audio", toneWav(200), 0, 0, 1.0),
      Multimodal.MediaRow(3L, "audio", "garbage bytes".getBytes, 0, 0, 1.0),
      Multimodal.MediaRow(4L, "video", toneWav(25), 0, 0, 1.0))
    val out = Multimodal.extractAudioSpectral(rows.toDS())
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(out(0).dom_bin == 25 && out(1).dom_bin == 200)
    assert(out(0).dominant_hz == 25.0 * sr / n)
    assert(out.forall(_.band_energy.sum > 0.999))
    val out2 = Multimodal.extractAudioSpectral(
      rows.toDS().repartition(3)).collect().sortBy(_.media_id)
    assert(out.map(r => (r.media_id, r.dom_bin, r.centroid_hz)).toSeq ==
      out2.map(r => (r.media_id, r.dom_bin, r.centroid_hz)).toSeq)
    // mfcc column rides along: 13 coefficients, bit-deterministic
    assert(out.forall(_.mfcc.length == 13))
    assert(out.map(_.mfcc.toSeq).toSeq == out2.map(_.mfcc.toSeq).toSeq)
  }

  test("mfcc: orthonormal DCT-II — constant input excites only c0, " +
      "full transform preserves energy, tonal vs flat separation") {
    val const = Array.fill(16)(2.5)
    val c = Dsp.mfcc(const, 16)
    assert(math.abs(c(0) - 2.5 * StrictMath.sqrt(16.0)) < 1e-12)
    assert(c.drop(1).forall(x => math.abs(x) < 1e-12))
    // Parseval for the orthonormal DCT: ||x||^2 == ||X||^2
    val rnd = new scala.util.Random(5)
    val x = Array.fill(16)(rnd.nextDouble() * 4 - 2)
    val full = Dsp.mfcc(x, 16)
    assert(math.abs(x.map(v => v * v).sum -
      full.map(v => v * v).sum) < 1e-9)
    // truncation yields the leading coefficients unchanged
    val head = Dsp.mfcc(x, 4)
    assert(head.toSeq == full.take(4).toSeq)
  }
}
