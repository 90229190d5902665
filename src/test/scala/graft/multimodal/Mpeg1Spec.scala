package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class Mpeg1Spec extends AnyFunSuite {

  test("B.14 VLC table decodes published code words across all lengths") {
    // one representative per code length; sign bit appended (0 = +)
    // 11+0 -> (0,1); 011+1 -> (1,-1); 0100+0 -> (0,2); 00111+0 -> (3,1)
    val a = Mpeg1.decodeAcPairsForTest("110 0111 01000 001110 10")
    assert(a == Seq((0, 1), (1, -1), (0, 2), (3, 1)))
    // 6-bit 000101 -> (6,1); 7-bit 0000110 -> (0,4); 8-bit 00100110
    // -> (0,5)
    val b = Mpeg1.decodeAcPairsForTest("0001010 00001101 001001100 10")
    assert(b == Seq((6, 1), (0, -4), (0, 5)))
    // 10-bit 0000001010 -> (0,7); 12-bit 000000011101 -> (0,8);
    // 13-bit 0000000011111 -> (22,1)
    val c = Mpeg1.decodeAcPairsForTest(
      "00000010100 0000000111010 00000000111110 10")
    assert(c == Seq((0, 7), (0, 8), (22, 1)))
    // 14-bit 00000000011111 -> (0,16); 15-bit 000000000011000 ->
    // (0,32); 16-bit 0000000000011011 -> (31,1) negative
    val d = Mpeg1.decodeAcPairsForTest(
      "000000000111110 0000000000110000 00000000000110111 10")
    assert(d == Seq((0, 16), (0, 32), (31, -1)))
  }

  test("flat picture round-trips with at most quantization-of-one error") {
    val p = Mpeg1.grayPicture(32, 32, (_, _) => 160)
    val stream = Mpeg1.encodeIntra(Seq(p), qScale = 4)
    assert(Mpeg1.isMpeg1Video(stream))
    val Some((rate, pics)) = Mpeg1.decodeIPictures(stream, 8)
    assert(rate == 25.0 && pics.length == 1)
    val q = pics.head
    assert(q.width == 32 && q.height == 32)
    // flat block = DC only, DC step 8 -> error bounded by DC rounding
    assert(q.y.forall(v => math.abs(v - 160) <= 4),
      s"max err ${q.y.map(v => math.abs(v - 160)).max}")
    assert(q.cb.forall(v => math.abs(v - 128) <= 4))
  }

  test("smooth gradient survives DCT quantization within tight bounds") {
    val p = Mpeg1.grayPicture(48, 32,
      (x, y) => 40 + 3 * x + 2 * y)
    val stream = Mpeg1.encodeIntra(Seq(p), qScale = 2)
    val Some((_, pics)) = Mpeg1.decodeIPictures(stream, 8)
    val q = pics.head
    val errs = (0 until 48 * 32).map(i => math.abs(q.y(i) - p.y(i)))
    // qScale 2 on a band-limited ramp: small per-pixel error, tiny mean
    assert(errs.max <= 12, s"max err ${errs.max}")
    assert(errs.sum.toDouble / errs.length <= 3.0,
      s"mean err ${errs.sum.toDouble / errs.length}")
  }

  test("busy texture exercises AC escapes and many blocks per slice") {
    // deterministic pseudo-noise: every macroblock gets real AC energy
    val p = Mpeg1.grayPicture(64, 48,
      (x, y) => 128 + (((x * 37 + y * 91) % 97) - 48))
    val stream = Mpeg1.encodeIntra(Seq(p), qScale = 3)
    val Some((_, pics)) = Mpeg1.decodeIPictures(stream, 8)
    val q = pics.head
    val errs = (0 until 64 * 48).map(i => math.abs(q.y(i) - p.y(i)))
    assert(errs.max <= 40, s"max err ${errs.max}") // noise quantizes hard
    assert(errs.sum.toDouble / errs.length <= 8.0,
      s"mean err ${errs.sum.toDouble / errs.length}")
  }

  test("multi-frame stream: frame count, rate code, timestamps") {
    val frames = (0 until 4).map(i =>
      Mpeg1.grayPicture(16, 16, (_, _) => 60 + i * 40))
    val stream = Mpeg1.encodeIntra(frames, frameRateCode = 5) // 30 fps
    val Some((rate, pics)) = Mpeg1.decodeIPictures(stream, 16)
    assert(rate == 30.0 && pics.length == 4)
    // each decoded frame tracks its source mean
    pics.zipWithIndex.foreach { case (p, i) =>
      val mean = p.y.sum.toDouble / p.y.length
      assert(math.abs(mean - (60 + i * 40)) <= 4, s"frame $i: $mean")
    }
    // decodeFrames: evenly spaced over the SOURCE indices (0 and 3 of
    // 4), timestamps from the source position on the 30 fps clock
    val Some(sampled) = Mpeg1.decodeFrames(stream, maxFrames = 2)
    assert(sampled.length == 2)
    assert(sampled.head._1 == 0.0 && sampled(1)._1 == 3 / 30.0)
    sampled.foreach { case (_, png) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == 16 && img.getHeight == 16)
    }
  }

  test("non-multiple-of-16 dimensions crop correctly") {
    val p = Mpeg1.grayPicture(20, 12, (x, y) => 10 * (x % 8) + y)
    val stream = Mpeg1.encodeIntra(Seq(p), qScale = 2)
    val Some((_, pics)) = Mpeg1.decodeIPictures(stream, 4)
    val q = pics.head
    assert(q.width == 20 && q.height == 12)
    assert(q.y.length == 20 * 12)
    val errs = (0 until 20 * 12).map(i => math.abs(q.y(i) - p.y(i)))
    assert(errs.max <= 14, s"max err ${errs.max}")
  }

  test("decoder rejects non-MPEG payloads and truncated streams") {
    assert(Mpeg1.decodeIPictures("not a video".getBytes, 4).isEmpty)
    assert(Mpeg1.decodeIPictures(Array[Byte](0, 0, 1), 4).isEmpty)
    val p = Mpeg1.grayPicture(16, 16, (_, _) => 99)
    val stream = Mpeg1.encodeIntra(Seq(p))
    // truncation mid-slice must not throw; header-only prefix -> None
    assert(Mpeg1.decodeIPictures(stream.take(16), 4).isEmpty)
    val cut = Mpeg1.decodeIPictures(stream.take(stream.length / 2), 4)
    assert(cut.isEmpty || cut.get._2.nonEmpty) // no crash either way
  }

  test("user_data between picture header and first slice is skipped, " +
      "not fatal") {
    val p = Mpeg1.grayPicture(16, 16, (x, y) => 50 + 3 * x + 2 * y)
    val stream = Mpeg1.encodeIntra(Seq(p), qScale = 2)
    // splice a user_data unit (00 00 01 B2 + payload) in front of the
    // first slice start code (00 00 01 01) — legal picture() syntax
    val sliceAt = stream.indices.indexWhere(i =>
      i + 3 < stream.length && stream(i) == 0 && stream(i + 1) == 0 &&
        stream(i + 2) == 1 && stream(i + 3) == 0x01)
    assert(sliceAt > 0)
    val userData = Array[Byte](0, 0, 1, 0xb2.toByte, 'h', 'i', 7)
    val spliced = stream.take(sliceAt) ++ userData ++
      stream.drop(sliceAt)
    val Some((_, pics)) = Mpeg1.decodeIPictures(spliced, 4)
    val clean = Mpeg1.decodeIPictures(stream, 4).get._2.head
    assert(pics.length == 1 &&
      java.util.Arrays.equals(pics.head.y, clean.y),
      "user_data must be transparent to the decode")
  }

  test("fuzz: random corruption of a valid stream never throws") {
    val p = Mpeg1.grayPicture(32, 32,
      (x, y) => 128 + (((x * 11 + y * 5) % 37) - 18))
    val stream = Mpeg1.encodeIntra(Seq(p, p), qScale = 3)
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { trial =>
      val bad = stream.clone()
      // flip 1-8 random bytes (headers, tables, coefficients alike)
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      }
      // must return Some or None, never throw — a corrupt payload in
      // a 100 TB corpus cannot be allowed to kill the task
      Mpeg1.decodeIPictures(bad, 4)
      val cut = bad.take(rnd.nextInt(bad.length))
      Mpeg1.decodeIPictures(cut, 4)
    }
  }

  test("decode is deterministic bit-for-bit") {
    val p = Mpeg1.grayPicture(32, 32,
      (x, y) => 128 + (((x * 13 + y * 7) % 31) - 15))
    val stream = Mpeg1.encodeIntra(Seq(p), qScale = 2)
    val a = Mpeg1.decodeIPictures(stream, 4).get._2.head
    val b = Mpeg1.decodeIPictures(stream, 4).get._2.head
    assert(java.util.Arrays.equals(a.y, b.y) &&
      java.util.Arrays.equals(a.cb, b.cb) &&
      java.util.Arrays.equals(a.cr, b.cr))
  }
}
