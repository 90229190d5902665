package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Proofs for the baseline H.264 intra codec. The decoder's reference
  * is the encoder's own reconstruction (the spec's decoder output is
  * deterministic, so encode→decode must reproduce it EXACTLY); the
  * CAVLC entropy layer is additionally pinned by the published
  * Richardson worked example, and every VLC table is checked
  * prefix-free (the transcription-error class that would corrupt
  * decode shows up as a prefix collision or a duplicate). */
class H264Spec extends AnyFunSuite {

  private val rng = new scala.util.Random(0x4264)

  private def mkPicture(w: Int, h: Int, lum: (Int, Int) => Int,
      cbF: (Int, Int) => Int = (_, _) => 128,
      crF: (Int, Int) => Int = (_, _) => 128): Mpeg1.Picture = {
    def clamp(v: Int) = math.max(0, math.min(255, v))
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    Mpeg1.Picture(w, h,
      Array.tabulate(w * h)(i => clamp(lum(i % w, i / w))),
      Array.tabulate(cw * ch)(i => clamp(cbF(i % cw, i / cw))),
      Array.tabulate(cw * ch)(i => clamp(crF(i % cw, i / cw))))
  }

  private def assertSamePicture(a: Mpeg1.Picture, b: Mpeg1.Picture,
      tag: String): Unit = {
    assert(a.width == b.width && a.height == b.height, tag)
    assert(java.util.Arrays.equals(a.y, b.y), s"$tag luma")
    assert(java.util.Arrays.equals(a.cb, b.cb), s"$tag cb")
    assert(java.util.Arrays.equals(a.cr, b.cr), s"$tag cr")
  }

  // ---------------------------------------------------------------
  // bit layer
  // ---------------------------------------------------------------

  test("Exp-Golomb ue/se round-trip over fuzzed values") {
    val bw = new H264.BitWriter
    val ues = Seq(0, 1, 2, 3, 25, 47, 255, 65535) ++
      Seq.fill(50)(rng.nextInt(1 << 20))
    val ses = Seq(0, 1, -1, 2, -2, 26, -26) ++
      Seq.fill(50)(rng.nextInt(1 << 16) - (1 << 15))
    ues.foreach(bw.ue)
    ses.foreach(bw.se)
    val br = new H264.BitReader(bw.bytes)
    ues.foreach(v => assert(br.ue() == v))
    ses.foreach(v => assert(br.se() == v))
  }

  test("emulation prevention escapes start codes and round-trips") {
    val payloads = Seq(
      Array[Byte](0, 0, 0, 0, 0, 1, 2, 3),
      Array[Byte](0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0, 0),
      Array.fill(64)(0.toByte),
      Array.tabulate(200)(i => (i * 37).toByte)) ++
      Seq.fill(20)(Array.fill(rng.nextInt(40) + 1)(rng.nextInt(4).toByte))
    payloads.foreach { p =>
      val esc = H264.escapeRbsp(p)
      // no 00 00 0x sequence with x <= 3 survives except via escapes
      (0 until esc.length - 2).foreach { i =>
        assert(!(esc(i) == 0 && esc(i + 1) == 0 &&
          (esc(i + 2) & 0xff) <= 2), s"unescaped start code at $i")
      }
      assert(H264.unescapeRbsp(esc, 0, esc.length).toSeq == p.toSeq)
    }
  }

  // ---------------------------------------------------------------
  // CAVLC entropy layer
  // ---------------------------------------------------------------

  test("CAVLC residual encodes the published Richardson example bits") {
    // Richardson, "H.264 and MPEG-4 Video Compression": block
    // 0,3,0,1,-1,-1,0,1,0..., nC = 0 encodes to
    // 000010001110010111101101 and decodes back.
    val coeffs = Array(0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0)
    val bw = new H264.BitWriter
    val tc = H264.writeResidualBlock(bw, coeffs, nC = 0)
    assert(tc == 5)
    val bits = bw.bytes.flatMap(b =>
      (7 to 0 by -1).map(i => ('0' + ((b >> i) & 1)).toChar))
      .mkString.take(24)
    assert(bits == "000010001110010111101101")
    val br = new H264.BitReader(bw.bytes)
    val (dec, dtc) = H264.readResidualBlock(br, nC = 0, maxNumCoeff = 16)
    assert(dtc == 5 && dec.toSeq == coeffs.toSeq)
  }

  test("CAVLC round-trips fuzzed blocks across all nC contexts") {
    val nCs = Seq(-1, 0, 1, 2, 3, 4, 7, 8, 16)
    for (_ <- 1 to 400) {
      val nC = nCs(rng.nextInt(nCs.length))
      val maxNumCoeff = if (nC == -1) 4 else if (rng.nextBoolean()) 16 else 15
      val density = rng.nextDouble()
      val coeffs = Array.tabulate(maxNumCoeff) { _ =>
        if (rng.nextDouble() < density) {
          val mag = 1 + rng.nextInt(if (rng.nextBoolean()) 3 else 40)
          if (rng.nextBoolean()) mag else -mag
        } else 0
      }
      val bw = new H264.BitWriter
      H264.writeResidualBlock(bw, coeffs, nC)
      bw.write(1, 1) // stop bit padding
      val br = new H264.BitReader(bw.bytes)
      val (dec, _) = H264.readResidualBlock(br, nC, maxNumCoeff)
      assert(dec.toSeq == coeffs.toSeq,
        s"nC=$nC coeffs=${coeffs.mkString(",")} got=${dec.mkString(",")}")
    }
  }

  test("all VLC tables are prefix-free with full symbol counts") {
    def checkPrefixFree(codes: Iterable[String], tag: String): Unit = {
      val cs = codes.toSeq
      assert(cs.distinct.size == cs.size, s"$tag duplicate codes")
      for (a <- cs; b <- cs if a != b)
        assert(!b.startsWith(a), s"$tag: '$a' prefixes '$b'")
    }
    H264.coeffTokenTablesForTest.zipWithIndex.foreach { case (t, i) =>
      val expected = if (i == 3) 14 else 62 // chroma DC: tc<=4, t1<=3
      assert(t.size == expected, s"coeff_token table $i size ${t.size}")
      t.keys.foreach { case (tc, t1) =>
        assert(t1 <= 3 && t1 <= tc && tc <= (if (i == 3) 4 else 16))
      }
      checkPrefixFree(t.values, s"coeff_token[$i]")
    }
    H264.totalZerosTablesForTest.zipWithIndex.foreach { case (t, tc) =>
      if (t != null) {
        assert(t.size == 17 - tc, s"total_zeros[$tc] size ${t.size}")
        checkPrefixFree(t.values, s"total_zeros[$tc]")
      }
    }
    H264.totalZerosChromaDcForTest.zipWithIndex.foreach { case (t, tc) =>
      if (t != null) {
        assert(t.size == 4 - tc + 1, s"chroma total_zeros[$tc]")
        checkPrefixFree(t.values, s"chroma_total_zeros[$tc]")
      }
    }
    H264.runBeforeTablesForTest.zipWithIndex.foreach { case (t, zl) =>
      if (t != null) checkPrefixFree(t.values, s"run_before[$zl]")
    }
  }

  // ---------------------------------------------------------------
  // intra prediction formulas (hand-computed references)
  // ---------------------------------------------------------------

  test("4x4 vertical/horizontal/DC prediction match hand math") {
    // 8x8 plane, predict the block at (4,4): above row holds 10..17,
    // left column 50,60,70,80
    val plane = Array.ofDim[Int](64)
    (0 until 8).foreach(x => plane(3 * 8 + x) = 10 + x) // row y=3
    (4 until 8).foreach(y => plane(y * 8 + 3) = 50 + (y - 4) * 10)
    val v = H264.predict4x4(0, plane, 8, 4, 4, availL = true,
      availA = true, availAL = true, availAR = false)
    assert(v.toSeq == Seq(14, 15, 16, 17, 14, 15, 16, 17,
      14, 15, 16, 17, 14, 15, 16, 17))
    val hP = H264.predict4x4(1, plane, 8, 4, 4, availL = true,
      availA = true, availAL = true, availAR = false)
    assert(hP.toSeq == Seq(50, 50, 50, 50, 60, 60, 60, 60,
      70, 70, 70, 70, 80, 80, 80, 80))
    val dc = H264.predict4x4(2, plane, 8, 4, 4, availL = true,
      availA = true, availAL = true, availAR = false)
    // (14+15+16+17 + 50+60+70+80 + 4) >> 3 = (322+4)>>3 = 40
    assert(dc.forall(_ == 40))
    val dcNone = H264.predict4x4(2, plane, 8, 4, 4, availL = false,
      availA = false, availAL = false, availAR = false)
    assert(dcNone.forall(_ == 128))
  }

  test("4x4 diagonal down-left with above-right substitution") {
    // above row 1,2,3,4 with above-right unavailable: E..H = 4
    val plane = Array.ofDim[Int](64)
    (0 until 4).foreach(x => plane(3 * 8 + 4 + x) = x + 1)
    val p = H264.predict4x4(3, plane, 8, 4, 4, availL = false,
      availA = true, availAL = false, availAR = false)
    // p(0,0) = (a0 + 2a1 + a2 + 2) >> 2 = (1+4+3+2)>>2 = 2
    assert(p(0) == 2)
    // bottom-right = (a6 + 3*a7 + 2) >> 2 with a6=a7=4 -> 4
    assert(p(15) == 4)
    // all samples beyond x+y>=4 use the replicated 4
    assert(p(3 * 4 + 3) == 4)
  }

  test("16x16 DC and plane prediction match hand math") {
    val plane = Array.ofDim[Int](32 * 32)
    (0 until 16).foreach(x => plane(15 * 32 + 16 + x) = 100) // above
    (16 until 32).foreach(y => plane(y * 32 + 15) = 50) // left
    val dc = H264.predict16x16(2, plane, 32, 16, 16, availL = true,
      availA = true)
    assert(dc.forall(_ == ((16 * 100 + 16 * 50 + 16) >> 5)))
    val dcA = H264.predict16x16(2, plane, 32, 16, 16, availL = false,
      availA = true)
    assert(dcA.forall(_ == ((16 * 100 + 8) >> 4)))
    // plane over a linear ramp reproduces the ramp
    val ramp = Array.tabulate(32 * 32)((i: Int) => (i % 32) * 2)
    val pl = H264.predict16x16(3, ramp, 32, 16, 16, availL = true,
      availA = true)
    (0 until 16).foreach { x =>
      assert(math.abs(pl(5 * 16 + x) - (16 + x) * 2) <= 2,
        s"plane x=$x got ${pl(5 * 16 + x)}")
    }
  }

  // ---------------------------------------------------------------
  // transform layer
  // ---------------------------------------------------------------

  test("forward+quant then dequant+inverse is identity at QP where " +
      "scales multiply to a power of two times small error") {
    // exactness is not expected (lossy); but a zero residual block
    // must round-trip to zero, and DC-only blocks stay DC-only
    val zeros = Array.ofDim[Int](16)
    val w = H264Transform.ftransform4x4(zeros)
    assert(H264Transform.quant4x4(w, 20, 0).forall(_ == 0))
    val flat = Array.fill(16)(40)
    val wf = H264Transform.ftransform4x4(flat)
    assert(wf(0) == 40 * 16 && wf.drop(1).forall(_ == 0))
  }

  // ---------------------------------------------------------------
  // full round-trips: decoder must equal encoder reconstruction
  // ---------------------------------------------------------------

  test("I_PCM streams decode to the input exactly (lossless)") {
    val p = mkPicture(48, 32, (x, y) => (x * 7 + y * 13) % 256,
      (x, y) => 100 + x, (x, y) => 150 - y)
    val bytes = H264.encodeIntra(Seq(p), qp = 26, mbMode = "pcm")
    assert(H264.isAnnexB(bytes))
    val Some((rate, pics)) = H264.decodeIPictures(bytes, 4)
    assert(rate == 25.0 && pics.length == 1)
    assertSamePicture(pics.head, p, "pcm")
  }

  test("I_16x16 decode equals encoder reconstruction exactly; " +
      "distortion bounded at low QP") {
    val p = mkPicture(64, 48, (x, y) => 60 + x + y,
      (x, y) => 90 + 2 * x, (x, y) => 200 - 3 * y)
    val (bytes, recon) = H264.encodeWithRecon(Seq(p), qp = 12)
    val Some((_, pics)) = H264.decodeIPictures(bytes, 4)
    assert(pics.length == 1)
    assertSamePicture(pics.head, recon.head, "i16")
    val maxErr = pics.head.y.zip(p.y).map {
      case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 8, s"i16 distortion $maxErr")
  }

  test("I_4x4 decode equals encoder reconstruction exactly") {
    val p = mkPicture(48, 48,
      (x, y) => 128 + (math.sin(x * 0.4) * 50).toInt +
        (math.cos(y * 0.3) * 40).toInt,
      (x, y) => 80 + 3 * x, (x, y) => 170 - 2 * y)
    val (bytes, recon) = H264.encodeWithRecon(Seq(p), qp = 16,
      mbMode = "i4")
    val Some((_, pics)) = H264.decodeIPictures(bytes, 4)
    assert(pics.length == 1)
    assertSamePicture(pics.head, recon.head, "i4")
  }

  test("mixed MB modes, multiple frames, cropped dimensions — " +
      "fuzzed decode == reconstruction") {
    for (trial <- 1 to 12) {
      val w = 2 * (8 + rng.nextInt(30)) // 16..74, even, crops freely
      val h = 2 * (8 + rng.nextInt(22))
      val qp = 10 + rng.nextInt(35)
      val mode = Seq("i16", "i4", "pcm", "mixed")(trial % 4)
      val frames = (0 until 1 + rng.nextInt(3)).map { f =>
        mkPicture(w, h,
          (x, y) => rng.nextInt(256),
          (x, y) => rng.nextInt(256), (x, y) => rng.nextInt(256))
      }
      val (bytes, recon) =
        H264.encodeWithRecon(frames, qp = qp, mbMode = mode)
      val Some((_, pics)) = H264.decodeIPictures(bytes, 16)
      assert(pics.length == frames.length,
        s"trial $trial: ${pics.length} != ${frames.length} " +
          s"(w=$w h=$h qp=$qp mode=$mode)")
      pics.zip(recon).zipWithIndex.foreach { case ((d, r), i) =>
        assertSamePicture(d, r, s"trial $trial frame $i w=$w h=$h " +
          s"qp=$qp mode=$mode")
      }
    }
  }

  test("frame rate is read from VUI timing; frame times follow it") {
    val p = mkPicture(32, 32, (x, y) => 4 * x + y)
    val bytes = H264.encodeIntra(Seq(p, p, p), qp = 20, fps = 30)
    val Some((rate, pics)) = H264.decodeIPictures(bytes, 8)
    assert(rate == 30.0 && pics.length == 3)
    val Some(frames) = H264.decodeFrames(bytes, 3)
    assert(frames.map(_._1) == Seq(0.0, 1 / 30.0, 2 / 30.0))
    // default 25 fps path (0.04 s spacing, the q75 oracle contract)
    val b25 = H264.encodeIntra(Seq(p, p), qp = 20)
    val Some(f25) = H264.decodeFrames(b25, 2)
    assert(f25.map(_._1) == Seq(0.0, 0.04))
  }

  test("corrupt, truncated and foreign payloads return None, never throw") {
    val p = mkPicture(32, 32, (x, y) => x * y % 256)
    val good = H264.encodeIntra(Seq(p), qp = 20, mbMode = "mixed")
    assert(H264.decodeFrames(Array.emptyByteArray, 4).isEmpty)
    assert(H264.decodeFrames("not a video".getBytes, 4).isEmpty)
    // truncations at every byte boundary in a stride
    (1 until good.length by 7).foreach { n =>
      H264.decodeFrames(good.take(n), 4) // must not throw
    }
    // single-byte corruptions
    (0 until 200).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      H264.decodeFrames(bad, 4) // must not throw
    }
    // MPEG-1 payloads are not claimed
    val m = Mpeg1.encodeIntra(Seq(Mpeg1.grayPicture(32, 32,
      (_, _) => 100)))
    assert(!H264.isAnnexB(m))
  }

  test("non-reference I slice (nal_ref_idc=0) decodes: no " +
      "dec_ref_pic_marking syntax is read (7.3.3)") {
    // external encoders emit non-IDR, non-reference I slices
    // (nal header 0x01) whose headers carry NO dec_ref_pic_marking;
    // splitAnnexB must surface nal_ref_idc for the header parse to
    // skip it. Fixture: encoder's own SPS/PPS + a hand-written
    // one-PCM-macroblock type-1/refIdc-0 slice for a 16x16 frame.
    val p = mkPicture(16, 16, (x, y) => (x * 17 + y * 5) % 256,
      (x, y) => 30 + x + y, (x, y) => 200 - x - y)
    val (stream, _) = H264.encodeWithRecon(Seq(p), mbMode = "pcm")
    val idrAt = stream.indexOfSlice(Array[Byte](0, 0, 0, 1, 0x65))
    assert(idrAt > 0, "encoder stream should hold one IDR NAL")
    val paramSets = stream.take(idrAt)
    val bw = new H264.BitWriter
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type I
    bw.ue(0) // pps id
    bw.write(0, 4) // frame_num (log2_max_frame_num = 4)
    // pocType=2 in the encoder SPS: no POC syntax; nal_ref_idc=0:
    // NO dec_ref_pic_marking here — the bits that follow are already
    // slice_qp_delta
    bw.se(0) // slice_qp_delta
    bw.ue(1) // disable_deblocking_filter_idc (control present in PPS)
    bw.ue(25); bw.align() // I_PCM
    p.y.foreach(v => bw.write(v, 8))
    p.cb.foreach(v => bw.write(v, 8))
    p.cr.foreach(v => bw.write(v, 8))
    bw.trailing()
    val nonRef = paramSets ++ Array[Byte](0, 0, 0, 1, 0x01) ++
      H264.escapeRbsp(bw.bytes)
    val Some((_, pics)) = H264.decodeIPictures(nonRef, 4)
    assert(pics.length == 1)
    assertSamePicture(pics.head, p, "non-ref I slice")
  }
}
