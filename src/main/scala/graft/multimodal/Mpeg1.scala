package graft.multimodal

/** Pure-JVM MPEG-1 video (ISO/IEC 11172-2) INTRA-frame codec — a real
  * DCT video codec with no native libraries: Huffman-coded coefficient
  * parsing (Tables B.1/B.12/B.13/B.14 + escapes), intra dequantization
  * with MPEG-1 oddification mismatch control, 8×8 IDCT, and 4:2:0
  * chroma upsampling. Decodes the I-pictures of any MPEG-1 video
  * elementary stream — P/B pictures are SKIPPED (motion compensation
  * needs reference-frame state that breaks the one-row-at-a-time batch
  * contract; I-frame sampling is exactly what a corpus frame-sampler
  * wants anyway, mirroring how production samplers seek to key
  * frames). The companion [[encodeIntra]] writes a spec-valid
  * intra-only stream (forward DCT + quantization + the same entropy
  * coding), so the decode path is round-trip-testable against
  * quantization error bounds without external fixtures.
  *
  * This closes the "video = stub" gap for the one codec family that is
  * tractable without native decoders; h264-in-mp4 remains the
  * documented stub boundary (`Multimodal.fakeDecode`).
  *
  * Determinism: all math is fixed-order double/int arithmetic (the
  * IDCT basis comes from StrictMath.cos), so decoded pixels are
  * bit-identical across JVMs and partitionings.
  */
object Mpeg1 {

  // ------------------------------------------------------------------
  // bit I/O
  // ------------------------------------------------------------------

  private final class BitReader(val data: Array[Byte]) {
    var pos = 0L // bit position
    def bitsLeft: Long = data.length.toLong * 8 - pos
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = (pos >> 3).toInt
        val bitIdx = 7 - (pos & 7).toInt
        v = (v << 1) | ((data(byteIdx) >> bitIdx) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def peek(n: Int): Int = {
      val save = pos
      val v = if (bitsLeft >= n) read(n)
        else { // zero-pad past the end: never throw on truncation
          var v2 = 0
          var i = 0
          while (i < n) {
            v2 = (v2 << 1) |
              (if (bitsLeft > 0) { val b = read(1); b } else 0)
            i += 1
          }
          v2
        }
      pos = save
      v
    }
    def byteAlign(): Unit = pos = (pos + 7) & ~7L
    /** Byte offset of the next 0x000001 start-code prefix at or after
      * the current (byte-aligned) position; -1 if none. */
    def nextStartCode(): Int = {
      byteAlign()
      var o = (pos >> 3).toInt
      while (o + 4 <= data.length) {
        if (data(o) == 0 && data(o + 1) == 0 && data(o + 2) == 1)
          return o
        o += 1
      }
      -1
    }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }
    /** zero-pad to byte boundary */
    def align(): Unit = if (nBits > 0) write(0, 8 - nBits)
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  // ------------------------------------------------------------------
  // tables (ISO/IEC 11172-2)
  // ------------------------------------------------------------------

  /** zigzag scan: zigzag index -> raster index */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** default intra quantizer matrix, raster order (11172-2 §2.4.3.2) */
  private val DefaultIntraQuant: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** picture rates for frame_rate_code 1..8 (11172-2 table 2-D.4) */
  private val FrameRates: Array[Double] = Array(0.0,
    24000.0 / 1001, 24.0, 25.0, 30000.0 / 1001, 30.0, 50.0,
    60000.0 / 1001, 60.0)

  /** Table B.1 — macroblock_address_increment: (code, bits) -> value.
    * Stored as (bits, code, value); longest code 11 bits (before the
    * escape). */
  private val AddrIncTable: Seq[(Int, Int, Int)] = Seq(
    (1, 0x1, 1),
    (3, 0x3, 2), (3, 0x2, 3),
    (4, 0x3, 4), (4, 0x2, 5),
    (5, 0x3, 6), (5, 0x2, 7),
    (7, 0x7, 8), (7, 0x6, 9),
    (8, 0xb, 10), (8, 0xa, 11), (8, 0x9, 12), (8, 0x8, 13),
    (8, 0x7, 14), (8, 0x6, 15),
    (10, 0x17, 16), (10, 0x16, 17), (10, 0x15, 18), (10, 0x14, 19),
    (10, 0x13, 20), (10, 0x12, 21),
    (11, 0x23, 22), (11, 0x22, 23), (11, 0x21, 24), (11, 0x20, 25),
    (11, 0x1f, 26), (11, 0x1e, 27), (11, 0x1d, 28), (11, 0x1c, 29),
    (11, 0x1b, 30), (11, 0x1a, 31), (11, 0x19, 32), (11, 0x18, 33))
  private val AddrIncEscape = (11, 0x8) // macroblock_escape: +33

  /** Table B.12 — dct_dc_size_luminance */
  private val DcSizeLuma: Seq[(Int, Int, Int)] = Seq(
    (3, 0x4, 0), (2, 0x0, 1), (2, 0x1, 2), (3, 0x5, 3), (3, 0x6, 4),
    (4, 0xe, 5), (5, 0x1e, 6), (6, 0x3e, 7), (7, 0x7e, 8))

  /** Table B.13 — dct_dc_size_chrominance */
  private val DcSizeChroma: Seq[(Int, Int, Int)] = Seq(
    (2, 0x0, 0), (2, 0x1, 1), (2, 0x2, 2), (3, 0x6, 3), (4, 0xe, 4),
    (5, 0x1e, 5), (6, 0x3e, 6), (7, 0x7e, 7), (8, 0xfe, 8))

  /** Table B.14 (2-B.5c..g) — dct_coeff (run, level), sign bit
    * follows. (bits, code, run, level); code EXCLUDES the trailing
    * sign bit. Intra blocks code DC separately, so every AC here uses
    * the "not first" form: (0,1) is '11'+s and EOB '10' may appear
    * immediately. */
  private val AcTable: Seq[(Int, Int, Int, Int)] = Seq(
    (2, 0x3, 0, 1), // 11
    (3, 0x3, 1, 1), // 011
    (4, 0x4, 0, 2), // 0100
    (4, 0x5, 2, 1), // 0101
    (5, 0x5, 0, 3), // 00101
    (5, 0x7, 3, 1), // 00111
    (5, 0x6, 4, 1), // 00110
    (6, 0x6, 1, 2), // 000110
    (6, 0x7, 5, 1), // 000111
    (6, 0x5, 6, 1), // 000101
    (6, 0x4, 7, 1), // 000100
    (7, 0x6, 0, 4), // 0000110
    (7, 0x4, 2, 2), // 0000100
    (7, 0x7, 8, 1), // 0000111
    (7, 0x5, 9, 1), // 0000101
    (8, 0x26, 0, 5), (8, 0x21, 0, 6), (8, 0x25, 1, 3),
    (8, 0x24, 3, 2), (8, 0x27, 10, 1), (8, 0x23, 11, 1),
    (8, 0x22, 12, 1), (8, 0x20, 13, 1),
    (10, 0xa, 0, 7), (10, 0xc, 1, 4), (10, 0xb, 2, 3),
    (10, 0xf, 4, 2), (10, 0x9, 5, 2), (10, 0xe, 14, 1),
    (10, 0xd, 15, 1), (10, 0x8, 16, 1),
    (12, 0x1d, 0, 8), (12, 0x18, 0, 9), (12, 0x13, 0, 10),
    (12, 0x10, 0, 11), (12, 0x1b, 1, 5), (12, 0x14, 2, 4),
    (12, 0x1c, 3, 3), (12, 0x12, 4, 3), (12, 0x1e, 6, 2),
    (12, 0x15, 7, 2), (12, 0x11, 8, 2), (12, 0x1f, 17, 1),
    (12, 0x1a, 18, 1), (12, 0x19, 19, 1), (12, 0x17, 20, 1),
    (12, 0x16, 21, 1),
    (13, 0x1a, 0, 12), (13, 0x19, 0, 13), (13, 0x18, 0, 14),
    (13, 0x17, 0, 15), (13, 0x16, 1, 6), (13, 0x15, 1, 7),
    (13, 0x14, 2, 5), (13, 0x13, 3, 4), (13, 0x12, 5, 3),
    (13, 0x11, 9, 2), (13, 0x10, 10, 2), (13, 0x1f, 22, 1),
    (13, 0x1e, 23, 1), (13, 0x1d, 24, 1), (13, 0x1c, 25, 1),
    (13, 0x1b, 26, 1),
    (14, 0x1f, 0, 16), (14, 0x1e, 0, 17), (14, 0x1d, 0, 18),
    (14, 0x1c, 0, 19), (14, 0x1b, 0, 20), (14, 0x1a, 0, 21),
    (14, 0x19, 0, 22), (14, 0x18, 0, 23), (14, 0x17, 0, 24),
    (14, 0x16, 0, 25), (14, 0x15, 0, 26), (14, 0x14, 0, 27),
    (14, 0x13, 0, 28), (14, 0x12, 0, 29), (14, 0x11, 0, 30),
    (14, 0x10, 0, 31),
    (15, 0x18, 0, 32), (15, 0x17, 0, 33), (15, 0x16, 0, 34),
    (15, 0x15, 0, 35), (15, 0x14, 0, 36), (15, 0x13, 0, 37),
    (15, 0x12, 0, 38), (15, 0x11, 0, 39), (15, 0x10, 0, 40),
    (15, 0x1f, 1, 8), (15, 0x1e, 1, 9), (15, 0x1d, 1, 10),
    (15, 0x1c, 1, 11), (15, 0x1b, 1, 12), (15, 0x1a, 1, 13),
    (15, 0x19, 1, 14),
    (16, 0x13, 1, 15), (16, 0x12, 1, 16), (16, 0x11, 1, 17),
    (16, 0x10, 1, 18), (16, 0x14, 6, 3), (16, 0x1a, 11, 2),
    (16, 0x19, 12, 2), (16, 0x18, 13, 2), (16, 0x17, 14, 2),
    (16, 0x16, 15, 2), (16, 0x15, 16, 2), (16, 0x1f, 27, 1),
    (16, 0x1e, 28, 1), (16, 0x1d, 29, 1), (16, 0x1c, 30, 1),
    (16, 0x1b, 31, 1))

  // ------------------------------------------------------------------
  // VLC machinery
  // ------------------------------------------------------------------

  /** Prefix-free VLC with precomputed maxBits and flat arrays — the
    * decode runs per macroblock/block, so no per-call Seq reductions
    * or boxing (the same treatment [[AcTableArr]] gets). */
  private final class Vlc(table: Seq[(Int, Int, Int)]) {
    private val bits = table.map(_._1).toArray
    private val codes = table.map(_._2).toArray
    private val values = table.map(_._3).toArray
    private val maxBits = bits.max
    /** returns the decoded value, or Int.MinValue on no match */
    def decode(br: BitReader): Int = {
      val buf = br.peek(maxBits)
      var i = 0
      while (i < bits.length) {
        if ((buf >>> (maxBits - bits(i))) == codes(i)) {
          br.pos += bits(i)
          return values(i)
        }
        i += 1
      }
      Int.MinValue
    }
  }

  // ------------------------------------------------------------------
  // IDCT / FDCT (reference separable, StrictMath basis)
  // ------------------------------------------------------------------

  private val DctBasis: Array[Double] = {
    val b = Array.ofDim[Double](64)
    var k = 0
    while (k < 8) {
      var n = 0
      while (n < 8) {
        b(k * 8 + n) =
          StrictMath.cos((2 * n + 1) * k * StrictMath.PI / 16.0)
        n += 1
      }
      k += 1
    }
    b
  }

  private def idct8x8(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = Array.ofDim[Double](64)
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752440 else 1.0
          s += cu * in(y * 8 + u) * DctBasis(u * 8 + x)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // cols
    var x2 = 0
    while (x2 < 8) {
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752440 else 1.0
          s += cv * tmp(v * 8 + x2) * DctBasis(v * 8 + y2)
          v += 1
        }
        out(y2 * 8 + x2) = s / 2.0
        y2 += 1
      }
      x2 += 1
    }
  }

  private def fdct8x8(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = Array.ofDim[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += in(y * 8 + x) * DctBasis(u * 8 + x)
          x += 1
        }
        val cu = if (u == 0) 0.70710678118654752440 else 1.0
        tmp(y * 8 + u) = s * cu / 2.0
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var u2 = 0
      while (u2 < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          s += tmp(y * 8 + u2) * DctBasis(v * 8 + y)
          y += 1
        }
        val cv = if (v == 0) 0.70710678118654752440 else 1.0
        out(v * 8 + u2) = s * cv / 2.0
        u2 += 1
      }
      v += 1
    }
  }

  // ------------------------------------------------------------------
  // decoder
  // ------------------------------------------------------------------

  /** One decoded picture: full-resolution planes, values 0..255. */
  final case class Picture(width: Int, height: Int,
      y: Array[Int], cb: Array[Int], cr: Array[Int])

  /** True if the payload starts with an MPEG-1 video sequence header
    * start code (0x000001B3). */
  def isMpeg1Video(content: Array[Byte]): Boolean =
    content.length >= 4 && content(0) == 0 && content(1) == 0 &&
      content(2) == 1 && (content(3) & 0xff) == 0xb3

  /** Decode the I-pictures of an MPEG-1 video elementary stream.
    * Returns (frameRate, pictures) with pictures in bitstream order
    * (for intra-only streams = display order); None if the payload is
    * not MPEG-1 video or decodes to zero I-pictures. `maxPictures`
    * bounds work on long streams — parsing stops once reached. */
  def decodeIPictures(content: Array[Byte], maxPictures: Int)
      : Option[(Double, Seq[Picture])] = {
    if (!isMpeg1Video(content)) return None
    try {
      val br = new BitReader(content)
      var width = 0
      var height = 0
      var frameRate = 25.0
      var intraQuant = DefaultIntraQuant
      val pics = scala.collection.mutable.ArrayBuffer.empty[Picture]
      var done = false
      while (!done && pics.length < maxPictures) {
        val off = br.nextStartCode()
        if (off < 0) done = true
        else {
          br.pos = (off + 3).toLong * 8
          val code = br.read(8)
          code match {
            case 0xb3 => // sequence header
              width = br.read(12)
              height = br.read(12)
              br.read(4) // aspect
              val frc = br.read(4)
              if (frc >= 1 && frc <= 8) frameRate = FrameRates(frc)
              br.read(18) // bit rate
              br.read(1) // marker
              br.read(10) // vbv buffer size
              br.read(1) // constrained flag
              if (br.read(1) == 1) { // load_intra_quantiser_matrix
                val m = Array.ofDim[Int](64)
                var i = 0
                while (i < 64) { m(Zigzag(i)) = br.read(8); i += 1 }
                intraQuant = m
              }
              if (br.read(1) == 1) { // load_non_intra matrix: skip
                var i = 0
                while (i < 64) { br.read(8); i += 1 }
              }
            case 0x00 => // picture header
              br.read(10) // temporal reference
              val picType = br.read(3)
              br.read(16) // vbv delay
              if (picType == 1 && width > 0 && height > 0) {
                decodePictureSlices(br, width, height, intraQuant)
                  .foreach(pics += _)
              }
            // P (2) / B (3) pictures, user data, extensions: skip to
            // the next start code (the loop's nextStartCode does it)
            case _ => ()
          }
        }
      }
      if (pics.isEmpty) None else Some((frameRate, pics.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode all slices of the current I-picture. The reader sits just
    * past the picture header (possibly mid-byte); slices start at the
    * following start codes 0x01..0xAF. */
  private def decodePictureSlices(br: BitReader, width: Int,
      height: Int, intraQuant: Array[Int]): Option[Picture] = {
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val yPlane = Array.ofDim[Int](mbW * 16 * mbH * 16)
    val cbPlane = Array.ofDim[Int](mbW * 8 * mbH * 8)
    val crPlane = Array.ofDim[Int](mbW * 8 * mbH * 8)
    var sawSlice = false
    var done = false
    while (!done) {
      val off = br.nextStartCode()
      if (off < 0) done = true
      else {
        val code = br.data(off + 3) & 0xff
        if (code >= 0x01 && code <= 0xaf) {
          br.pos = (off + 4).toLong * 8
          decodeSlice(br, code, mbW, mbH, intraQuant,
            yPlane, cbPlane, crPlane)
          sawSlice = true
        } else if (code == 0xb2 || code == 0xb5) {
          // user_data / extension between the picture header and the
          // first slice is legal picture() syntax — skip the start
          // code and keep scanning for slices instead of dropping the
          // whole picture
          br.pos = (off + 4).toLong * 8
        } else done = true // next picture/sequence-level code
      }
    }
    if (!sawSlice) None
    else {
      // crop the macroblock canvas to the signalled size
      val y = Array.ofDim[Int](width * height)
      var r = 0
      while (r < height) {
        System.arraycopy(yPlane, r * mbW * 16, y, r * width, width)
        r += 1
      }
      val cw = (width + 1) / 2
      val ch = (height + 1) / 2
      val cb = Array.ofDim[Int](cw * ch)
      val cr = Array.ofDim[Int](cw * ch)
      var r2 = 0
      while (r2 < ch) {
        System.arraycopy(cbPlane, r2 * mbW * 8, cb, r2 * cw, cw)
        System.arraycopy(crPlane, r2 * mbW * 8, cr, r2 * cw, cw)
        r2 += 1
      }
      Some(Picture(width, height, y, cb, cr))
    }
  }

  private def decodeSlice(br: BitReader, sliceVert: Int, mbW: Int,
      mbH: Int, intraQuant: Array[Int], yPlane: Array[Int],
      cbPlane: Array[Int], crPlane: Array[Int]): Unit = {
    var qScale = br.read(5)
    while (br.read(1) == 1) br.read(8) // extra_information_slice
    // address of the macroblock BEFORE the first of this slice
    var mbAddr = (sliceVert - 1) * mbW - 1
    var dcY = 1024 // DC predictors reset at slice start (8-bit: 128*8)
    var dcCb = 1024
    var dcCr = 1024
    val coeffs = Array.ofDim[Double](64)
    val pixels = Array.ofDim[Double](64)
    var endOfSlice = false
    while (!endOfSlice) {
      // stuffing (11 bits '00000001111') then address increment
      while (br.peek(11) == 0xf) br.pos += 11
      if (br.bitsLeft < 23 || br.peek(23) == 0) { endOfSlice = true }
      else {
        var inc = 0
        var escaping = true
        while (escaping) {
          if (br.peek(AddrIncEscape._1) == AddrIncEscape._2) {
            br.pos += AddrIncEscape._1; inc += 33
          } else escaping = false
        }
        AddrIncVlc.decode(br) match {
          case Int.MinValue => endOfSlice = true
          case v =>
            inc += v
            // skipped macroblocks cannot occur in I-pictures (inc>1
            // after the first MB is a spec violation) — but tolerate
            // by just advancing; DC predictors reset per spec
            if (inc > 1) { dcY = 1024; dcCb = 1024; dcCr = 1024 }
            mbAddr += inc
            if (mbAddr >= mbW * mbH) { endOfSlice = true }
            else {
              // macroblock_type for I-pictures: '1' intra,
              // '01' intra + new quantizer scale
              if (br.read(1) == 0) {
                if (br.read(1) != 1) { endOfSlice = true }
                else qScale = br.read(5)
              }
              if (!endOfSlice) {
                val mbX = mbAddr % mbW
                val mbY = mbAddr / mbW
                var blk = 0
                while (blk < 6) {
                  val isLuma = blk < 4
                  val pred = if (isLuma) dcY else if (blk == 4) dcCb
                    else dcCr
                  val newPred = decodeIntraBlock(br, isLuma, pred,
                    qScale, intraQuant, coeffs)
                  if (isLuma) dcY = newPred
                  else if (blk == 4) dcCb = newPred
                  else dcCr = newPred
                  idct8x8(coeffs, pixels)
                  emitBlock(pixels, blk, mbX, mbY, mbW,
                    yPlane, cbPlane, crPlane)
                  blk += 1
                }
              }
            }
        }
      }
    }
  }

  /** Decode one intra block into `coeffs` (raster-order dequantized
    * values, ready for IDCT); returns the new DC predictor. */
  private def decodeIntraBlock(br: BitReader, isLuma: Boolean,
      dcPred: Int, qScale: Int, intraQuant: Array[Int],
      coeffs: Array[Double]): Int = {
    java.util.Arrays.fill(coeffs, 0.0)
    val size = {
      val v = (if (isLuma) DcSizeLumaVlc else DcSizeChromaVlc).decode(br)
      if (v == Int.MinValue) 0 else v
    }
    var dcDiff = 0
    if (size > 0) {
      val bits = br.read(size)
      dcDiff = if ((bits & (1 << (size - 1))) != 0) bits
        else bits - (1 << size) + 1
    }
    val dc = dcPred + dcDiff * 8 // intra DC step is fixed at 8
    coeffs(0) = dc.toDouble
    // AC coefficients until EOB ('10')
    var zz = 0
    var eob = false
    while (!eob) {
      if (br.peek(2) == 0x2) { br.pos += 2; eob = true }
      else {
        var run = 0
        var level = 0
        if (br.peek(6) == 0x1) { // escape: 000001
          br.pos += 6
          run = br.read(6)
          val first = br.read(8)
          level = if (first == 0) br.read(8) // +128..+255
            else if (first == 128) br.read(8) - 256 // -256..-128
            else if (first > 128) first - 256
            else first
        } else {
          // B.14 lookup; sign bit follows the code
          val hit = decodeAcCoeff(br)
          if (hit == null) { eob = true }
          else {
            run = hit(0)
            level = if (br.read(1) == 1) -hit(1) else hit(1)
          }
        }
        if (!eob) {
          zz += run + 1
          if (zz > 63) eob = true
          else {
            val idx = Zigzag(zz)
            // MPEG-1 intra dequant + oddification mismatch control
            var v = (2 * level * qScale * intraQuant(idx)) / 16
            if ((v & 1) == 0) v = v + (if (v > 0) -1 else if (v < 0) 1 else 0)
            if (v > 2047) v = 2047
            if (v < -2048) v = -2048
            coeffs(idx) = v.toDouble
          }
        }
      }
    }
    dc
  }

  /** null if no B.14 entry matches (corrupt stream). Returns
    * Array(run, level). */
  private def decodeAcCoeff(br: BitReader): Array[Int] = {
    val buf = br.peek(16)
    var i = 0
    while (i < AcTableArr.length) {
      val e = AcTableArr(i)
      if ((buf >>> (16 - e._1)) == e._2) {
        br.pos += e._1
        return Array(e._3, e._4)
      }
      i += 1
    }
    null
  }
  // ordered shortest-code-first so the prefix scan is correct & fast
  private val AcTableArr: Array[(Int, Int, Int, Int)] =
    AcTable.sortBy(_._1).toArray

  private val AddrIncVlc = new Vlc(AddrIncTable)
  private val DcSizeLumaVlc = new Vlc(DcSizeLuma)
  private val DcSizeChromaVlc = new Vlc(DcSizeChroma)

  private def emitBlock(pixels: Array[Double], blk: Int, mbX: Int,
      mbY: Int, mbW: Int, yPlane: Array[Int], cbPlane: Array[Int],
      crPlane: Array[Int]): Unit = {
    def clamp(d: Double): Int = {
      val v = StrictMath.round(d).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    if (blk < 4) {
      val bx = mbX * 16 + (blk % 2) * 8
      val by = mbY * 16 + (blk / 2) * 8
      val stride = mbW * 16
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          yPlane((by + r) * stride + bx + c) = clamp(pixels(r * 8 + c))
          c += 1
        }
        r += 1
      }
    } else {
      val plane = if (blk == 4) cbPlane else crPlane
      val bx = mbX * 8
      val by = mbY * 8
      val stride = mbW * 8
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          plane((by + r) * stride + bx + c) = clamp(pixels(r * 8 + c))
          c += 1
        }
        r += 1
      }
    }
  }

  // ------------------------------------------------------------------
  // encoder (intra-only fixture/export path)
  // ------------------------------------------------------------------

  /** Encode full-resolution 0..255 planes (4:2:0 chroma, dimensions
    * rounded up to whole macroblocks internally) as a minimal valid
    * MPEG-1 intra-only video stream: sequence header (default quant
    * matrices) + one GOP + one I-picture per input frame, one slice
    * per picture. Entropy coding uses the real DC size VLCs and
    * B.14's EOB; AC coefficients use the always-valid escape form —
    * every decoder must accept it, and it keeps the encode table
    * small. `frameRateCode` 1..8 per table 2-D.4 (3 = 25 fps). */
  def encodeIntra(frames: Seq[Picture], frameRateCode: Int = 3,
      qScale: Int = 8): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(frameRateCode >= 1 && frameRateCode <= 8)
    require(qScale >= 1 && qScale <= 31)
    val w = frames.head.width
    val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h))
    val bw = new BitWriter()
    // sequence header
    bw.write(0x000001, 24); bw.write(0xb3, 8)
    bw.write(w, 12); bw.write(h, 12)
    bw.write(1, 4) // aspect: square
    bw.write(frameRateCode, 4)
    bw.write(0x3ffff, 18) // bit rate: variable
    bw.write(1, 1) // marker
    bw.write(0, 10) // vbv
    bw.write(0, 1) // not constrained
    bw.write(0, 1); bw.write(0, 1) // default quant matrices
    bw.align()
    // GOP header
    bw.write(0x000001, 24); bw.write(0xb8, 8)
    bw.write(0, 25) // time code
    bw.write(1, 1) // closed gop
    bw.write(0, 1) // broken link
    bw.align()
    frames.zipWithIndex.foreach { case (f, ti) =>
      encodePicture(bw, f, ti, qScale)
    }
    // sequence end
    bw.align()
    bw.write(0x000001, 24); bw.write(0xb7, 8)
    bw.bytes
  }

  private def encodePicture(bw: BitWriter, f: Picture, temporalRef: Int,
      qScale: Int): Unit = {
    val mbW = (f.width + 15) / 16
    val mbH = (f.height + 15) / 16
    bw.write(0x000001, 24); bw.write(0x00, 8)
    bw.write(temporalRef, 10)
    bw.write(1, 3) // I picture
    bw.write(0xffff, 16) // vbv delay: variable
    bw.align()
    // one slice covering the whole picture (slice vertical position 1)
    bw.write(0x000001, 24); bw.write(0x01, 8)
    bw.write(qScale, 5)
    bw.write(0, 1) // no extra information
    var dcY = 1024
    var dcCb = 1024
    var dcCr = 1024
    val block = Array.ofDim[Double](64)
    val freq = Array.ofDim[Double](64)
    var mb = 0
    while (mb < mbW * mbH) {
      bw.write(1, 1) // address increment 1
      bw.write(1, 1) // macroblock type: intra
      val mbX = mb % mbW
      val mbY = mb / mbW
      var blk = 0
      while (blk < 6) {
        loadBlock(f, blk, mbX, mbY, block)
        fdct8x8(block, freq)
        val pred = if (blk < 4) dcY else if (blk == 4) dcCb else dcCr
        val newPred = encodeIntraBlock(bw, blk < 4, pred, qScale, freq)
        if (blk < 4) dcY = newPred
        else if (blk == 4) dcCb = newPred
        else dcCr = newPred
        blk += 1
      }
      mb += 1
    }
    bw.align()
  }

  private def loadBlock(f: Picture, blk: Int, mbX: Int, mbY: Int,
      out: Array[Double]): Unit = {
    def at(plane: Array[Int], x: Int, y: Int, w: Int, h: Int): Int = {
      val cx = if (x >= w) w - 1 else x
      val cy = if (y >= h) h - 1 else y
      plane(cy * w + cx) // edge-replicate the partial-macroblock rim
    }
    if (blk < 4) {
      val bx = mbX * 16 + (blk % 2) * 8
      val by = mbY * 16 + (blk / 2) * 8
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          out(r * 8 + c) =
            at(f.y, bx + c, by + r, f.width, f.height).toDouble
          c += 1
        }
        r += 1
      }
    } else {
      val cw = (f.width + 1) / 2
      val ch = (f.height + 1) / 2
      val plane = if (blk == 4) f.cb else f.cr
      val bx = mbX * 8
      val by = mbY * 8
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          out(r * 8 + c) = at(plane, bx + c, by + r, cw, ch).toDouble
          c += 1
        }
        r += 1
      }
    }
  }

  /** Quantize `freq` and entropy-code one intra block; returns the new
    * DC predictor (the reconstructed DC, quantized to the 8-step
    * grid). */
  private def encodeIntraBlock(bw: BitWriter, isLuma: Boolean,
      dcPred: Int, qScale: Int, freq: Array[Double]): Int = {
    // DC: fixed step 8, predictively coded
    val dcQ = StrictMath.round(freq(0) / 8.0).toInt
    val dc = dcQ * 8
    var diff = (dc - dcPred) / 8
    if (diff < -255) diff = -255
    if (diff > 255) diff = 255
    val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(
      StrictMath.abs(diff))
    val tbl = if (isLuma) DcSizeLuma else DcSizeChroma
    val (bits, code, _) = tbl.find(_._3 == size).get
    bw.write(code, bits)
    if (size > 0) {
      val v = if (diff > 0) diff else diff + (1 << size) - 1
      bw.write(v, size)
    }
    // AC: quantize with the default intra matrix, emit escapes
    var zz = 1
    var lastZZ = 0
    while (zz < 64) {
      val idx = Zigzag(zz)
      val q = DefaultIntraQuant(idx)
      val level0 =
        StrictMath.round(freq(idx) * 16.0 / (2.0 * qScale * q)).toInt
      val level = if (level0 > 255) 255 else if (level0 < -255) -255
        else level0
      if (level != 0) {
        val run = zz - lastZZ - 1
        bw.write(0x1, 6) // escape
        bw.write(run, 6)
        if (level >= -127 && level <= 127 && level != 0)
          bw.write(level & 0xff, 8)
        else if (level > 0) { bw.write(0, 8); bw.write(level, 8) }
        else { bw.write(128, 8); bw.write(level + 256, 8) }
        lastZZ = zz
      }
      zz += 1
    }
    bw.write(0x2, 2) // EOB
    dcPred + diff * 8
  }

  // ------------------------------------------------------------------
  // pipeline glue
  // ------------------------------------------------------------------

  /** [[Multimodal.decodeAviMjpegFrames]]-shaped entry point: up to
    * `maxFrames` evenly spaced decoded I-pictures as (timestamp,
    * PNG bytes). The timestamp is pictureIndex / frameRate — exact for
    * intra-only streams; for mixed streams it indexes I-pictures only
    * (documented approximation of the display clock). */
  def decodeFrames(content: Array[Byte], maxFrames: Int)
      : Option[Seq[(Double, Array[Byte])]] =
    // maxFrames == 1 always selects pics(0): stop decoding after the
    // first I-picture instead of paying for up to 64 full decodes
    decodeIPictures(content,
      maxPictures = if (maxFrames == 1) 1 else 64).map {
      case (rate, pics) =>
        val take = math.min(maxFrames, pics.length)
        val idxs = if (take == 1) Seq(0)
          else (0 until take).map(i => i * (pics.length - 1) / (take - 1))
        idxs.map { i =>
          val p = pics(i)
          (i / rate, pictureToPng(p))
        }
    }

  /** YCbCr (BT.601 full-range as used by JPEG/MPEG-1 fixtures here)
    * to PNG via the shared RGB encoder. */
  def pictureToPng(p: Picture): Array[Byte] = {
    val cw = (p.width + 1) / 2
    val rgb = Array.ofDim[Byte](p.width * p.height * 3)
    var yy = 0
    while (yy < p.height) {
      var xx = 0
      while (xx < p.width) {
        val lum = p.y(yy * p.width + xx).toDouble
        val cbv = p.cb((yy / 2) * cw + xx / 2) - 128.0
        val crv = p.cr((yy / 2) * cw + xx / 2) - 128.0
        def clamp(d: Double): Byte = {
          val v = StrictMath.round(d).toInt
          (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        }
        val base = (yy * p.width + xx) * 3
        rgb(base) = clamp(lum + 1.402 * crv)
        rgb(base + 1) = clamp(lum - 0.344136 * cbv - 0.714136 * crv)
        rgb(base + 2) = clamp(lum + 1.772 * cbv)
        xx += 1
      }
      yy += 1
    }
    Multimodal.encodePng(p.width, p.height, (x, y) => {
      val base = (y * p.width + x) * 3
      ((rgb(base) & 0xff) << 16) | ((rgb(base + 1) & 0xff) << 8) |
        (rgb(base + 2) & 0xff)
    })
  }

  /** Test hook: decode consecutive B.14-coded (run, level) pairs
    * (sign bit included, escapes excluded) from a bit string like
    * "110 011 1..." until EOB — lets the spec pin individual table
    * rows against the published code words without a full stream. */
  private[multimodal] def decodeAcPairsForTest(
      bits: String): Seq[(Int, Int)] = {
    val clean = bits.filter(c => c == '0' || c == '1')
    val data = clean.grouped(8)
      .map(s => Integer.parseInt(s.padTo(8, '0'), 2).toByte).toArray
    val br = new BitReader(data)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var eob = false
    while (!eob) {
      if (br.peek(2) == 0x2) eob = true
      else {
        val hit = decodeAcCoeff(br)
        if (hit == null) eob = true
        else {
          val s = br.read(1)
          out += ((hit(0), if (s == 1) -hit(1) else hit(1)))
        }
      }
    }
    out.toSeq
  }

  /** Gray test-pattern picture builder for fixtures: luma from a
    * (x, y) function, neutral chroma. */
  def grayPicture(width: Int, height: Int,
      lum: (Int, Int) => Int): Picture = {
    val y = Array.ofDim[Int](width * height)
    var r = 0
    while (r < height) {
      var c = 0
      while (c < width) {
        val v = lum(c, r)
        y(r * width + c) = if (v < 0) 0 else if (v > 255) 255 else v
        c += 1
      }
      r += 1
    }
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    Picture(width, height, y,
      Array.fill(cw * ch)(128), Array.fill(cw * ch)(128))
  }
}
