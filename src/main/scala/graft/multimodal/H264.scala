package graft.multimodal

/** Baseline-profile H.264/AVC intra (I-frame) codec — decoder and a
  * matching intra encoder for fixtures/round-trips, pure JVM.
  *
  * Implements the public Rec. ITU-T H.264 (05/2003 baseline subset):
  * Annex-B NAL parsing with emulation-prevention, Exp-Golomb, SPS/PPS,
  * IDR/I slice headers, CAVLC residual decoding (Tables 9-5..9-10),
  * I_4x4 / I_16x16 / I_PCM macroblocks, all intra prediction modes
  * (9 luma 4x4, 4 luma 16x16, 4 chroma), spec-exact integer dequant +
  * inverse 4x4 transform and DC Hadamard paths. The in-loop deblocking
  * filter is NOT applied (frame sampling doesn't need it); the encoder
  * therefore signals `disable_deblocking_filter_idc = 1`, so decoding
  * our own streams is bit-exact, and external streams decode without
  * deblocking as a documented approximation. CABAC (main/high
  * profile), P/B slices, FMO and interlace are out of scope — such
  * streams return None and the caller falls back.
  *
  * Same playbook as [[Mpeg1]] (reference holds no video path at all;
  * this extends the multimodal surface per SURVEY.md's LLM-pipeline
  * mandate): decode + encode share the reconstruction functions, so
  * fuzzed encode→decode round-trips prove the whole chain, and the
  * published Richardson CAVLC worked example pins the entropy tables
  * against an external golden. VLC tables are transcribed from the
  * spec; H264Spec additionally proves each table prefix-free.
  */
object H264 {

  // ------------------------------------------------------------------
  // bit I/O with Exp-Golomb
  // ------------------------------------------------------------------

  private[multimodal] final class BitReader(val data: Array[Byte]) {
    var pos = 0L
    def bitsLeft: Long = data.length.toLong * 8 - pos
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = (pos >> 3).toInt
        if (b >= data.length) throw new IllegalStateException("eof")
        v = (v << 1) | ((data(b) >> (7 - (pos & 7).toInt)) & 1)
        pos += 1; i += 1
      }
      v
    }
    def flag(): Boolean = u(1) == 1
    /** Exp-Golomb ue(v). */
    def ue(): Int = {
      var lz = 0
      while (u(1) == 0) {
        lz += 1
        if (lz > 31) throw new IllegalStateException("bad ue")
      }
      if (lz == 0) 0 else (1 << lz) - 1 + u(lz)
    }
    /** Exp-Golomb se(v): 0,1,-1,2,-2,… */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAlign(): Unit = pos = (pos + 7) & ~7L
  }

  private[multimodal] final class BitWriter {
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
    def writeBits(s: String): Unit =
      s.foreach(c => write(if (c == '1') 1 else 0, 1))
    def ue(v: Int): Unit = {
      require(v >= 0)
      val k = v + 1
      val lz = 31 - Integer.numberOfLeadingZeros(k)
      write(0, lz); write(k, lz + 1)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAligned: Boolean = nBits == 0
    def align(): Unit = if (nBits > 0) write(0, 8 - nBits)
    /** rbsp_trailing_bits: stop bit + alignment zeros. */
    def trailing(): Unit = { write(1, 1); align() }
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  // ------------------------------------------------------------------
  // NAL units
  // ------------------------------------------------------------------

  /** Remove emulation-prevention bytes (00 00 03 -> 00 00). */
  private[multimodal] def unescapeRbsp(nal: Array[Byte], from: Int,
      until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(until - from)
    var zeros = 0
    var i = from
    while (i < until) {
      val b = nal(i) & 0xff
      if (zeros >= 2 && b == 3) zeros = 0 // drop the escape byte
      else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** Insert emulation-prevention bytes (00 00 {00,01,02,03} gets 03). */
  private[multimodal] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xff
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** Split an Annex-B stream into (nal_unit_type, nal_ref_idc, rbsp)
    * units — nal_ref_idc (header bits 5-6) gates dec_ref_pic_marking
    * presence in slice headers (7.3.3: only when nonzero). */
  private[multimodal] def splitAnnexB(content: Array[Byte])
      : Seq[(Int, Int, Array[Byte])] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 3 <= content.length) {
      if (content(i) == 0 && content(i + 1) == 0 && content(i + 2) == 1)
        { starts += i + 3; i += 3 }
      else i += 1
    }
    starts.toSeq.zipAll(starts.toSeq.drop(1), -1, content.length + 3)
      .collect { case (s, e) if s >= 0 =>
        // strip this NAL's trailing start-code prefix bytes (the next
        // unit's 00 00 01 / 00 00 00 01)
        var end = e - 3
        while (end > s && content(end - 1) == 0) end -= 1
        (content(s) & 0x1f, (content(s) >> 5) & 3,
          unescapeRbsp(content, s + 1, end))
      }
      .filter(_._3.nonEmpty)
  }

  // ------------------------------------------------------------------
  // parameter sets
  // ------------------------------------------------------------------

  private[multimodal] final case class Sps(profile: Int, level: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      mbW: Int, mbH: Int,
      cropL: Int, cropR: Int, cropT: Int, cropB: Int,
      fps: Double) {
    def width: Int = mbW * 16 - 2 * (cropL + cropR)
    def height: Int = mbH * 16 - 2 * (cropT + cropB)
  }

  private[multimodal] final case class Pps(entropyCabac: Boolean,
      bottomFieldPicOrder: Boolean, picInitQp: Int,
      chromaQpIndexOffset: Int, deblockControl: Boolean,
      redundantPicCnt: Boolean)

  /** Parse seq_parameter_set_rbsp. Returns None for shapes outside the
    * supported baseline subset (interlace, non-4:2:0, scaling lists). */
  private[multimodal] def parseSps(rbsp: Array[Byte]): Option[Sps] = {
    val br = new BitReader(rbsp)
    val profile = br.u(8)
    br.u(8) // constraint flags + reserved
    val level = br.u(8)
    br.ue() // seq_parameter_set_id
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128).contains(profile)) {
      val chromaFormat = br.ue()
      if (chromaFormat != 1) return None // 4:2:0 only
      br.ue(); br.ue() // bit depths (minus8)
      br.flag() // qpprime_y_zero_transform_bypass
      if (br.flag()) return None // seq_scaling_matrix_present
    }
    val log2MaxFrameNum = br.ue() + 4
    val pocType = br.ue()
    var log2MaxPocLsb = 0
    if (pocType == 0) log2MaxPocLsb = br.ue() + 4
    else if (pocType == 1) {
      br.flag()
      br.se(); br.se()
      val n = br.ue()
      var i = 0
      while (i < n) { br.se(); i += 1 }
    }
    br.ue() // max_num_ref_frames
    br.flag() // gaps_in_frame_num_value_allowed
    val mbW = br.ue() + 1
    val mbH0 = br.ue() + 1
    val frameMbsOnly = br.flag()
    if (!frameMbsOnly) return None // interlace out of scope
    br.flag() // direct_8x8_inference
    var (cl, cr2, ct, cb2) = (0, 0, 0, 0)
    if (br.flag()) { cl = br.ue(); cr2 = br.ue(); ct = br.ue(); cb2 = br.ue() }
    var fps = 25.0
    if (br.flag()) { // vui_parameters_present
      if (br.flag()) { // aspect_ratio_info
        val idc = br.u(8)
        if (idc == 255) { br.u(16); br.u(16) }
      }
      if (br.flag()) br.flag() // overscan
      if (br.flag()) { // video_signal_type
        br.u(3); br.flag()
        if (br.flag()) { br.u(8); br.u(8); br.u(8) }
      }
      if (br.flag()) { br.ue(); br.ue() } // chroma_loc
      if (br.flag()) { // timing_info
        val numUnits = (br.u(16).toLong << 16) | br.u(16)
        val timeScale = (br.u(16).toLong << 16) | br.u(16)
        br.flag() // fixed_frame_rate
        if (numUnits > 0 && timeScale > 0)
          fps = timeScale.toDouble / (2.0 * numUnits)
      }
      // remaining VUI fields are irrelevant here; stop parsing
    }
    if (mbW <= 0 || mbH0 <= 0 || mbW > 1024 || mbH0 > 1024) None
    else Some(Sps(profile, level, log2MaxFrameNum, pocType,
      log2MaxPocLsb, mbW, mbH0, cl, cr2, ct, cb2, fps))
  }

  /** Parse pic_parameter_set_rbsp (single slice group only). */
  private[multimodal] def parsePps(rbsp: Array[Byte]): Option[Pps] = {
    val br = new BitReader(rbsp)
    br.ue(); br.ue() // pps id, sps id
    val cabac = br.flag()
    val bottomField = br.flag()
    if (br.ue() != 0) return None // num_slice_groups_minus1: no FMO
    br.ue(); br.ue() // num_ref_idx defaults
    br.flag(); br.u(2) // weighted pred
    val qp = 26 + br.se()
    br.se() // qs
    val chromaOff = br.se()
    val deblock = br.flag()
    br.flag() // constrained_intra_pred
    val redundant = br.flag()
    Some(Pps(cabac, bottomField, qp, chromaOff, deblock, redundant))
  }

  // ------------------------------------------------------------------
  // CAVLC tables (Rec. ITU-T H.264 Tables 9-5, 9-7, 9-8, 9-9, 9-10)
  // ------------------------------------------------------------------
  // Stored as the spec prints them — codeword strings indexed by the
  // symbol — so a reader can diff them against the standard line by
  // line. H264Spec proves every table prefix-free (catches the
  // transcription-typo class that would break decode) and the encoder
  // and decoder share these literals, so round-trip fuzzing exercises
  // every row for internal consistency; the published Richardson
  // example pins the hot rows externally.

  /** coeff_token codes `(totalCoeff, trailingOnes) -> bits`, one map
    * per nC range: 0 = [0,2), 1 = [2,4), 2 = [4,8), 3 = chroma DC
    * (nC == -1). nC >= 8 is the fixed 6-bit code, handled in code. */
  private val CoeffTokenTables: Array[Map[(Int, Int), String]] = {
    def m(rows: (Int, Int, String)*): Map[(Int, Int), String] =
      rows.map { case (tc, t1, s) => (tc, t1) -> s }.toMap
    val t0 = m(
      (0, 0, "1"),
      (1, 0, "000101"), (1, 1, "01"),
      (2, 0, "00000111"), (2, 1, "000100"), (2, 2, "001"),
      (3, 0, "000000111"), (3, 1, "00000110"), (3, 2, "0000101"),
      (3, 3, "00011"),
      (4, 0, "0000000111"), (4, 1, "000000110"), (4, 2, "00000101"),
      (4, 3, "000011"),
      (5, 0, "00000000111"), (5, 1, "0000000110"), (5, 2, "000000101"),
      (5, 3, "0000100"),
      (6, 0, "0000000001111"), (6, 1, "00000000110"),
      (6, 2, "0000000101"), (6, 3, "00000100"),
      (7, 0, "0000000001011"), (7, 1, "0000000001110"),
      (7, 2, "00000000101"), (7, 3, "000000100"),
      (8, 0, "0000000001000"), (8, 1, "0000000001010"),
      (8, 2, "0000000001101"), (8, 3, "0000000100"),
      (9, 0, "00000000001111"), (9, 1, "00000000001110"),
      (9, 2, "0000000001001"), (9, 3, "00000000100"),
      (10, 0, "00000000001011"), (10, 1, "00000000001010"),
      (10, 2, "00000000001101"), (10, 3, "0000000001100"),
      (11, 0, "000000000001111"), (11, 1, "000000000001110"),
      (11, 2, "00000000001001"), (11, 3, "00000000001100"),
      (12, 0, "000000000001011"), (12, 1, "000000000001010"),
      (12, 2, "000000000001101"), (12, 3, "00000000001000"),
      (13, 0, "0000000000001111"), (13, 1, "000000000000001"),
      (13, 2, "000000000001001"), (13, 3, "000000000001100"),
      (14, 0, "0000000000001011"), (14, 1, "0000000000001110"),
      (14, 2, "0000000000001101"), (14, 3, "000000000001000"),
      (15, 0, "0000000000000111"), (15, 1, "0000000000001010"),
      (15, 2, "0000000000001001"), (15, 3, "0000000000001100"),
      (16, 0, "0000000000000100"), (16, 1, "0000000000000110"),
      (16, 2, "0000000000000101"), (16, 3, "0000000000001000"))
    val t1 = m(
      (0, 0, "11"),
      (1, 0, "001011"), (1, 1, "10"),
      (2, 0, "000111"), (2, 1, "00111"), (2, 2, "011"),
      (3, 0, "0000111"), (3, 1, "001010"), (3, 2, "001001"),
      (3, 3, "0101"),
      (4, 0, "00000111"), (4, 1, "000110"), (4, 2, "000101"),
      (4, 3, "0100"),
      (5, 0, "00000100"), (5, 1, "0000110"), (5, 2, "0000101"),
      (5, 3, "00110"),
      (6, 0, "000000111"), (6, 1, "00000110"), (6, 2, "00000101"),
      (6, 3, "001000"),
      (7, 0, "00000001111"), (7, 1, "000000110"), (7, 2, "000000101"),
      (7, 3, "000100"),
      (8, 0, "00000001011"), (8, 1, "00000001110"),
      (8, 2, "00000001101"), (8, 3, "0000100"),
      (9, 0, "000000001111"), (9, 1, "00000001010"),
      (9, 2, "00000001001"), (9, 3, "000000100"),
      (10, 0, "000000001011"), (10, 1, "000000001110"),
      (10, 2, "000000001101"), (10, 3, "00000001100"),
      (11, 0, "000000001000"), (11, 1, "000000001010"),
      (11, 2, "000000001001"), (11, 3, "00000001000"),
      (12, 0, "0000000001111"), (12, 1, "0000000001110"),
      (12, 2, "0000000001101"), (12, 3, "000000001100"),
      (13, 0, "0000000001011"), (13, 1, "0000000001010"),
      (13, 2, "0000000001001"), (13, 3, "0000000001100"),
      (14, 0, "0000000000111"), (14, 1, "00000000001011"),
      (14, 2, "0000000000110"), (14, 3, "0000000001000"),
      (15, 0, "00000000001001"), (15, 1, "00000000001000"),
      (15, 2, "00000000001010"), (15, 3, "0000000000001"),
      (16, 0, "00000000000111"), (16, 1, "00000000000110"),
      (16, 2, "00000000000101"), (16, 3, "00000000000100"))
    val t2 = m(
      (0, 0, "1111"),
      (1, 0, "001111"), (1, 1, "1110"),
      (2, 0, "001011"), (2, 1, "01111"), (2, 2, "1101"),
      (3, 0, "001000"), (3, 1, "01100"), (3, 2, "01110"), (3, 3, "1100"),
      (4, 0, "0001111"), (4, 1, "01010"), (4, 2, "01011"), (4, 3, "1011"),
      (5, 0, "0001011"), (5, 1, "01000"), (5, 2, "01001"), (5, 3, "1010"),
      (6, 0, "0001001"), (6, 1, "001110"), (6, 2, "001101"),
      (6, 3, "1001"),
      (7, 0, "0001000"), (7, 1, "001010"), (7, 2, "001001"),
      (7, 3, "1000"),
      (8, 0, "00001111"), (8, 1, "0001110"), (8, 2, "0001101"),
      (8, 3, "01101"),
      (9, 0, "00001011"), (9, 1, "00001110"), (9, 2, "0001010"),
      (9, 3, "001100"),
      (10, 0, "000001111"), (10, 1, "00001010"), (10, 2, "00001101"),
      (10, 3, "0001100"),
      (11, 0, "000001011"), (11, 1, "000001110"), (11, 2, "00001001"),
      (11, 3, "00001100"),
      (12, 0, "000001000"), (12, 1, "000001010"), (12, 2, "000001001"),
      (12, 3, "00001000"),
      (13, 0, "0000001101"), (13, 1, "000001100"), (13, 2, "000001101"),
      (13, 3, "000000111"),
      (14, 0, "0000001100"), (14, 1, "0000001011"), (14, 2, "0000001010"),
      (14, 3, "0000001001"),
      (15, 0, "0000001000"), (15, 1, "0000000111"), (15, 2, "0000000110"),
      (15, 3, "0000000101"),
      (16, 0, "0000000100"), (16, 1, "0000000011"), (16, 2, "0000000010"),
      (16, 3, "0000000001"))
    val tChromaDc = m(
      (0, 0, "01"),
      (1, 0, "000111"), (1, 1, "1"),
      (2, 0, "000100"), (2, 1, "000110"), (2, 2, "001"),
      (3, 0, "000011"), (3, 1, "0000011"), (3, 2, "0000010"),
      (3, 3, "000101"),
      (4, 0, "000010"), (4, 1, "00000011"), (4, 2, "00000010"),
      (4, 3, "0000000"))
    Array(t0, t1, t2, tChromaDc)
  }

  /** total_zeros codes for 4x4 blocks (maxNumCoeff 15/16), indexed by
    * TotalCoeff 1..15 -> total_zeros -> bits. */
  private val TotalZeros4x4: Array[Map[Int, String]] = {
    def m(rows: String*): Map[Int, String] =
      rows.zipWithIndex.map { case (s, i) => i -> s }.toMap
    Array(
      null, // TotalCoeff 0 never reads total_zeros
      m("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"),
      m("111", "110", "101", "100", "011", "0101", "0100", "0011",
        "0010", "00011", "00010", "000011", "000010", "000001",
        "000000"),
      m("0101", "111", "110", "101", "0100", "0011", "100", "011",
        "0010", "00011", "00010", "000001", "00001", "000000"),
      m("00011", "111", "0101", "0100", "110", "101", "100", "0011",
        "011", "0010", "00010", "00001", "00000"),
      m("0101", "0100", "0011", "111", "110", "101", "100", "011",
        "0010", "00001", "0001", "00000"),
      m("000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"),
      m("000001", "00001", "101", "100", "011", "11", "010", "0001",
        "001", "000000"),
      m("000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"),
      m("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
      m("00001", "00000", "001", "11", "10", "01", "0001"),
      m("0000", "0001", "001", "010", "1", "011"),
      m("0000", "0001", "01", "1", "001"),
      m("000", "001", "1", "01"),
      m("00", "01", "1"),
      m("0", "1"))
  }

  /** total_zeros codes for chroma DC (maxNumCoeff 4), TotalCoeff 1..3. */
  private val TotalZerosChromaDc: Array[Map[Int, String]] = Array(
    null,
    Map(0 -> "1", 1 -> "01", 2 -> "001", 3 -> "000"),
    Map(0 -> "1", 1 -> "01", 2 -> "00"),
    Map(0 -> "1", 1 -> "0"))

  /** run_before codes indexed by min(zerosLeft, 7) -> run -> bits;
    * zerosLeft > 6 extends run 7..14 as (run-4) zeros then a 1. */
  private val RunBefore: Array[Map[Int, String]] = Array(
    null,
    Map(0 -> "1", 1 -> "0"),
    Map(0 -> "1", 1 -> "01", 2 -> "00"),
    Map(0 -> "11", 1 -> "10", 2 -> "01", 3 -> "00"),
    Map(0 -> "11", 1 -> "10", 2 -> "01", 3 -> "001", 4 -> "000"),
    Map(0 -> "11", 1 -> "10", 2 -> "011", 3 -> "010", 4 -> "001",
      5 -> "000"),
    Map(0 -> "11", 1 -> "000", 2 -> "001", 3 -> "011", 4 -> "010",
      5 -> "101", 6 -> "100"),
    Map(0 -> "111", 1 -> "110", 2 -> "101", 3 -> "100", 4 -> "011",
      5 -> "010", 6 -> "001", 7 -> "0001", 8 -> "00001", 9 -> "000001",
      10 -> "0000001", 11 -> "00000001", 12 -> "000000001",
      13 -> "0000000001", 14 -> "00000000001"))

  /** Table 9-4: coded_block_pattern me(v) mapping for intra MBs,
    * codeNum -> cbp. */
  private val CbpIntraOfCodeNum: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4, 8,
    17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private val CodeNumOfCbpIntra: Array[Int] = {
    val inv = Array.fill(48)(-1)
    CbpIntraOfCodeNum.zipWithIndex.foreach { case (c, n) => inv(c) = n }
    inv
  }

  // test hooks: the spec proves each table prefix-free and size-exact
  private[multimodal] def coeffTokenTablesForTest = CoeffTokenTables
  private[multimodal] def totalZerosTablesForTest = TotalZeros4x4
  private[multimodal] def totalZerosChromaDcForTest = TotalZerosChromaDc
  private[multimodal] def runBeforeTablesForTest = RunBefore

  // decode tries built once: (table, firstBits-prefix) lookups by
  // (length, value); linear in code length, plenty for fixture-scale
  private def buildDecode[A](m: Map[A, String]): Map[(Int, Int), A] =
    m.map { case (sym, bits) =>
      (bits.length, Integer.parseInt(bits, 2)) -> sym
    }
  private val CoeffTokenDecode = CoeffTokenTables.map(buildDecode)
  private val TotalZeros4x4Decode =
    TotalZeros4x4.map(t => if (t == null) null else buildDecode(t))
  private val TotalZerosChromaDcDecode =
    TotalZerosChromaDc.map(t => if (t == null) null else buildDecode(t))
  private val RunBeforeDecode =
    RunBefore.map(t => if (t == null) null else buildDecode(t))

  private def readVlc[A](br: BitReader, table: Map[(Int, Int), A],
      maxLen: Int): A = {
    var len = 0
    var v = 0
    while (len < maxLen) {
      v = (v << 1) | br.u(1)
      len += 1
      table.get((len, v)) match {
        case Some(sym) => return sym
        case None =>
      }
    }
    throw new IllegalStateException("bad vlc")
  }

  private def tableIdxOfNc(nC: Int): Int =
    if (nC == -1) 3
    else if (nC < 2) 0
    else if (nC < 4) 1
    else 2

  /** Decode one CAVLC residual block: returns coefficient levels in
    * SCAN order (length maxNumCoeff) plus TotalCoeff. */
  private[multimodal] def readResidualBlock(br: BitReader, nC: Int,
      maxNumCoeff: Int): (Array[Int], Int) = {
    val coeffs = Array.ofDim[Int](maxNumCoeff)
    var totalCoeff = 0
    var trailingOnes = 0
    if (nC >= 8) {
      val code = br.u(6)
      if (code == 3) { totalCoeff = 0; trailingOnes = 0 }
      else { totalCoeff = (code >> 2) + 1; trailingOnes = code & 3 }
    } else {
      val (tc, t1) = readVlc(br, CoeffTokenDecode(tableIdxOfNc(nC)), 16)
      totalCoeff = tc; trailingOnes = t1
    }
    if (totalCoeff == 0) return (coeffs, 0)
    if (totalCoeff > maxNumCoeff)
      throw new IllegalStateException("too many coeffs")
    val levels = Array.ofDim[Int](totalCoeff)
    var suffixLength =
      if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      if (i < trailingOnes) levels(i) = if (br.u(1) == 1) -1 else 1
      else {
        var levelPrefix = 0
        while (br.u(1) == 0) {
          levelPrefix += 1
          if (levelPrefix > 31)
            throw new IllegalStateException("bad level prefix")
        }
        val levelSuffixSize =
          if (levelPrefix == 14 && suffixLength == 0) 4
          else if (levelPrefix >= 15) levelPrefix - 3
          else suffixLength
        var levelCode = (math.min(15, levelPrefix) << suffixLength) +
          (if (levelSuffixSize > 0) br.u(levelSuffixSize) else 0)
        if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
        if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
        if (i == trailingOnes && trailingOnes < 3) levelCode += 2
        levels(i) =
          if (levelCode % 2 == 0) (levelCode + 2) >> 1
          else -((levelCode + 1) >> 1)
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(levels(i)) > (3 << (suffixLength - 1)) &&
          suffixLength < 6) suffixLength += 1
      }
      i += 1
    }
    var totalZeros = 0
    if (totalCoeff < maxNumCoeff) {
      totalZeros =
        if (nC == -1) readVlc(br, TotalZerosChromaDcDecode(totalCoeff), 8)
        else readVlc(br, TotalZeros4x4Decode(totalCoeff), 9)
    }
    if (totalCoeff + totalZeros > maxNumCoeff)
      throw new IllegalStateException("bad total_zeros")
    var zerosLeft = totalZeros
    var idx = totalCoeff + totalZeros - 1
    i = 0
    while (i < totalCoeff) {
      val run =
        if (i == totalCoeff - 1) zerosLeft
        else if (zerosLeft == 0) 0
        else readVlc(br, RunBeforeDecode(math.min(zerosLeft, 7)), 11)
      if (run > zerosLeft) throw new IllegalStateException("bad run")
      coeffs(idx) = levels(i)
      idx -= 1 + run
      zerosLeft -= run
      i += 1
    }
    (coeffs, totalCoeff)
  }

  /** Encode one CAVLC residual block from SCAN-order coefficients. */
  private[multimodal] def writeResidualBlock(bw: BitWriter,
      coeffs: Array[Int], nC: Int): Int = {
    val maxNumCoeff = coeffs.length
    val nz = coeffs.zipWithIndex.filter(_._1 != 0)
    val totalCoeff = nz.length
    // trailing ones: up to 3 final +/-1 coefficients
    var trailingOnes = 0
    var k = totalCoeff - 1
    while (k >= 0 && trailingOnes < 3 && math.abs(nz(k)._1) == 1) {
      trailingOnes += 1; k -= 1
    }
    if (nC >= 8) {
      bw.write(if (totalCoeff == 0) 3
        else 4 * (totalCoeff - 1) + trailingOnes, 6)
    } else {
      bw.writeBits(
        CoeffTokenTables(tableIdxOfNc(nC))((totalCoeff, trailingOnes)))
    }
    if (totalCoeff == 0) return 0
    // levels: highest frequency first
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      val level = nz(totalCoeff - 1 - i)._1
      if (i < trailingOnes) bw.write(if (level < 0) 1 else 0, 1)
      else {
        var levelCode =
          if (level > 0) 2 * level - 2 else -2 * level - 1
        if (i == trailingOnes && trailingOnes < 3) levelCode -= 2
        if (suffixLength == 0) {
          if (levelCode < 14) bw.writeBits("0" * levelCode + "1")
          else if (levelCode < 30) {
            bw.writeBits("0" * 14 + "1"); bw.write(levelCode - 14, 4)
          } else {
            require(levelCode < 30 + 4096, "level escape overflow")
            bw.writeBits("0" * 15 + "1"); bw.write(levelCode - 30, 12)
          }
        } else {
          val prefix = levelCode >> suffixLength
          if (prefix < 15) {
            bw.writeBits("0" * prefix + "1")
            bw.write(levelCode & ((1 << suffixLength) - 1), suffixLength)
          } else {
            val rem = levelCode - (15 << suffixLength)
            require(rem < 4096, "level escape overflow")
            bw.writeBits("0" * 15 + "1"); bw.write(rem, 12)
          }
        }
        val absLevel = math.abs(level)
        if (suffixLength == 0) suffixLength = 1
        if (absLevel > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }
    // total_zeros: zeros before the last nonzero coefficient
    val lastIdx = nz(totalCoeff - 1)._2
    val totalZeros = lastIdx + 1 - totalCoeff
    if (totalCoeff < maxNumCoeff) {
      if (nC == -1) bw.writeBits(TotalZerosChromaDc(totalCoeff)(totalZeros))
      else bw.writeBits(TotalZeros4x4(totalCoeff)(totalZeros))
    }
    var zerosLeft = totalZeros
    i = totalCoeff - 1
    while (i > 0) {
      val run = nz(i)._2 - nz(i - 1)._2 - 1
      if (zerosLeft > 0)
        bw.writeBits(RunBefore(math.min(zerosLeft, 7))(run))
      zerosLeft -= run
      i -= 1
    }
    totalCoeff
  }

  // ------------------------------------------------------------------
  // intra prediction (spec 8.3) — shared by decoder and encoder so
  // encode-side reconstruction is bit-identical to decode
  // ------------------------------------------------------------------

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Predict one 4x4 luma block. `plane` is the reconstruction plane
    * with row `stride`; availability flags follow the spec's neighbor
    * rules (computed by the caller from decode order + slice ids).
    * Unavailable above-right samples are substituted with the last
    * above sample; fully unavailable inputs fall back to 128. */
  private[multimodal] def predict4x4(mode: Int, plane: Array[Int],
      stride: Int, x0: Int, y0: Int, availL: Boolean, availA: Boolean,
      availAL: Boolean, availAR: Boolean): Array[Int] = {
    val above = Array.ofDim[Int](8)
    var i = 0
    while (i < 8) {
      above(i) =
        if (i < 4) { if (availA) plane((y0 - 1) * stride + x0 + i) else 128 }
        else if (availAR) plane((y0 - 1) * stride + x0 + i)
        else if (availA) plane((y0 - 1) * stride + x0 + 3)
        else 128
      i += 1
    }
    val left = Array.ofDim[Int](4)
    i = 0
    while (i < 4) {
      left(i) = if (availL) plane((y0 + i) * stride + x0 - 1) else 128
      i += 1
    }
    val corner = if (availAL) plane((y0 - 1) * stride + x0 - 1) else 128
    val p = Array.ofDim[Int](16)
    @inline def a(x: Int) = above(x)
    @inline def l(y: Int) = left(y)
    mode match {
      case 0 => // vertical
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) {
          p(y * 4 + x) = a(x); x += 1 }; y += 1 }
      case 1 => // horizontal
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) {
          p(y * 4 + x) = l(y); x += 1 }; y += 1 }
      case 2 => // DC
        val dc =
          if (availA && availL)
            (a(0) + a(1) + a(2) + a(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (availA) (a(0) + a(1) + a(2) + a(3) + 2) >> 2
          else if (availL) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(p, dc)
      case 3 => // diagonal down-left
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) {
          p(y * 4 + x) =
            if (x == 3 && y == 3) (a(6) + 3 * a(7) + 2) >> 2
            else (a(x + y) + 2 * a(x + y + 1) + a(x + y + 2) + 2) >> 2
          x += 1 }; y += 1 }
      case 4 => // diagonal down-right
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) {
          p(y * 4 + x) =
            if (x > y) (a(x - y - 2) + 2 * a(x - y - 1) + a(x - y) + 2) >> 2
            else if (x < y)
              (l(y - x - 2) + 2 * l(y - x - 1) + l(y - x) + 2) >> 2
            else (a(0) + 2 * corner + l(0) + 2) >> 2
          x += 1 }; y += 1 }
      case 5 => // vertical-right
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) {
          val z = 2 * x - y
          p(y * 4 + x) =
            if (z >= 0 && z % 2 == 0) {
              val q = x - (y >> 1)
              (am(above, corner, q - 1) + am(above, corner, q) + 1) >> 1
            } else if (z >= 0) {
              val q = x - (y >> 1)
              (am(above, corner, q - 2) + 2 * am(above, corner, q - 1) +
                am(above, corner, q) + 2) >> 2
            } else if (z == -1) (l(0) + 2 * corner + a(0) + 2) >> 2
            else (l(y - 1) + 2 * l(y - 2) +
              (if (y - 3 < 0) corner else l(y - 3)) + 2) >> 2
          x += 1 }; y += 1 }
      case 6 => // horizontal-down
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) {
          val z = 2 * y - x
          p(y * 4 + x) =
            if (z >= 0 && z % 2 == 0) {
              val q = y - (x >> 1)
              (lm(left, corner, q - 1) + lm(left, corner, q) + 1) >> 1
            } else if (z >= 0) {
              val q = y - (x >> 1)
              (lm(left, corner, q - 2) + 2 * lm(left, corner, q - 1) +
                lm(left, corner, q) + 2) >> 2
            } else if (z == -1) (l(0) + 2 * corner + a(0) + 2) >> 2
            else (a(x - 1) + 2 * a(x - 2) +
              (if (x - 3 < 0) corner else a(x - 3)) + 2) >> 2
          x += 1 }; y += 1 }
      case 7 => // vertical-left
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) {
          val q = x + (y >> 1)
          p(y * 4 + x) =
            if (y % 2 == 0) (a(q) + a(q + 1) + 1) >> 1
            else (a(q) + 2 * a(q + 1) + a(q + 2) + 2) >> 2
          x += 1 }; y += 1 }
      case 8 => // horizontal-up
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) {
          val z = x + 2 * y
          p(y * 4 + x) =
            if (z > 5) l(3)
            else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
            else if (z % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
            else (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
              l(y + (x >> 1) + 2) + 2) >> 2
          x += 1 }; y += 1 }
      case _ => throw new IllegalStateException(s"bad 4x4 mode $mode")
    }
    p
  }
  // helpers for modes 5/6: index -1 means the corner sample
  @inline private def am(above: Array[Int], corner: Int, i: Int): Int =
    if (i < 0) corner else above(i)
  @inline private def lm(left: Array[Int], corner: Int, i: Int): Int =
    if (i < 0) corner else left(i)

  /** Predict a full 16x16 luma block (modes 0 V, 1 H, 2 DC, 3 plane). */
  private[multimodal] def predict16x16(mode: Int, plane: Array[Int],
      stride: Int, x0: Int, y0: Int, availL: Boolean, availA: Boolean)
      : Array[Int] = {
    val p = Array.ofDim[Int](256)
    @inline def a(x: Int) = plane((y0 - 1) * stride + x0 + x)
    @inline def l(y: Int) = plane((y0 + y) * stride + x0 - 1)
    mode match {
      case 0 =>
        require(availA, "16x16 vertical without above")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) {
          p(y * 16 + x) = a(x); x += 1 }; y += 1 }
      case 1 =>
        require(availL, "16x16 horizontal without left")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) {
          p(y * 16 + x) = l(y); x += 1 }; y += 1 }
      case 2 =>
        var sum = 0
        if (availA) { var x = 0; while (x < 16) { sum += a(x); x += 1 } }
        if (availL) { var y = 0; while (y < 16) { sum += l(y); y += 1 } }
        val dc =
          if (availA && availL) (sum + 16) >> 5
          else if (availA || availL) (sum + 8) >> 4
          else 128
        java.util.Arrays.fill(p, dc)
      case 3 =>
        require(availA && availL, "16x16 plane without neighbors")
        val corner = plane((y0 - 1) * stride + x0 - 1)
        var h = 0; var v = 0
        var i = 0
        while (i < 8) {
          h += (i + 1) * (a(8 + i) - (if (6 - i < 0) corner else a(6 - i)))
          v += (i + 1) * (l(8 + i) - (if (6 - i < 0) corner else l(6 - i)))
          i += 1
        }
        val aa = 16 * (a(15) + l(15))
        val b = (5 * h + 32) >> 6
        val c = (5 * v + 32) >> 6
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) {
          p(y * 16 + x) =
            clip255((aa + b * (x - 7) + c * (y - 7) + 16) >> 5)
          x += 1 }; y += 1 }
      case _ => throw new IllegalStateException(s"bad 16x16 mode $mode")
    }
    p
  }

  /** Predict an 8x8 chroma block (modes 0 DC, 1 H, 2 V, 3 plane). */
  private[multimodal] def predictChroma(mode: Int, plane: Array[Int],
      stride: Int, x0: Int, y0: Int, availL: Boolean, availA: Boolean)
      : Array[Int] = {
    val p = Array.ofDim[Int](64)
    @inline def a(x: Int) = plane((y0 - 1) * stride + x0 + x)
    @inline def l(y: Int) = plane((y0 + y) * stride + x0 - 1)
    mode match {
      case 0 => // DC, per 4x4 sub-block (spec 8.3.4.1)
        def sumA(from: Int) = a(from) + a(from + 1) + a(from + 2) + a(from + 3)
        def sumL(from: Int) = l(from) + l(from + 1) + l(from + 2) + l(from + 3)
        def fill(bx: Int, by: Int, dc: Int): Unit = {
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) {
            p((by + y) * 8 + bx + x) = dc; x += 1 }; y += 1 }
        }
        fill(0, 0,
          if (availA && availL) (sumA(0) + sumL(0) + 4) >> 3
          else if (availA) (sumA(0) + 2) >> 2
          else if (availL) (sumL(0) + 2) >> 2 else 128)
        fill(4, 0,
          if (availA) (sumA(4) + 2) >> 2
          else if (availL) (sumL(0) + 2) >> 2 else 128)
        fill(0, 4,
          if (availL) (sumL(4) + 2) >> 2
          else if (availA) (sumA(0) + 2) >> 2 else 128)
        fill(4, 4,
          if (availA && availL) (sumA(4) + sumL(4) + 4) >> 3
          else if (availA) (sumA(4) + 2) >> 2
          else if (availL) (sumL(4) + 2) >> 2 else 128)
      case 1 =>
        require(availL, "chroma horizontal without left")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) {
          p(y * 8 + x) = l(y); x += 1 }; y += 1 }
      case 2 =>
        require(availA, "chroma vertical without above")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) {
          p(y * 8 + x) = a(x); x += 1 }; y += 1 }
      case 3 =>
        require(availA && availL, "chroma plane without neighbors")
        val corner = plane((y0 - 1) * stride + x0 - 1)
        var h = 0; var v = 0
        var i = 0
        while (i < 4) {
          h += (i + 1) * (a(4 + i) - (if (2 - i < 0) corner else a(2 - i)))
          v += (i + 1) * (l(4 + i) - (if (2 - i < 0) corner else l(2 - i)))
          i += 1
        }
        val aa = 16 * (a(7) + l(7))
        val b = (17 * h + 16) >> 5
        val c = (17 * v + 16) >> 5
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) {
          p(y * 8 + x) = clip255((aa + b * (x - 3) + c * (y - 3) + 16) >> 5)
          x += 1 }; y += 1 }
      case _ => throw new IllegalStateException(s"bad chroma mode $mode")
    }
    p
  }

  // ------------------------------------------------------------------
  // picture decoder
  // ------------------------------------------------------------------

  /** Mutable per-picture decode state: padded reconstruction planes,
    * CAVLC nonzero-coefficient context, per-block decode bookkeeping.
    * Encoder builds the identical structure so its reconstruction is
    * the decoder's. */
  private[multimodal] final class PicState(val sps: Sps) {
    val mbW: Int = sps.mbW
    val mbH: Int = sps.mbH
    val lw: Int = mbW * 16 // luma stride
    val cw: Int = mbW * 8 // chroma stride
    val luma = Array.ofDim[Int](lw * mbH * 16)
    val cb = Array.ofDim[Int](cw * mbH * 8)
    val cr = Array.ofDim[Int](cw * mbH * 8)
    /** 4x4-block grid: reconstructed yet? (drives intra availability) */
    val done = Array.ofDim[Boolean](mbW * 4 * mbH * 4)
    /** slice id per MB; -1 = not decoded */
    val mbSlice = Array.fill(mbW * mbH)(-1)
    /** 1 = I_4x4, 2 = I_16x16, 3 = I_PCM */
    val mbType = Array.ofDim[Int](mbW * mbH)
    /** CAVLC totalCoeff context per luma 4x4 block / chroma 4x4 block */
    val lumaNz = Array.ofDim[Int](mbW * 4 * mbH * 4)
    val cbNz = Array.ofDim[Int](mbW * 2 * mbH * 2)
    val crNz = Array.ofDim[Int](mbW * 2 * mbH * 2)
    /** intra 4x4 pred mode per block (DC where not an I_4x4 MB) */
    val i4Mode = Array.fill(mbW * 4 * mbH * 4)(2)
    var decodedMbs = 0

    def blockDone(bx: Int, by: Int, slice: Int): Boolean =
      bx >= 0 && by >= 0 && bx < mbW * 4 && by < mbH * 4 &&
        done(by * mbW * 4 + bx) &&
        mbSlice((by >> 2) * mbW + (bx >> 2)) == slice
    def mbAvail(mx: Int, my: Int, slice: Int): Boolean =
      mx >= 0 && my >= 0 && mx < mbW && my < mbH &&
        mbSlice(my * mbW + mx) == slice
    /** nC for a luma 4x4 block (spec 9.2.1), slice-bounded. */
    def lumaNC(bx: Int, by: Int, slice: Int): Int = {
      val la = bx > 0 && mbSlice((by >> 2) * mbW + ((bx - 1) >> 2)) == slice
      val aa = by > 0 && mbSlice(((by - 1) >> 2) * mbW + (bx >> 2)) == slice
      val nA = if (la) lumaNz(by * mbW * 4 + bx - 1) else 0
      val nB = if (aa) lumaNz((by - 1) * mbW * 4 + bx) else 0
      if (la && aa) (nA + nB + 1) >> 1
      else if (la) nA else if (aa) nB else 0
    }
    def chromaNC(nz: Array[Int], bx: Int, by: Int, slice: Int): Int = {
      val la = bx > 0 && mbSlice((by >> 1) * mbW + ((bx - 1) >> 1)) == slice
      val aa = by > 0 && mbSlice(((by - 1) >> 1) * mbW + (bx >> 1)) == slice
      val nA = if (la) nz(by * mbW * 2 + bx - 1) else 0
      val nB = if (aa) nz((by - 1) * mbW * 2 + bx) else 0
      if (la && aa) (nA + nB + 1) >> 1
      else if (la) nA else if (aa) nB else 0
    }
    /** predicted Intra4x4 mode = min(left, above), DC when either is
      * unavailable or not in an I_4x4 MB (spec 8.3.1.1). */
    def predIntra4x4Mode(bx: Int, by: Int, slice: Int): Int = {
      def modeOf(nx: Int, ny: Int): Int = {
        if (nx < 0 || ny < 0) return -1
        val mi = (ny >> 2) * mbW + (nx >> 2)
        if (mbSlice(mi) != slice) -1
        else if (mbType(mi) != 1) 2
        else i4Mode(ny * mbW * 4 + nx)
      }
      val mA = modeOf(bx - 1, by)
      val mB = modeOf(bx, by - 1)
      if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
    }
    def markMb(mx: Int, my: Int, slice: Int, typ: Int): Unit = {
      mbSlice(my * mbW + mx) = slice
      mbType(my * mbW + mx) = typ
      var y = my * 4
      while (y < my * 4 + 4) {
        var x = mx * 4
        while (x < mx * 4 + 4) { done(y * mbW * 4 + x) = true; x += 1 }
        y += 1
      }
      decodedMbs += 1
    }
    /** Crop to the SPS-signalled picture and emit. */
    def toPicture: Mpeg1.Picture = {
      val w = sps.width; val h = sps.height
      val x0 = 2 * sps.cropL; val y0 = 2 * sps.cropT
      val outCw = (w + 1) / 2; val outCh = (h + 1) / 2
      val y = Array.ofDim[Int](w * h)
      var r = 0
      while (r < h) {
        System.arraycopy(luma, (y0 + r) * lw + x0, y, r * w, w)
        r += 1
      }
      val ocb = Array.ofDim[Int](outCw * outCh)
      val ocr = Array.ofDim[Int](outCw * outCh)
      r = 0
      while (r < outCh) {
        System.arraycopy(cb, (sps.cropT + r) * cw + sps.cropL, ocb,
          r * outCw, outCw)
        System.arraycopy(cr, (sps.cropT + r) * cw + sps.cropL, ocr,
          r * outCw, outCw)
        r += 1
      }
      Mpeg1.Picture(w, h, y, ocb, ocr)
    }
  }

  /** Write a reconstructed 4x4 block: pred + inverse-transformed
    * dequantized residual, clipped (8.5.12). Shared encode/decode. */
  private def reconBlock(plane: Array[Int], stride: Int, x0: Int,
      y0: Int, pred: Array[Int], predStride: Int, px: Int, py: Int,
      d: Array[Int]): Unit = {
    val res = H264Transform.itransform4x4(d)
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        val r = (res(y * 4 + x) + 32) >> 6
        plane((y0 + y) * stride + x0 + x) =
          clip255(pred((py + y) * predStride + px + x) + r)
        x += 1
      }
      y += 1
    }
  }

  private val ZScanX = Array(0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
  private val ZScanY = Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)

  /** rbsp stop position in bits: the final 1 bit (rbsp_stop_one_bit)
    * of the slice RBSP; slice data ends before it. */
  private def rbspStopBit(rbsp: Array[Byte]): Long = {
    var i = rbsp.length - 1
    while (i >= 0 && rbsp(i) == 0) i -= 1
    if (i < 0) 0L
    else {
      val b = rbsp(i) & 0xff
      i.toLong * 8 + (7 - Integer.numberOfTrailingZeros(b))
    }
  }

  /** Decode one I-slice macroblock; returns the updated luma QP. */
  private def decodeMacroblock(br: BitReader, st: PicState, mbX: Int,
      mbY: Int, slice: Int, qpIn: Int, chromaQpOff: Int): Int = {
    import H264Transform._
    var qp = qpIn
    val mbTypeCode = br.ue()
    val lx = mbX * 16; val ly = mbY * 16
    val cx = mbX * 8; val cy = mbY * 8
    val availL = st.mbAvail(mbX - 1, mbY, slice)
    val availA = st.mbAvail(mbX, mbY - 1, slice)

    if (mbTypeCode == 25) { // I_PCM
      br.byteAlign()
      var i = 0
      while (i < 256) {
        st.luma((ly + i / 16) * st.lw + lx + i % 16) = br.u(8); i += 1
      }
      i = 0
      while (i < 64) {
        st.cb((cy + i / 8) * st.cw + cx + i % 8) = br.u(8); i += 1
      }
      i = 0
      while (i < 64) {
        st.cr((cy + i / 8) * st.cw + cx + i % 8) = br.u(8); i += 1
      }
      var b = 0
      while (b < 16) {
        st.lumaNz((mbY * 4 + ZScanY(b)) * st.mbW * 4 + mbX * 4 + ZScanX(b)) = 16
        b += 1
      }
      b = 0
      while (b < 4) {
        val idx = (mbY * 2 + b / 2) * st.mbW * 2 + mbX * 2 + b % 2
        st.cbNz(idx) = 16; st.crNz(idx) = 16
        b += 1
      }
      st.markMb(mbX, mbY, slice, 3)
      return qp
    }

    if (mbTypeCode == 0) { // I_4x4
      // parse: 16 pred modes, chroma mode, cbp, qp delta, residual
      val remModes = Array.ofDim[Int](16) // -1 = use predicted
      var b = 0
      while (b < 16) {
        remModes(b) = if (br.flag()) -1 else br.u(3)
        b += 1
      }
      val chromaMode = br.ue()
      val cbpCode = br.ue()
      if (cbpCode >= 48) throw new IllegalStateException("bad cbp")
      val cbp = CbpIntraOfCodeNum(cbpCode)
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      if (cbp != 0) qp = ((qp + br.se()) + 52) % 52
      // resolve block modes in z order (prediction context is modes of
      // already-resolved neighbors)
      st.markMb(mbX, mbY, slice, 1) // slice id needed by mode prediction
      // un-mark done: blocks become done one by one below
      var y = mbY * 4
      while (y < mbY * 4 + 4) {
        var x = mbX * 4
        while (x < mbX * 4 + 4) { st.done(y * st.mbW * 4 + x) = false; x += 1 }
        y += 1
      }
      val modes = Array.ofDim[Int](16)
      b = 0
      while (b < 16) {
        val bx = mbX * 4 + ZScanX(b); val by = mbY * 4 + ZScanY(b)
        val pred = st.predIntra4x4Mode(bx, by, slice)
        modes(b) =
          if (remModes(b) < 0) pred
          else if (remModes(b) < pred) remModes(b)
          else remModes(b) + 1
        st.i4Mode(by * st.mbW * 4 + bx) = modes(b)
        b += 1
      }
      // parse residual levels (z order, nC context updates as we go)
      val blkCoeffs = Array.ofDim[Array[Int]](16)
      b = 0
      while (b < 16) {
        val bx = mbX * 4 + ZScanX(b); val by = mbY * 4 + ZScanY(b)
        if ((cbpLuma & (1 << (b / 4))) != 0) {
          val nC = st.lumaNC(bx, by, slice)
          val (coeffs, tc) = readResidualBlock(br, nC, 16)
          blkCoeffs(b) = coeffs
          st.lumaNz(by * st.mbW * 4 + bx) = tc
        } else {
          blkCoeffs(b) = new Array[Int](16)
          st.lumaNz(by * st.mbW * 4 + bx) = 0
        }
        b += 1
      }
      // reconstruct blocks in z order
      b = 0
      while (b < 16) {
        val bx = mbX * 4 + ZScanX(b); val by = mbY * 4 + ZScanY(b)
        val px = bx * 4; val py = by * 4
        val pr = predict4x4(modes(b), st.luma, st.lw, px, py,
          st.blockDone(bx - 1, by, slice), st.blockDone(bx, by - 1, slice),
          st.blockDone(bx - 1, by - 1, slice),
          st.blockDone(bx + 1, by - 1, slice))
        val d = dequant4x4(blkCoeffs(b), qp, 0)
        reconBlock(st.luma, st.lw, px, py, pr, 4, 0, 0, d)
        st.done(by * st.mbW * 4 + bx) = true
        b += 1
      }
      decodeChroma(br, st, mbX, mbY, slice, chromaMode, cbpChroma,
        chromaQp(qp, chromaQpOff), availL, availA)
      return qp
    }

    if (mbTypeCode > 25) throw new IllegalStateException("bad mb_type")
    // I_16x16
    val predMode = (mbTypeCode - 1) % 4
    val cbpChroma = ((mbTypeCode - 1) / 4) % 3
    val cbpLuma = if (mbTypeCode - 1 >= 12) 15 else 0
    val chromaMode = br.ue()
    qp = ((qp + br.se()) + 52) % 52
    // mark before residual parsing: in-MB neighbors feed the nC context
    st.markMb(mbX, mbY, slice, 2)
    // DC block: nC as for luma block 0
    val nCDc = st.lumaNC(mbX * 4, mbY * 4, slice)
    val (dcScan, _) = readResidualBlock(br, nCDc, 16)
    // un-zigzag the DC plane (4x4 grid raster)
    val dcRaster = Array.ofDim[Int](16)
    var k = 0
    while (k < 16) { dcRaster(Zigzag4x4(k)) = dcScan(k); k += 1 }
    val dcScaled = dequantLumaDc(dcRaster, qp)
    // AC blocks
    val acCoeffs = Array.ofDim[Array[Int]](16)
    var b = 0
    while (b < 16) {
      val bx = mbX * 4 + ZScanX(b); val by = mbY * 4 + ZScanY(b)
      if (cbpLuma != 0) {
        val nC = st.lumaNC(bx, by, slice)
        val (coeffs, tc) = readResidualBlock(br, nC, 15)
        acCoeffs(b) = coeffs
        st.lumaNz(by * st.mbW * 4 + bx) = tc
      } else {
        acCoeffs(b) = new Array[Int](15)
        st.lumaNz(by * st.mbW * 4 + bx) = 0
      }
      b += 1
    }
    val pr = predict16x16(predMode, st.luma, st.lw, lx, ly, availL, availA)
    b = 0
    while (b < 16) {
      val zx = ZScanX(b); val zy = ZScanY(b)
      val d = dequant4x4(acCoeffs(b), qp, 1)
      d(0) = dcScaled(zy * 4 + zx)
      reconBlock(st.luma, st.lw, lx + zx * 4, ly + zy * 4, pr, 16,
        zx * 4, zy * 4, d)
      b += 1
    }
    decodeChroma(br, st, mbX, mbY, slice, chromaMode, cbpChroma,
      chromaQp(qp, chromaQpOff), availL, availA)
    qp
  }

  /** Chroma halves of I_4x4 / I_16x16 macroblocks. */
  private def decodeChroma(br: BitReader, st: PicState, mbX: Int,
      mbY: Int, slice: Int, chromaMode: Int, cbpChroma: Int, qpc: Int,
      availL: Boolean, availA: Boolean): Unit = {
    import H264Transform._
    val cx = mbX * 8; val cy = mbY * 8
    // DC levels first (both components), then AC (both), per spec
    val dcLevels = Array.ofDim[Array[Int]](2)
    var c = 0
    while (c < 2) {
      dcLevels(c) =
        if (cbpChroma != 0) readResidualBlock(br, -1, 4)._1
        else new Array[Int](4)
      c += 1
    }
    val acLevels = Array.ofDim[Array[Array[Int]]](2)
    c = 0
    while (c < 2) {
      val nzGrid = if (c == 0) st.cbNz else st.crNz
      acLevels(c) = Array.ofDim[Array[Int]](4)
      var b = 0
      while (b < 4) {
        val bx = mbX * 2 + b % 2; val by = mbY * 2 + b / 2
        if (cbpChroma == 2) {
          val nC = st.chromaNC(nzGrid, bx, by, slice)
          val (coeffs, tc) = readResidualBlock(br, nC, 15)
          acLevels(c)(b) = coeffs
          nzGrid(by * st.mbW * 2 + bx) = tc
        } else {
          acLevels(c)(b) = new Array[Int](15)
          nzGrid(by * st.mbW * 2 + bx) = 0
        }
        b += 1
      }
      c += 1
    }
    c = 0
    while (c < 2) {
      val plane = if (c == 0) st.cb else st.cr
      val pr = predictChroma(chromaMode, plane, st.cw, cx, cy,
        availL, availA)
      val dcScaled = dequantChromaDc(dcLevels(c), qpc)
      var b = 0
      while (b < 4) {
        val d = dequant4x4(acLevels(c)(b), qpc, 1)
        d(0) = dcScaled(b)
        reconBlock(plane, st.cw, cx + (b % 2) * 4, cy + (b / 2) * 4,
          pr, 8, (b % 2) * 4, (b / 2) * 4, d)
        b += 1
      }
      c += 1
    }
  }

  // ------------------------------------------------------------------
  // stream-level decode API
  // ------------------------------------------------------------------

  /** True if the payload looks like an Annex-B H.264 elementary stream
    * (start code followed by an SPS or access-unit-delimiter NAL). */
  def isAnnexB(content: Array[Byte]): Boolean = {
    def nalAt(i: Int): Int =
      if (i < content.length) content(i) & 0x1f else -1
    if (content.length < 5) false
    else if (content(0) == 0 && content(1) == 0 && content(2) == 1)
      Set(7, 9).contains(nalAt(3))
    else if (content.length >= 6 && content(0) == 0 && content(1) == 0 &&
      content(2) == 0 && content(3) == 1)
      Set(7, 9).contains(nalAt(4))
    else false
  }

  /** Decode the I-pictures of an Annex-B baseline stream: returns
    * (frameRate, pictures in decode order), or None if the stream is
    * not decodable baseline H.264 or holds no complete I-picture.
    * P/B slices are skipped (I-frame sampling semantics, as
    * [[Mpeg1.decodeIPictures]]). */
  def decodeIPictures(content: Array[Byte], maxPictures: Int)
      : Option[(Double, Seq[Mpeg1.Picture])] = {
    try {
      val nals = splitAnnexB(content)
      if (nals.isEmpty) return None
      var sps: Option[Sps] = None
      var pps: Option[Pps] = None
      val pics = scala.collection.mutable.ArrayBuffer.empty[Mpeg1.Picture]
      var st: PicState = null
      var sliceCounter = 0
      def finish(): Unit = if (st != null && st.decodedMbs > 0) {
        pics += st.toPicture
        st = null
      }
      val it = nals.iterator
      while (it.hasNext && pics.length < maxPictures) {
        val (typ, refIdc, rbsp) = it.next()
        typ match {
          case 7 => sps = parseSps(rbsp).orElse(return None)
          case 8 => pps = parsePps(rbsp).orElse(return None)
          case 1 | 5 =>
            (sps, pps) match {
              case (Some(s), Some(p)) =>
                if (p.entropyCabac) return None // CAVLC only
                val br = new BitReader(rbsp)
                val firstMb = br.ue()
                val sliceType = br.ue()
                if (sliceType == 2 || sliceType == 7) {
                  br.ue() // pps id
                  br.u(s.log2MaxFrameNum) // frame_num
                  if (typ == 5) br.ue() // idr_pic_id
                  if (s.pocType == 0) {
                    br.u(s.log2MaxPocLsb)
                    if (p.bottomFieldPicOrder) br.se()
                  }
                  if (p.redundantPicCnt && br.ue() != 0) {
                    // redundant coded picture: skip
                  } else {
                    // dec_ref_pic_marking: present ONLY when
                    // nal_ref_idc != 0 (7.3.3) — non-reference I
                    // slices carry no marking syntax at all
                    if (refIdc != 0) {
                      if (typ == 5) { br.flag(); br.flag() }
                      else if (br.flag()) return None // MMCO unsupported
                    }
                    val qpSlice = p.picInitQp + br.se()
                    if (p.deblockControl) {
                      val idc = br.ue()
                      if (idc != 1) { br.se(); br.se() }
                    }
                    if (firstMb == 0) { finish(); st = new PicState(s) }
                    if (st != null && qpSlice >= 0 && qpSlice <= 51) {
                      sliceCounter += 1
                      val stop = rbspStopBit(rbsp)
                      var mbAddr = firstMb
                      var qp = qpSlice
                      while (br.pos < stop && mbAddr < st.mbW * st.mbH) {
                        qp = decodeMacroblock(br, st,
                          mbAddr % st.mbW, mbAddr / st.mbW,
                          sliceCounter, qp, p.chromaQpIndexOffset)
                        mbAddr += 1
                      }
                    }
                  }
                } else if (firstMb == 0) finish() // P/B picture boundary
              case _ =>
            }
          case _ =>
        }
      }
      finish()
      if (pics.isEmpty) None
      else Some((sps.map(_.fps).getOrElse(25.0), pics.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Frame sampling facade matching [[Mpeg1.decodeFrames]]: up to
    * `maxFrames` evenly spaced decoded I-frames as (seconds, png). */
  def decodeFrames(content: Array[Byte], maxFrames: Int)
      : Option[Seq[(Double, Array[Byte])]] = {
    if (!isAnnexB(content)) return None
    decodeIPictures(content,
      maxPictures = if (maxFrames == 1) 1 else 64).map {
      case (rate, pics) =>
        val take = math.min(maxFrames, pics.length)
        val idxs = if (take == 1) Seq(0)
          else (0 until take).map(i => i * (pics.length - 1) / (take - 1))
        idxs.map(i => (i / rate, Mpeg1.pictureToPng(pics(i))))
    }
  }

  // ------------------------------------------------------------------
  // intra encoder (fixtures + round-trip proofs)
  // ------------------------------------------------------------------

  /** Encode pictures as a baseline Annex-B stream of IDR frames.
    * `mbMode`: "i16" (I_16x16, DC prediction), "i4" (I_4x4, DC), "pcm"
    * (lossless I_PCM), or "mixed" (cycles all three per macroblock).
    * The encoder runs the decoder's exact reconstruction, so
    * `decodeIPictures(encodeIntra(f)) == encoder reconstruction`
    * bit-for-bit; PCM macroblocks reconstruct the input itself.
    * Deblocking is signalled OFF (`disable_deblocking_filter_idc=1`).
    * Requires even width/height (4:2:0 cropping granularity). */
  def encodeIntra(frames: Seq[Mpeg1.Picture], qp: Int = 20,
      fps: Int = 25, mbMode: String = "i16"): Array[Byte] =
    encodeWithRecon(frames, qp, fps, mbMode)._1

  /** [[encodeIntra]] plus the encoder-side reconstructions — what a
    * conforming decoder must reproduce bit-for-bit (the round-trip
    * tests' reference). */
  def encodeWithRecon(frames: Seq[Mpeg1.Picture], qp: Int = 20,
      fps: Int = 25, mbMode: String = "i16")
      : (Array[Byte], Seq[Mpeg1.Picture]) = {
    import H264Transform._
    require(frames.nonEmpty, "no frames")
    require(qp >= 8 && qp <= 51, s"qp out of range: $qp")
    val w = frames.head.width; val h = frames.head.height
    require(w % 2 == 0 && h % 2 == 0, "even dimensions required (4:2:0)")
    require(frames.forall(f => f.width == w && f.height == h))
    val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
    val sps = Sps(66, 30, 4, 2, 0, mbW, mbH,
      0, (mbW * 16 - w) / 2, 0, (mbH * 16 - h) / 2, fps.toDouble)
    val out = new java.io.ByteArrayOutputStream()
    def emitNal(header: Int, rbsp: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 0, 1))
      out.write(header)
      out.write(escapeRbsp(rbsp))
    }
    // --- SPS ---
    val spsW = new BitWriter
    spsW.write(66, 8); spsW.write(0x80, 8); spsW.write(30, 8)
    spsW.ue(0) // sps id
    spsW.ue(0) // log2_max_frame_num_minus4 -> 4
    spsW.ue(2) // pic_order_cnt_type
    spsW.ue(1) // max_num_ref_frames
    spsW.write(0, 1) // gaps
    spsW.ue(mbW - 1); spsW.ue(mbH - 1)
    spsW.write(1, 1) // frame_mbs_only
    spsW.write(1, 1) // direct_8x8_inference
    if (sps.cropR > 0 || sps.cropB > 0) {
      spsW.write(1, 1)
      spsW.ue(0); spsW.ue(sps.cropR); spsW.ue(0); spsW.ue(sps.cropB)
    } else spsW.write(0, 1)
    spsW.write(1, 1) // vui present
    spsW.write(0, 4) // aspect/overscan/video_signal/chroma_loc absent
    spsW.write(1, 1) // timing info
    val timeScale = 2L * fps
    spsW.write(0, 16); spsW.write(1, 16) // num_units_in_tick = 1
    spsW.write((timeScale >> 16).toInt, 16)
    spsW.write((timeScale & 0xffff).toInt, 16)
    spsW.write(1, 1) // fixed_frame_rate
    spsW.write(0, 4) // hrd x2, pic_struct, bitstream_restriction absent
    spsW.trailing()
    emitNal(0x67, spsW.bytes)
    // --- PPS ---
    val ppsW = new BitWriter
    ppsW.ue(0); ppsW.ue(0)
    ppsW.write(0, 1) // CAVLC
    ppsW.write(0, 1) // bottom_field_pic_order
    ppsW.ue(0) // one slice group
    ppsW.ue(0); ppsW.ue(0)
    ppsW.write(0, 1); ppsW.write(0, 2) // weighted pred
    ppsW.se(qp - 26); ppsW.se(0); ppsW.se(0)
    ppsW.write(1, 1) // deblocking_filter_control_present
    ppsW.write(0, 1); ppsW.write(0, 1)
    ppsW.trailing()
    emitNal(0x68, ppsW.bytes)
    // --- IDR slices ---
    val recons = scala.collection.mutable.ArrayBuffer.empty[Mpeg1.Picture]
    frames.zipWithIndex.foreach { case (f, idx) =>
      val bw = new BitWriter
      bw.ue(0) // first_mb_in_slice
      bw.ue(7) // slice_type I (all slices)
      bw.ue(0) // pps id
      bw.write(0, 4) // frame_num
      bw.ue(idx & 1) // idr_pic_id (must differ between consecutive IDRs)
      bw.write(0, 1); bw.write(0, 1) // dec_ref_pic_marking
      bw.se(0) // slice_qp_delta
      bw.ue(1) // disable_deblocking_filter_idc
      val st = new PicState(sps)
      // padded source planes (edge replication)
      val lp = Array.ofDim[Int](st.lw * mbH * 16)
      val cbp = Array.ofDim[Int](st.cw * mbH * 8)
      val crp = Array.ofDim[Int](st.cw * mbH * 8)
      val fcw = (w + 1) / 2
      var y = 0
      while (y < mbH * 16) {
        var x = 0
        while (x < st.lw) {
          lp(y * st.lw + x) =
            f.y(math.min(y, h - 1) * w + math.min(x, w - 1))
          x += 1
        }
        y += 1
      }
      y = 0
      while (y < mbH * 8) {
        var x = 0
        while (x < st.cw) {
          val sy = math.min(y, h / 2 - 1); val sx = math.min(x, w / 2 - 1)
          cbp(y * st.cw + x) = f.cb(sy * fcw + sx)
          crp(y * st.cw + x) = f.cr(sy * fcw + sx)
          x += 1
        }
        y += 1
      }
      var mb = 0
      while (mb < mbW * mbH) {
        val mbX = mb % mbW; val mbY = mb / mbW
        val kind = mbMode match {
          case "mixed" => Seq("i16", "i4", "pcm")((mbX + mbY + idx) % 3)
          case k => k
        }
        kind match {
          case "pcm" => encodeMbPcm(bw, st, mbX, mbY, lp, cbp, crp)
          case "i4" => encodeMbI4(bw, st, mbX, mbY, qp, lp, cbp, crp)
          case _ => encodeMbI16(bw, st, mbX, mbY, qp, lp, cbp, crp)
        }
        mb += 1
      }
      bw.trailing()
      emitNal(0x65, bw.bytes)
      recons += st.toPicture
    }
    (out.toByteArray, recons.toSeq)
  }

  private def encodeMbPcm(bw: BitWriter, st: PicState, mbX: Int,
      mbY: Int, lp: Array[Int], cbp: Array[Int], crp: Array[Int]): Unit = {
    bw.ue(25)
    bw.align() // pcm_alignment_zero_bit(s)
    val lx = mbX * 16; val ly = mbY * 16
    val cx = mbX * 8; val cy = mbY * 8
    var i = 0
    while (i < 256) {
      val v = lp((ly + i / 16) * st.lw + lx + i % 16)
      bw.write(v, 8)
      st.luma((ly + i / 16) * st.lw + lx + i % 16) = v
      i += 1
    }
    i = 0
    while (i < 64) {
      val v = cbp((cy + i / 8) * st.cw + cx + i % 8)
      bw.write(v, 8)
      st.cb((cy + i / 8) * st.cw + cx + i % 8) = v
      i += 1
    }
    i = 0
    while (i < 64) {
      val v = crp((cy + i / 8) * st.cw + cx + i % 8)
      bw.write(v, 8)
      st.cr((cy + i / 8) * st.cw + cx + i % 8) = v
      i += 1
    }
    var b = 0
    while (b < 16) {
      st.lumaNz((mbY * 4 + ZScanY(b)) * st.mbW * 4 + mbX * 4 + ZScanX(b)) = 16
      b += 1
    }
    b = 0
    while (b < 4) {
      val idx = (mbY * 2 + b / 2) * st.mbW * 2 + mbX * 2 + b % 2
      st.cbNz(idx) = 16; st.crNz(idx) = 16
      b += 1
    }
    st.markMb(mbX, mbY, 1, 3)
  }

  private def encodeMbI16(bw: BitWriter, st: PicState, mbX: Int,
      mbY: Int, qp: Int, lp: Array[Int], cbpl: Array[Int],
      crpl: Array[Int]): Unit = {
    import H264Transform._
    val slice = 1
    val lx = mbX * 16; val ly = mbY * 16
    val availL = st.mbAvail(mbX - 1, mbY, slice)
    val availA = st.mbAvail(mbX, mbY - 1, slice)
    val pred = predict16x16(2, st.luma, st.lw, lx, ly, availL, availA)
    // forward transform per 4x4 block (z order), collect DC plane
    val dcRaster = Array.ofDim[Int](16)
    val acLev = Array.ofDim[Array[Int]](16)
    var b = 0
    while (b < 16) {
      val zx = ZScanX(b); val zy = ZScanY(b)
      val blk = Array.ofDim[Int](16)
      var i = 0
      while (i < 16) {
        val px = zx * 4 + i % 4; val py = zy * 4 + i / 4
        blk(i) = lp((ly + py) * st.lw + lx + px) - pred(py * 16 + px)
        i += 1
      }
      val wv = ftransform4x4(blk)
      dcRaster(zy * 4 + zx) = wv(0)
      acLev(b) = quant4x4(wv, qp, 1)
      b += 1
    }
    val dcLev = quantLumaDc(hadamard4x4(dcRaster), qp)
    val cbpLuma = if (acLev.exists(_.exists(_ != 0))) 15 else 0
    // chroma
    val qpc = chromaQp(qp, 0)
    val (cbDc, cbAc) = encodeChromaHalf(st, st.cb, cbpl, mbX, mbY, qpc,
      availL, availA)
    val (crDc, crAc) = encodeChromaHalf(st, st.cr, crpl, mbX, mbY, qpc,
      availL, availA)
    val anyChromaAc = cbAc.exists(_.exists(_ != 0)) ||
      crAc.exists(_.exists(_ != 0))
    val anyChromaDc = cbDc.exists(_ != 0) || crDc.exists(_ != 0)
    val cbpChroma = if (anyChromaAc) 2 else if (anyChromaDc) 1 else 0
    val mbType = 1 + 2 + 4 * cbpChroma + (if (cbpLuma == 15) 12 else 0)
    bw.ue(mbType)
    bw.ue(0) // intra_chroma_pred_mode DC
    bw.se(0) // mb_qp_delta
    st.markMb(mbX, mbY, slice, 2)
    // DC block: zigzag the DC plane into scan order
    val dcScan = Array.ofDim[Int](16)
    var k = 0
    while (k < 16) { dcScan(k) = dcLev(Zigzag4x4(k)); k += 1 }
    writeResidualBlock(bw, dcScan, st.lumaNC(mbX * 4, mbY * 4, slice))
    b = 0
    while (b < 16) {
      val bx = mbX * 4 + ZScanX(b); val by = mbY * 4 + ZScanY(b)
      if (cbpLuma != 0) {
        val tc = writeResidualBlock(bw, acLev(b),
          st.lumaNC(bx, by, slice))
        st.lumaNz(by * st.mbW * 4 + bx) = tc
      } else st.lumaNz(by * st.mbW * 4 + bx) = 0
      b += 1
    }
    writeChromaResidual(bw, st, mbX, mbY, slice, cbpChroma,
      cbDc, cbAc, crDc, crAc)
    // reconstruct exactly as the decoder does
    val dcScaled = dequantLumaDc(dcLev, qp)
    b = 0
    while (b < 16) {
      val zx = ZScanX(b); val zy = ZScanY(b)
      val levels = if (cbpLuma != 0) acLev(b) else new Array[Int](15)
      val d = dequant4x4(levels, qp, 1)
      d(0) = dcScaled(zy * 4 + zx)
      reconBlock(st.luma, st.lw, lx + zx * 4, ly + zy * 4, pred, 16,
        zx * 4, zy * 4, d)
      b += 1
    }
    reconChroma(st, mbX, mbY, qpc, cbpChroma, cbDc, cbAc, crDc, crAc,
      availL, availA)
  }

  /** Forward-transform + quantize one chroma component of an MB with
    * DC prediction; returns (dcLevels raster 2x2, acLevels per block). */
  private def encodeChromaHalf(st: PicState, recon: Array[Int],
      src: Array[Int], mbX: Int, mbY: Int, qpc: Int, availL: Boolean,
      availA: Boolean): (Array[Int], Array[Array[Int]]) = {
    import H264Transform._
    val cx = mbX * 8; val cy = mbY * 8
    val pred = predictChroma(0, recon, st.cw, cx, cy, availL, availA)
    val dcIn = Array.ofDim[Int](4)
    val ac = Array.ofDim[Array[Int]](4)
    var b = 0
    while (b < 4) {
      val bx = (b % 2) * 4; val by = (b / 2) * 4
      val blk = Array.ofDim[Int](16)
      var i = 0
      while (i < 16) {
        val px = bx + i % 4; val py = by + i / 4
        blk(i) = src((cy + py) * st.cw + cx + px) - pred(py * 8 + px)
        i += 1
      }
      val wv = ftransform4x4(blk)
      dcIn(b) = wv(0)
      ac(b) = quant4x4(wv, qpc, 1)
      b += 1
    }
    (quantChromaDc(hadamard2x2(dcIn), qpc), ac)
  }

  private def writeChromaResidual(bw: BitWriter, st: PicState,
      mbX: Int, mbY: Int, slice: Int, cbpChroma: Int, cbDc: Array[Int],
      cbAc: Array[Array[Int]], crDc: Array[Int],
      crAc: Array[Array[Int]]): Unit = {
    if (cbpChroma != 0) {
      writeResidualBlock(bw, cbDc, -1)
      writeResidualBlock(bw, crDc, -1)
    }
    var c = 0
    while (c < 2) {
      val nzGrid = if (c == 0) st.cbNz else st.crNz
      val ac = if (c == 0) cbAc else crAc
      var b = 0
      while (b < 4) {
        val bx = mbX * 2 + b % 2; val by = mbY * 2 + b / 2
        if (cbpChroma == 2) {
          val tc = writeResidualBlock(bw, ac(b),
            st.chromaNC(nzGrid, bx, by, slice))
          nzGrid(by * st.mbW * 2 + bx) = tc
        } else nzGrid(by * st.mbW * 2 + bx) = 0
        b += 1
      }
      c += 1
    }
  }

  /** Decoder-identical chroma reconstruction from encode-side levels. */
  private def reconChroma(st: PicState, mbX: Int, mbY: Int, qpc: Int,
      cbpChroma: Int, cbDc: Array[Int], cbAc: Array[Array[Int]],
      crDc: Array[Int], crAc: Array[Array[Int]], availL: Boolean,
      availA: Boolean): Unit = {
    import H264Transform._
    val cx = mbX * 8; val cy = mbY * 8
    var c = 0
    while (c < 2) {
      val plane = if (c == 0) st.cb else st.cr
      val dcL = if (cbpChroma != 0) (if (c == 0) cbDc else crDc)
        else new Array[Int](4)
      val acL = if (c == 0) cbAc else crAc
      val pred = predictChroma(0, plane, st.cw, cx, cy, availL, availA)
      val dcScaled = dequantChromaDc(dcL, qpc)
      var b = 0
      while (b < 4) {
        val levels = if (cbpChroma == 2) acL(b) else new Array[Int](15)
        val d = dequant4x4(levels, qpc, 1)
        d(0) = dcScaled(b)
        reconBlock(plane, st.cw, cx + (b % 2) * 4, cy + (b / 2) * 4,
          pred, 8, (b % 2) * 4, (b / 2) * 4, d)
        b += 1
      }
      c += 1
    }
  }

  private def encodeMbI4(bw: BitWriter, st: PicState, mbX: Int,
      mbY: Int, qp: Int, lp: Array[Int], cbpl: Array[Int],
      crpl: Array[Int]): Unit = {
    import H264Transform._
    val slice = 1
    val availL = st.mbAvail(mbX - 1, mbY, slice)
    val availA = st.mbAvail(mbX, mbY - 1, slice)
    st.markMb(mbX, mbY, slice, 1)
    var yy = mbY * 4
    while (yy < mbY * 4 + 4) {
      var xx = mbX * 4
      while (xx < mbX * 4 + 4) {
        st.done(yy * st.mbW * 4 + xx) = false; xx += 1
      }
      yy += 1
    }
    // compute phase: all modes are DC (2); residuals + recon in z order
    val lev = Array.ofDim[Array[Int]](16)
    val flags = Array.ofDim[(Boolean, Int)](16)
    var b = 0
    while (b < 16) {
      val bx = mbX * 4 + ZScanX(b); val by = mbY * 4 + ZScanY(b)
      val predMode = st.predIntra4x4Mode(bx, by, slice)
      flags(b) =
        if (predMode == 2) (true, 0)
        else (false, if (2 < predMode) 2 else 1) // rem for actual mode 2
      st.i4Mode(by * st.mbW * 4 + bx) = 2
      val px = bx * 4; val py = by * 4
      val pr = predict4x4(2, st.luma, st.lw, px, py,
        st.blockDone(bx - 1, by, slice), st.blockDone(bx, by - 1, slice),
        st.blockDone(bx - 1, by - 1, slice),
        st.blockDone(bx + 1, by - 1, slice))
      val blk = Array.ofDim[Int](16)
      var i = 0
      while (i < 16) {
        blk(i) = lp((py + i / 4) * st.lw + px + i % 4) - pr(i)
        i += 1
      }
      lev(b) = quant4x4(ftransform4x4(blk), qp, 0)
      val d = dequant4x4(lev(b), qp, 0)
      reconBlock(st.luma, st.lw, px, py, pr, 4, 0, 0, d)
      st.done(by * st.mbW * 4 + bx) = true
      b += 1
    }
    var cbpLuma = 0
    b = 0
    while (b < 16) {
      if (lev(b).exists(_ != 0)) cbpLuma |= 1 << (b / 4)
      b += 1
    }
    val qpc = chromaQp(qp, 0)
    val (cbDc, cbAc) = encodeChromaHalf(st, st.cb, cbpl, mbX, mbY, qpc,
      availL, availA)
    val (crDc, crAc) = encodeChromaHalf(st, st.cr, crpl, mbX, mbY, qpc,
      availL, availA)
    val anyChromaAc = cbAc.exists(_.exists(_ != 0)) ||
      crAc.exists(_.exists(_ != 0))
    val anyChromaDc = cbDc.exists(_ != 0) || crDc.exists(_ != 0)
    val cbpChroma = if (anyChromaAc) 2 else if (anyChromaDc) 1 else 0
    val cbp = cbpLuma | (cbpChroma << 4)
    // write phase
    bw.ue(0)
    b = 0
    while (b < 16) {
      val (useP, rem) = flags(b)
      bw.write(if (useP) 1 else 0, 1)
      if (!useP) bw.write(rem, 3)
      b += 1
    }
    bw.ue(0) // intra_chroma_pred_mode DC
    bw.ue(CodeNumOfCbpIntra(cbp))
    if (cbp != 0) bw.se(0) // mb_qp_delta
    b = 0
    while (b < 16) {
      val bx = mbX * 4 + ZScanX(b); val by = mbY * 4 + ZScanY(b)
      if ((cbpLuma & (1 << (b / 4))) != 0) {
        val tc = writeResidualBlock(bw, lev(b), st.lumaNC(bx, by, slice))
        st.lumaNz(by * st.mbW * 4 + bx) = tc
      } else st.lumaNz(by * st.mbW * 4 + bx) = 0
      b += 1
    }
    writeChromaResidual(bw, st, mbX, mbY, slice, cbpChroma,
      cbDc, cbAc, crDc, crAc)
    reconChroma(st, mbX, mbY, qpc, cbpChroma, cbDc, cbAc, crDc, crAc,
      availL, availA)
  }
}

object H264Transform {
  // ------------------------------------------------------------------
  // integer transforms + quantization (spec 8.5; encoder per the
  // well-known reference formulation with MF/V tables)
  // ------------------------------------------------------------------

  /** zig-zag scan for frame 4x4 blocks (Table 8-13). */
  val Zigzag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // dequant scale V (Table: LevelScale4x4) by qP%6 and position class
  private val V0 = Array(10, 11, 13, 14, 16, 18)
  private val V1 = Array(16, 18, 20, 23, 25, 29)
  private val V2 = Array(13, 14, 16, 18, 20, 23)
  // encoder multipliers MF by qP%6 and position class
  private val M0 = Array(13107, 11916, 10082, 9362, 8192, 7282)
  private val M1 = Array(5243, 4660, 4194, 3647, 3355, 2893)
  private val M2 = Array(8066, 7490, 6554, 5825, 5243, 4559)

  @inline private def posClass(i: Int): Int = {
    val r = i >> 2; val c = i & 3
    if ((r == 0 || r == 2) && (c == 0 || c == 2)) 0
    else if ((r == 1 || r == 3) && (c == 1 || c == 3)) 1
    else 2
  }

  def levelScale(qpMod6: Int, i: Int): Int = posClass(i) match {
    case 0 => V0(qpMod6); case 1 => V1(qpMod6); case _ => V2(qpMod6)
  }
  private def mf(qpMod6: Int, i: Int): Int = posClass(i) match {
    case 0 => M0(qpMod6); case 1 => M1(qpMod6); case _ => M2(qpMod6)
  }

  /** chroma QP from luma QP + offset (Table 8-15). */
  private val QpcTable = Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
    36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)
  def chromaQp(qpY: Int, offset: Int): Int = {
    val qpI = math.max(0, math.min(51, qpY + offset))
    if (qpI < 30) qpI else QpcTable(qpI - 30)
  }

  /** Inverse 4x4 transform core (8.5.12.2): in-place on a 16-array of
    * dequantized coefficients; output residual BEFORE the +32>>6. */
  def itransform4x4(d: Array[Int]): Array[Int] = {
    val e = Array.ofDim[Int](16)
    var r = 0
    while (r < 4) { // horizontal
      val o = r * 4
      val e0 = d(o) + d(o + 2)
      val e1 = d(o) - d(o + 2)
      val e2 = (d(o + 1) >> 1) - d(o + 3)
      val e3 = d(o + 1) + (d(o + 3) >> 1)
      e(o) = e0 + e3; e(o + 1) = e1 + e2
      e(o + 2) = e1 - e2; e(o + 3) = e0 - e3
      r += 1
    }
    val out = Array.ofDim[Int](16)
    var c = 0
    while (c < 4) { // vertical
      val g0 = e(c) + e(8 + c)
      val g1 = e(c) - e(8 + c)
      val g2 = (e(4 + c) >> 1) - e(12 + c)
      val g3 = e(4 + c) + (e(12 + c) >> 1)
      out(c) = g0 + g3; out(4 + c) = g1 + g2
      out(8 + c) = g1 - g2; out(12 + c) = g0 - g3
      c += 1
    }
    out
  }

  /** Forward 4x4 core transform W = Cf X Cf^T. */
  def ftransform4x4(x: Array[Int]): Array[Int] = {
    val t = Array.ofDim[Int](16)
    var r = 0
    while (r < 4) { // horizontal Cf
      val o = r * 4
      val s0 = x(o) + x(o + 3); val s1 = x(o + 1) + x(o + 2)
      val d0 = x(o) - x(o + 3); val d1 = x(o + 1) - x(o + 2)
      t(o) = s0 + s1; t(o + 1) = 2 * d0 + d1
      t(o + 2) = s0 - s1; t(o + 3) = d0 - 2 * d1
      r += 1
    }
    val w = Array.ofDim[Int](16)
    var c = 0
    while (c < 4) { // vertical
      val s0 = t(c) + t(12 + c); val s1 = t(4 + c) + t(8 + c)
      val d0 = t(c) - t(12 + c); val d1 = t(4 + c) - t(8 + c)
      w(c) = s0 + s1; w(4 + c) = 2 * d0 + d1
      w(8 + c) = s0 - s1; w(12 + c) = d0 - 2 * d1
      c += 1
    }
    w
  }

  /** 4x4 Hadamard (self-structured, used forward and inverse for the
    * Intra16x16 luma DC plane). */
  def hadamard4x4(x: Array[Int]): Array[Int] = {
    val t = Array.ofDim[Int](16)
    var r = 0
    while (r < 4) {
      val o = r * 4
      val s0 = x(o) + x(o + 3); val s1 = x(o + 1) + x(o + 2)
      val d0 = x(o) - x(o + 3); val d1 = x(o + 1) - x(o + 2)
      t(o) = s0 + s1; t(o + 1) = d0 + d1
      t(o + 2) = s0 - s1; t(o + 3) = d0 - d1
      r += 1
    }
    val out = Array.ofDim[Int](16)
    var c = 0
    while (c < 4) {
      val s0 = t(c) + t(12 + c); val s1 = t(4 + c) + t(8 + c)
      val d0 = t(c) - t(12 + c); val d1 = t(4 + c) - t(8 + c)
      out(c) = s0 + s1; out(4 + c) = d0 + d1
      out(8 + c) = s0 - s1; out(12 + c) = d0 - d1
      c += 1
    }
    out
  }

  /** 2x2 Hadamard for chroma DC (forward == inverse structure). */
  def hadamard2x2(x: Array[Int]): Array[Int] = Array(
    x(0) + x(1) + x(2) + x(3), x(0) - x(1) + x(2) - x(3),
    x(0) + x(1) - x(2) - x(3), x(0) - x(1) - x(2) + x(3))

  /** Dequantize a 4x4 AC/luma block's scan-ordered levels into raster
    * coefficient array (8.5.12.1). `startIdx` 1 skips the DC slot
    * (Intra16x16/chroma AC blocks). */
  def dequant4x4(levels: Array[Int], qp: Int, startIdx: Int): Array[Int] = {
    val d = Array.ofDim[Int](16)
    var k = 0
    while (k < levels.length) {
      val pos = Zigzag4x4(k + startIdx)
      d(pos) = (levels(k) * levelScale(qp % 6, pos)) << (qp / 6)
      k += 1
    }
    d
  }

  /** Inverse-scaled Intra16x16 luma DC (8.5.10): parsed DC levels (in
    * raster order of the 4x4 DC grid) -> fully scaled DC values. */
  def dequantLumaDc(dc: Array[Int], qp: Int): Array[Int] = {
    val f = hadamard4x4(dc)
    val ls = levelScale(qp % 6, 0)
    f.map { v =>
      if (qp >= 12) (v * ls) << (qp / 6 - 2)
      else (v * ls + (1 << (1 - qp / 6))) >> (2 - qp / 6)
    }
  }

  /** Inverse-scaled chroma DC (8.5.11, with the flat scaling-matrix
    * weight 16 folded OUT of our plain-V tables: the spec's >>5 is
    * >>4 scaling-matrix normalization + >>1 Hadamard half). */
  def dequantChromaDc(dc: Array[Int], qp: Int): Array[Int] = {
    val f = hadamard2x2(dc)
    val ls = levelScale(qp % 6, 0)
    f.map(v => ((v * ls) << (qp / 6)) >> 1)
  }

  /** Quantize a raster-order forward-transform block to scan-ordered
    * levels. `startIdx` 1 for AC-only blocks. Intra rounding f. */
  def quant4x4(w: Array[Int], qp: Int, startIdx: Int): Array[Int] = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val out = Array.ofDim[Int](16 - startIdx)
    var k = startIdx
    while (k < 16) {
      val pos = Zigzag4x4(k)
      val v = w(pos)
      val q = (math.abs(v) * mf(qp % 6, pos) + f) >> qbits
      out(k - startIdx) = if (v < 0) -q else q
      k += 1
    }
    out
  }

  /** Quantize the Hadamard-transformed luma DC plane. The inverse
    * Hadamard is unnormalized (gain 16) and [[dequantLumaDc]] only
    * divides by 4, so the encoder carries the remaining /4 here
    * (qbits+2) — the classic dct4x4dc-with->>1 formulation. */
  def quantLumaDc(wDc: Array[Int], qp: Int): Array[Int] = {
    val qbits = 17 + qp / 6
    val f = (1 << qbits) / 3
    wDc.map { v =>
      val q = (math.abs(v) * mf(qp % 6, 0) + f) >> qbits
      if (v < 0) -q else q
    }
  }

  /** Quantize the 2x2-Hadamard chroma DC plane (inverse gain 4,
    * [[dequantChromaDc]] divides by 2 -> encoder carries /2). */
  def quantChromaDc(wDc: Array[Int], qp: Int): Array[Int] = {
    val qbits = 16 + qp / 6
    val f = (1 << qbits) / 3
    wDc.map { v =>
      val q = (math.abs(v) * mf(qp % 6, 0) + f) >> qbits
      if (v < 0) -q else q
    }
  }
}
