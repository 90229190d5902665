package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` payloads + typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * Image payloads are REALLY decoded: `decodeImage` runs the pure-JVM
  * `javax.imageio` codecs (PNG/BMP/GIF/JPEG) and extracts pixel
  * statistics; WAV/PCM audio and the two pure-JVM video containers
  * (animated GIF, MJPEG-in-AVI) are really parsed too. Payloads no JVM
  * codec accepts (h264/mp4 and friends, whose codec libraries are not
  * in this container) fall back to `fakeDecode`, a clearly marked
  * deterministic STUB with the same feature shape, so the pipeline is
  * total either way and swapping in a JNI/FFI codec changes nothing
  * Spark-side.
  *
  * Scale: `mapPartitions` keeps per-batch decode state (a real codec's
  * native context) per partition, preserves partitioning, and never
  * collects media to the driver.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String,
      content: Array[Byte], width: Int, height: Int, duration_s: Double)

  case class MediaFeatures(media_id: Long, modality: String,
      n_bytes: Int, features: Array[Float])

  case class Frame(media_id: Long, frame_index: Int, offset_s: Double,
      content: Array[Byte])

  val FeatureDim = 16

  /** Build a media table from any (id, text) frame — payload = UTF-8
    * bytes standing in for encoded media, metadata derived
    * deterministically. */
  def syntheticMediaTable(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("content"),
      (pmod(col(idCol), lit(4)) * 64 + 64).cast("int").as("width"),
      (pmod(col(idCol), lit(3)) * 64 + 64).cast("int").as("height"),
      (pmod(col(idCol), lit(30)) + lit(1)).cast("double")
        .as("duration_s"))

  /** Real image decode via the JVM's built-in codecs. Returns pixel-stat
    * features: [1, width, height, meanR, meanG, meanB, mean/std/min/max
    * luminance, luminance histogram(4), aspect, coverage] — a fixed
    * FeatureDim-float vector, or None when no registered codec accepts
    * the payload. Single pass over pixels, no temporaries proportional
    * to the image. */
  def decodeImage(content: Array[Byte]): Option[Array[Float]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth; val hgt = img.getHeight
      val n = w.toLong * hgt
      var sumR = 0.0; var sumG = 0.0; var sumB = 0.0
      var sumL = 0.0; var sumL2 = 0.0
      var minL = Double.MaxValue; var maxL = Double.MinValue
      val hist = Array.ofDim[Long](4)
      var opaque = 0L
      var y = 0
      while (y < hgt) {
        var x = 0
        while (x < w) {
          val argb = img.getRGB(x, y)
          val a = (argb >>> 24) & 0xff
          val r = (argb >>> 16) & 0xff
          val g = (argb >>> 8) & 0xff
          val b = argb & 0xff
          if (a > 0) opaque += 1
          val lum = 0.299 * r + 0.587 * g + 0.114 * b
          sumR += r; sumG += g; sumB += b
          sumL += lum; sumL2 += lum * lum
          if (lum < minL) minL = lum
          if (lum > maxL) maxL = lum
          hist(math.min(3, (lum / 64.0).toInt)) += 1
          x += 1
        }
        y += 1
      }
      val meanL = sumL / n
      val varL = math.max(0.0, sumL2 / n - meanL * meanL)
      Some(Array[Float](1.0f, w.toFloat, hgt.toFloat,
        (sumR / n / 255.0).toFloat, (sumG / n / 255.0).toFloat,
        (sumB / n / 255.0).toFloat,
        (meanL / 255.0).toFloat, (math.sqrt(varL) / 255.0).toFloat,
        (minL / 255.0).toFloat, (maxL / 255.0).toFloat,
        hist(0).toFloat / n, hist(1).toFloat / n,
        hist(2).toFloat / n, hist(3).toFloat / n,
        w.toFloat / hgt, opaque.toFloat / n))
    }
  }

  /** Real audio decode for RIFF/WAVE PCM payloads — a pure-JVM header +
    * sample parse, no codec library needed. Returns waveform-stat
    * features: [2, sampleRate, channels, duration_s, meanAmp, rms, peak,
    * zero-crossing rate, amplitude histogram(4), dc offset, bitDepth,
    * clipping fraction] as a fixed FeatureDim-float vector, or None when
    * the payload is not parseable PCM WAV (then the caller falls back to
    * the stub). Supports 8-bit unsigned and 16-bit signed little-endian
    * PCM (format tag 1), mono or interleaved multi-channel; samples are
    * folded to mono by averaging channels. Single streaming pass. */
  def decodeAudioWav(content: Array[Byte]): Option[Array[Float]] =
    // malformed payloads (truncated chunks, lying sizes) must fall back
    // to the stub, never crash a task
    try decodeAudioWavImpl(content)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeAudioWavImpl(
      content: Array[Byte]): Option[Array[Float]] = {
    def le32(o: Int): Int =
      (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
        ((content(o + 2) & 0xff) << 16) | ((content(o + 3) & 0xff) << 24)
    def le16(o: Int): Int =
      (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def tag(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (content.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    // walk chunks for fmt + data
    var off = 12
    var fmtOff = -1; var dataOff = -1; var dataLen = 0
    while (off + 8 <= content.length && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(off); val sz = le32(off + 4)
      // long arithmetic: a lying sz near Int.MaxValue must not
      // overflow the bound check into acceptance
      if (sz < 0 || off.toLong + 8L + sz > content.length) return None
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (fmtOff < 0 || dataOff < 0) return None
    val fmtTag = le16(fmtOff)
    val channels = le16(fmtOff + 2)
    val sampleRate = le32(fmtOff + 4)
    val bits = le16(fmtOff + 14)
    if (fmtTag != 1 || channels < 1 || sampleRate <= 0 ||
        (bits != 8 && bits != 16)) return None
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    val nFrames = dataLen / frameBytes
    if (nFrames == 0) return None
    var sum = 0.0; var sumAbs = 0.0; var sum2 = 0.0
    var peak = 0.0; var crossings = 0L; var clipped = 0L
    var prevSign = 0
    val hist = Array.ofDim[Long](4)
    var f = 0
    while (f < nFrames) {
      val base = dataOff + f * frameBytes
      var acc = 0.0
      var c = 0
      while (c < channels) {
        val s =
          if (bits == 8) ((content(base + c) & 0xff) - 128) / 128.0
          else le16(base + c * 2).toShort / 32768.0
        acc += s
        c += 1
      }
      val v = acc / channels
      val av = math.abs(v)
      sum += v; sumAbs += av; sum2 += v * v
      if (av > peak) peak = av
      if (av >= 0.999) clipped += 1
      hist(math.min(3, (av * 4).toInt)) += 1
      val sign = if (v > 0) 1 else if (v < 0) -1 else 0
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
      }
      f += 1
    }
    Some(Array[Float](2.0f, sampleRate.toFloat, channels.toFloat,
      nFrames.toFloat / sampleRate,
      (sumAbs / nFrames).toFloat,
      math.sqrt(sum2 / nFrames).toFloat, peak.toFloat,
      crossings.toFloat / nFrames,
      hist(0).toFloat / nFrames, hist(1).toFloat / nFrames,
      hist(2).toFloat / nFrames, hist(3).toFloat / nFrames,
      (sum / nFrames).toFloat, bits.toFloat,
      clipped.toFloat / nFrames, 0.0f))
  }

  /** Mono-folded PCM samples + sample rate of a RIFF/WAVE payload —
    * the materialized-signal twin of the streaming
    * [[decodeAudioWav]] parse (same chunk-walk hardening), feeding
    * the FFT path [[extractAudioSpectral]]. Sample storage is bounded
    * by the payload size (8 bytes per frame of a payload that holds
    * ≥ 1 byte per frame). */
  def wavSamples(content: Array[Byte]): Option[(Int, Array[Double])] =
    try wavSamplesImpl(content)
    catch { case scala.util.control.NonFatal(_) => None }

  private def wavSamplesImpl(
      content: Array[Byte]): Option[(Int, Array[Double])] = {
    def le32(o: Int): Int =
      (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
        ((content(o + 2) & 0xff) << 16) | ((content(o + 3) & 0xff) << 24)
    def le16(o: Int): Int =
      (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def tag(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (content.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var off = 12
    var fmtOff = -1; var dataOff = -1; var dataLen = 0
    while (off + 8 <= content.length && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(off); val sz = le32(off + 4)
      if (sz < 0 || off.toLong + 8L + sz > content.length) return None
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    if (fmtOff < 0 || dataOff < 0) return None
    val fmtTag = le16(fmtOff)
    val channels = le16(fmtOff + 2)
    val sampleRate = le32(fmtOff + 4)
    val bits = le16(fmtOff + 14)
    if (fmtTag != 1 || channels < 1 || sampleRate <= 0 ||
        (bits != 8 && bits != 16)) return None
    val frameBytes = (bits / 8) * channels
    val nFrames = dataLen / frameBytes
    if (nFrames == 0) return None
    val out = Array.ofDim[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      val base = dataOff + f * frameBytes
      var acc = 0.0
      var c = 0
      while (c < channels) {
        acc += (if (bits == 8) ((content(base + c) & 0xff) - 128) / 128.0
          else le16(base + c * 2).toShort / 32768.0)
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    Some((sampleRate, out))
  }

  case class AudioSpectral(media_id: Long, sample_rate: Int,
      n_samples: Long, dom_bin: Int, dominant_hz: Double,
      centroid_hz: Double, rolloff_hz: Double, flatness: Double,
      band_energy: Array[Double], log_mel: Array[Double],
      mfcc: Array[Double])

  /** REAL spectral audio features — per row: parse WAV PCM, run the
    * hand-rolled radix-2 FFT ([[Dsp]]) over up to `maxWindows`
    * Hann-windowed frames, average the power spectrum, and summarize
    * (dominant bin + its exact frequency, spectral centroid, 85%
    * rolloff, flatness, `bands` equal-width band-energy fractions).
    * Rows that are not parseable PCM WAV are DROPPED (spectral
    * features of undecodable bytes are meaningless — unlike
    * [[extractFeatures]], there is no stub here).
    *
    * Scale shape: `mapPartitions` (one decoder context per partition,
    * the multimodal batch contract); per row O(maxWindows · fftSize ·
    * log fftSize) — independent of corpus size, embarrassingly
    * parallel. Deterministic: StrictMath trig, fixed window
    * placement, ties to the lowest bin. */
  def extractAudioSpectral(media: Dataset[MediaRow],
      fftSize: Int = 1024, maxWindows: Int = 8, bands: Int = 8,
      nMels: Int = 16): Dataset[AudioSpectral] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.modality != "audio") None
        else wavSamples(r.content).map { case (sr, samples) =>
          val pow = Dsp.averagePowerSpectrum(samples, fftSize, maxWindows)
          val (dom, cent, roll, flat, be) =
            Dsp.spectralSummary(pow, sr, fftSize, bands)
          val lm = Dsp.logMelEnergies(pow, sr, fftSize, nMels)
          AudioSpectral(r.media_id, sr, samples.length.toLong, dom,
            dom.toDouble * sr / fftSize, cent, roll, flat, be, lm,
            Dsp.mfcc(lm, math.min(13, nMels)))
        }
      }
    }
  }

  /** STUB decode: deterministic feature vector from payload bytes — the
    * fallback for UNDECODABLE payloads only (MPEG-1 decodes for real
    * via [[Mpeg1]], baseline H.264 intra via [[H264]]; what remains is
    * codec video outside those profiles — CABAC/main-profile h264,
    * HEVC, VP9 — and corrupt bytes). Replace with further codecs (???
    * boundary) — signature and batch shape stay identical. */
  def fakeDecode(content: Array[Byte]): Array[Float] = {
    // ??? further codecs (CABAC h264, HEVC) would decode here
    val out = Array.ofDim[Float](FeatureDim)
    var i = 0
    while (i < content.length) {
      out(i % FeatureDim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    if (content.length > 0) {
      var j = 0
      while (j < FeatureDim) { out(j) /= content.length; j += 1 }
    }
    out
  }

  /** Feature extraction over media batches: one decoder context per
    * partition, rows streamed through it. Image rows go through the real
    * `javax.imageio` decoder, audio rows through the real WAV/PCM
    * parser, MPEG-1 video rows through the real [[Mpeg1]] DCT codec;
    * anything they reject — and codec video (h264) — falls back to
    * `fakeDecode`. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (native context);
      // ImageIO caching to disk hurts at this row rate — keep it in-memory
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val feats = r.modality match {
          case "image" =>
            decodeImage(r.content).getOrElse(fakeDecode(r.content))
          case "audio" =>
            decodeAudioWav(r.content).getOrElse(fakeDecode(r.content))
          case "video" =>
            // MPEG-1 / baseline H.264 video: REAL codec decode of the
            // first I-picture, image-stat features over its pixels
            // (modality flag 3 = MPEG-1, 4 = H.264); video outside
            // those codecs stays stubbed
            Mpeg1.decodeFrames(r.content, 1)
              .flatMap(f => decodeImage(f.head._2))
              .map { a => a(0) = 3.0f; a }
              .orElse(H264.decodeFrames(r.content, 1)
                .flatMap(f => decodeImage(f.head._2))
                .map { a => a(0) = 4.0f; a })
              .getOrElse(fakeDecode(r.content))
          case _ => fakeDecode(r.content)
        }
        MediaFeatures(r.media_id, r.modality, r.content.length, feats)
      }
    }
  }

  /** Real frame extraction for animated-GIF payloads — the one
    * multi-frame format the JVM decodes without codec libraries. Picks
    * up to `maxFrames` frames evenly spaced over the animation and
    * re-encodes each as PNG bytes. Returns None for anything that is
    * not a decodable multi-image GIF (then the caller falls back to
    * the stub). Frames are read raw (no disposal-method compositing —
    * fine for feature extraction, documented divergence from a full
    * renderer). */
  def decodeGifFrames(content: Array[Byte], maxFrames: Int)
      : Option[Seq[Array[Byte]]] = {
    if (content.length < 6 ||
      !content.startsWith("GIF8".getBytes)) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0) None
        else {
          val take = math.min(maxFrames, n)
          val idxs = if (take == 1) Seq(0)
            else (0 until take).map(i => i * (n - 1) / (take - 1))
          Some(idxs.map { i =>
            val img = reader.read(i)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          })
        }
      } finally { reader.dispose(); iis.close() }
    } catch { case _: Exception => None }
  }

  /** Real frame extraction for MJPEG-in-AVI payloads — the one true
    * VIDEO container the JVM can decode without codec libraries: AVI
    * is a RIFF chunk tree (the same walk as the WAV parser above) and
    * every video chunk (`##dc`/`##db`) of an MJPEG stream is a
    * standalone JPEG, which `javax.imageio` decodes natively. Picks up
    * to `maxFrames` frames evenly spaced over the stream, re-encodes
    * each as PNG (same output contract as [[decodeGifFrames]]), and
    * stamps REAL timing from the `avih` microseconds-per-frame field.
    * Returns None — caller falls back to the stub — for anything that
    * is not a RIFF AVI whose chosen video chunks decode as JPEG
    * (h264/mp4 etc. still need absent codec libraries). */
  def decodeAviMjpegFrames(content: Array[Byte], maxFrames: Int)
      : Option[Seq[(Double, Array[Byte])]] =
    try decodeAviMjpegImpl(content, maxFrames)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeAviMjpegImpl(content: Array[Byte], maxFrames: Int)
      : Option[Seq[(Double, Array[Byte])]] = {
    def le32(o: Int): Long =
      ((content(o) & 0xffL)) | ((content(o + 1) & 0xffL) << 8) |
        ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (content.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ")
      return None
    var usPerFrame = 0L
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // RIFF chunk walk, recursing into LISTs (hdrl carries avih, movi —
    // possibly via nested 'rec ' lists — carries the frame chunks).
    // All bounds in Long: a lying size must not overflow into
    // acceptance (same hardening as the WAV parser).
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = tag(off); val sz = le32(off + 4)
        if (off + 8L + sz > end) return
        if (id == "LIST" && sz >= 4) walk(off + 12, (off + 8L + sz).toInt)
        else if (id == "avih") { if (sz >= 4) usPerFrame = le32(off + 8) }
        else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db") && sz > 0)
          frames += ((off + 8, sz.toInt))
        off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, content.length)
    if (frames.isEmpty) return None
    val take = math.min(maxFrames, frames.length)
    val idxs = if (take == 1) Seq(0)
      else (0 until take).map(i => i * (frames.length - 1) / (take - 1))
    val out = idxs.map { i =>
      val (o, sz) = frames(i)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content, o, sz))
      if (img == null) return None // not MJPEG -> stub fallback
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (i * usPerFrame / 1e6, bos.toByteArray)
    }
    Some(out)
  }

  /** The inverse boundary — wrap already-JPEG frames into a minimal
    * playable MJPEG AVI (RIFF / hdrl / movi, one `00dc` chunk per
    * frame). Lets sampled or synthesized frames ship as a video
    * artifact, and makes the decode path round-trip-testable without
    * external fixtures. */
  def encodeMjpegAvi(jpegFrames: Seq[Array[Byte]], usPerFrame: Long,
      width: Int, height: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte)
        else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ payload)
    // avih: dwMicroSecPerFrame, then (zeroed) rate/flags/counts plus
    // width/height — enough structure for strict parsers to walk
    val avih = chunk("avih", le32(usPerFrame) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(jpegFrames.length) ++ le32(0) ++ le32(1) ++
      le32(0) ++ le32(width) ++ le32(height) ++ Array.fill(16)(0.toByte))
    val movi = list("movi",
      jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ list("hdrl", avih) ++ movi
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(body.length))
    bos.write(body)
    bos.toByteArray
  }

  /** Real frame extraction for Motion-JPEG-in-MP4 payloads — the
    * ISO-BMFF (MP4) container carrying the `jpeg` sample-entry codec,
    * where every video sample is a standalone JPEG that
    * `javax.imageio` decodes natively (the MP4 twin of
    * [[decodeAviMjpegFrames]]; h264-in-mp4 still needs absent codec
    * libraries and falls back to the stub). Walks the box tree
    * (`moov/trak/mdia/{mdhd,hdlr,minf/stbl/{stsd,stsz,stsc,stco,
    * stts}}`), reconstructs per-sample file offsets from the
    * sample-to-chunk and chunk-offset tables, and stamps REAL timing
    * from the time-to-sample deltas over the media timescale. Picks up
    * to `maxFrames` evenly spaced samples, re-encodes each as PNG
    * (the [[decodeGifFrames]] output contract). All bounds checked in
    * Long — a lying box size must not overflow into acceptance. */
  def decodeMp4JpegFrames(content: Array[Byte], maxFrames: Int)
      : Option[Seq[(Double, Array[Byte])]] =
    try decodeMp4JpegImpl(content, maxFrames)
    catch { case scala.util.control.NonFatal(_) => None }

  private final case class Mp4Box(typ: String, start: Int, end: Int)

  private def decodeMp4JpegImpl(content: Array[Byte], maxFrames: Int)
      : Option[Seq[(Double, Array[Byte])]] = {
    def be32(o: Int): Long =
      ((content(o) & 0xffL) << 24) | ((content(o + 1) & 0xffL) << 16) |
        ((content(o + 2) & 0xffL) << 8) | (content(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def tag(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // payload-bounded child walk; size==1 -> 64-bit largesize,
    // size==0 -> box extends to the enclosing end
    def children(start: Int, end: Int): Seq[Mp4Box] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Mp4Box]
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val sz = be32(off)
        val typ = tag(off + 4)
        val (hdr, size): (Int, Long) =
          if (sz == 1 && off + 16 <= end) (16, be64(off + 8))
          else if (sz == 0) (8, (end - off).toLong)
          else (8, sz)
        if (size < hdr || off + size > end) ok = false
        else {
          out += Mp4Box(typ, off + hdr, (off + size).toInt)
          off = (off + size).toInt
        }
      }
      out.toSeq
    }
    def kids(b: Mp4Box): Seq[Mp4Box] = children(b.start, b.end)
    def find(bs: Seq[Mp4Box], t: String): Option[Mp4Box] =
      bs.find(_.typ == t)

    if (content.length < 8) return None
    val top = children(0, content.length)
    // moov presence is the gate; sample payloads are bounds-checked
    // per sample against content.length below, which covers the
    // missing-mdat case too
    val moov = find(top, "moov").getOrElse(return None)
    // first video track whose sample description is JPEG
    val trackTables = kids(moov).filter(_.typ == "trak").flatMap { trak =>
      for {
        mdia <- find(kids(trak), "mdia")
        mk = kids(mdia)
        hdlr <- find(mk, "hdlr")
        if hdlr.end - hdlr.start >= 12 && tag(hdlr.start + 8) == "vide"
        mdhd <- find(mk, "mdhd")
        timescale = if (content(mdhd.start) == 0) be32(mdhd.start + 12)
          else be32(mdhd.start + 20) // version 1: 64-bit times
        if timescale > 0
        minf <- find(mk, "minf")
        stbl <- find(kids(minf), "stbl")
        sk = kids(stbl)
        stsd <- find(sk, "stsd")
        // ver/flags(4) + entry_count(4) + first entry: size(4)+format
        if stsd.end - stsd.start >= 16 &&
          Set("jpeg", "mjpa", "MJPG").contains(tag(stsd.start + 12))
        stsz <- find(sk, "stsz"); stco <- find(sk, "stco")
          .orElse(find(sk, "co64"))
        stsc <- find(sk, "stsc"); stts <- find(sk, "stts")
      } yield (timescale, stsz, stco, stsc, stts)
    }
    val (timescale, stsz, stco, stsc, stts) =
      trackTables.headOption.getOrElse(return None)

    // sample sizes: uniform sample_size or per-sample table. Every
    // count is bounded by its TABLE'S byte capacity (and the payload
    // size) BEFORE any allocation or loop sized by it: a lying
    // sample_count near Int.MaxValue would otherwise drive multi-GB
    // array allocations whose OutOfMemoryError is fatal — NOT caught
    // by the NonFatal fallback wrapper — and kill the task instead of
    // falling back to the stub.
    val uniform = be32(stsz.start + 4)
    val nSamples = be32(stsz.start + 8).toInt
    if (nSamples <= 0 || nSamples > content.length) return None
    if (uniform == 0 &&
      12L + 4L * nSamples > stsz.end - stsz.start) return None
    def sampleSize(i: Int): Long =
      if (uniform != 0) uniform else be32(stsz.start + 12 + 4 * i)
    // chunk offsets (stco 32-bit / co64 64-bit — by box type),
    // capacity-bounded like the other tables
    val nChunks = be32(stco.start + 4).toInt
    val co64 = stco.typ == "co64"
    if (nChunks < 0 || 8L + (if (co64) 8L else 4L) * nChunks >
      stco.end - stco.start) return None
    def chunkOffset(c: Int): Long =
      if (co64) be64(stco.start + 8 + 8 * c)
      else be32(stco.start + 8 + 4 * c)
    // sample-to-chunk runs -> samples per chunk (capacity-bounded)
    val nRuns = be32(stsc.start + 4).toInt
    if (nRuns < 0 || 8L + 12L * nRuns > stsc.end - stsc.start)
      return None
    val runs = (0 until nRuns).map { r =>
      (be32(stsc.start + 8 + 12 * r),      // first_chunk (1-based)
        be32(stsc.start + 8 + 12 * r + 4)) // samples_per_chunk
    }
    if (runs.isEmpty) return None
    // absolute file offset of every sample
    val offsets = Array.ofDim[Long](nSamples)
    var s = 0
    var run = 0
    var c = 1
    while (s < nSamples && c <= nChunks) {
      while (run + 1 < runs.length && runs(run + 1)._1 <= c) run += 1
      var within = 0L
      var inChunk = 0L
      while (s < nSamples && inChunk < runs(run)._2) {
        offsets(s) = chunkOffset(c - 1) + within
        within += sampleSize(s)
        s += 1; inChunk += 1
      }
      c += 1
    }
    if (s < nSamples) return None
    // decode timestamps from time-to-sample runs (capacity-bounded)
    val nTts = be32(stts.start + 4).toInt
    if (nTts < 0 || 8L + 8L * nTts > stts.end - stts.start) return None
    val times = Array.ofDim[Long](nSamples)
    var t = 0L
    var idx = 0
    var r = 0
    while (r < nTts && idx < nSamples) {
      val cnt = be32(stts.start + 8 + 8 * r)
      val delta = be32(stts.start + 8 + 8 * r + 4)
      var j = 0L
      while (j < cnt && idx < nSamples) {
        times(idx) = t; t += delta; idx += 1; j += 1
      }
      r += 1
    }
    val take = math.min(maxFrames, nSamples)
    val idxs = if (take == 1) Seq(0)
      else (0 until take).map(i => i * (nSamples - 1) / (take - 1))
    val out = idxs.map { i =>
      val o = offsets(i); val sz = sampleSize(i)
      if (o < 0 || o + sz > content.length) return None
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content, o.toInt, sz.toInt))
      if (img == null) return None // not JPEG samples -> stub fallback
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (times(i).toDouble / timescale, bos.toByteArray)
    }
    Some(out)
  }

  /** The MP4 inverse boundary — wrap already-JPEG frames into a
    * minimal ISO-BMFF file (`ftyp` + `mdat` + `moov` with one `jpeg`
    * video track: mvhd/tkhd/mdhd/hdlr/vmhd/dinf/stbl with full
    * stsd/stts/stsc/stsz/stco tables, one chunk). Same rationale as
    * [[encodeMjpegAvi]]: sampled frames ship as a real video artifact
    * and the decode path round-trips without external fixtures. Frame
    * `i` lands at media time `i * sampleDelta / timescale`. */
  def encodeMjpegMp4(jpegFrames: Seq[Array[Byte]], timescale: Long,
      sampleDelta: Long, width: Int, height: Int): Array[Byte] = {
    require(jpegFrames.nonEmpty && timescale > 0 && sampleDelta > 0)
    def be32(v: Long): Array[Byte] = Array((v >> 24).toByte,
      (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def full(typ: String, payload: Array[Byte]): Array[Byte] =
      box(typ, Array[Byte](0, 0, 0, 0) ++ payload) // version 0, flags 0
    val n = jpegFrames.length
    val duration = sampleDelta * n
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++
      "isom".getBytes("US-ASCII"))
    val mdatPayload = jpegFrames.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    val firstSample = ftyp.length + 8L // into mdat payload
    val mvhd = full("mvhd", be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++
      be32(0) ++ be32(0) ++
      // identity matrix
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x40000000L) ++
      Array.fill(24)(0.toByte) ++ be32(2)) // pre_defined + next track
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ // enabled+in movie
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(duration) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be16(0) ++ be16(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x40000000L) ++
      be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val mdhd = full("mdhd", be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ be16(0x55c4) ++ be16(0)) // lang 'und'
    val hdlr = full("hdlr", be32(0) ++
      "vide".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte) ++
      Array(0.toByte)) // empty name
    // VisualSampleEntry 'jpeg': 6 reserved + data_ref_index, then the
    // fixed visual fields
    val sampleEntry = box("jpeg",
      Array.fill(6)(0.toByte) ++ be16(1) ++
        be16(0) ++ be16(0) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be16(width) ++ be16(height) ++
        be32(0x00480000L) ++ be32(0x00480000L) ++ be32(0) ++ be16(1) ++
        Array.fill(32)(0.toByte) ++ be16(24) ++ be16(0xffff))
    val stsd = full("stsd", be32(1) ++ sampleEntry)
    val stts = full("stts", be32(1) ++ be32(n) ++ be32(sampleDelta))
    val stsc = full("stsc", be32(1) ++ be32(1) ++ be32(n) ++ be32(1))
    val stsz = full("stsz", be32(0) ++ be32(n) ++
      jpegFrames.flatMap(f => be32(f.length)).toArray)
    val stco = full("stco", be32(1) ++ be32(firstSample))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1) ++ be16(0) ++
      be16(0) ++ be16(0) ++ be16(0))
    val dref = full("dref", be32(1) ++
      box("url ", Array[Byte](0, 0, 0, 1))) // self-contained
    val dinf = box("dinf", dref)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  /** Truecolor PNG encoder — hand-rolled, STORED (uncompressed)
    * deflate blocks, so the byte length is a pure function of the
    * dimensions: with `raw = h*(1+3*w)` scanline bytes split into
    * `nb = ceil(raw/65535)` stored blocks, total = `raw + 5*nb + 63`
    * (8 signature + 25 IHDR + IDAT 12+2+5·nb+raw+4 + 12 IEND). That
    * determinism is the point: anything built here — fixtures AND
    * [[resizeImage]] output — has a size the correctness oracle can
    * state as a design formula, unlike `ImageIO.write` output whose
    * length is encoder-version trivia. `rgbAt(x, y)` returns packed
    * 0xRRGGBB. */
  def encodePng(width: Int, height: Int,
      rgbAt: (Int, Int) => Int): Array[Byte] = {
    val raw = Array.ofDim[Byte](height * (1 + 3 * width))
    var o = 0
    (0 until height).foreach { y =>
      raw(o) = 0 // per-scanline filter byte: None
      o += 1
      (0 until width).foreach { x =>
        val c = rgbAt(x, y)
        raw(o) = ((c >> 16) & 0xff).toByte
        raw(o + 1) = ((c >> 8) & 0xff).toByte
        raw(o + 2) = (c & 0xff).toByte
        o += 3
      }
    }
    def be32(v: Long): Array[Byte] = Array((v >> 24).toByte,
      (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue)
    }
    val ihdr = chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0)) // 8-bit, truecolor, no interlace
    val adler = new java.util.zip.Adler32(); adler.update(raw)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x78, 0x01)) // zlib: deflate, no preset dict
    var off = 0
    while (off < raw.length) {
      val len = math.min(0xffff, raw.length - off)
      val fin = if (off + len >= raw.length) 1 else 0
      bos.write(Array[Byte](fin.toByte, // stored block, final flag
        (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
        (~len & 0xff).toByte, ((~len >> 8) & 0xff).toByte))
      bos.write(raw, off, len)
      off += len
    }
    bos.write(be32(adler.getValue))
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      ihdr ++ chunk("IDAT", bos.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  /** Solid-fill convenience over [[encodePng]] (the fixture shape the
    * q74 oracle's 82-byte constant refers to). */
  def encodePngRgb(width: Int, height: Int,
      rgb: (Int, Int, Int)): Array[Byte] =
    encodePng(width, height,
      (_, _) => (rgb._1 << 16) | (rgb._2 << 8) | rgb._3)

  /** REAL image resize: decode any ImageIO-supported payload,
    * bilinear-resample to `tw`×`th` (half-pixel-center mapping, edge
    * clamp), re-encode via [[encodePng]] — so the output size is the
    * design formula above, not codec trivia. None when no codec
    * accepts the payload. Deterministic: integer-rounded double
    * arithmetic, no AWT rescale ops. */
  def resizeImage(content: Array[Byte], tw: Int,
      th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val sw = img.getWidth; val sh = img.getHeight
      val sx = sw.toDouble / tw; val sy = sh.toDouble / th
      def channel(c: Int, shift: Int): Int = (c >> shift) & 0xff
      val out = encodePng(tw, th, (x, y) => {
        val fx = (x + 0.5) * sx - 0.5
        val fy = (y + 0.5) * sy - 0.5
        val x0 = math.max(0, math.min(sw - 1, math.floor(fx).toInt))
        val y0 = math.max(0, math.min(sh - 1, math.floor(fy).toInt))
        val x1 = math.min(sw - 1, x0 + 1)
        val y1 = math.min(sh - 1, y0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        val wy = math.max(0.0, math.min(1.0, fy - y0))
        val p00 = img.getRGB(x0, y0); val p10 = img.getRGB(x1, y0)
        val p01 = img.getRGB(x0, y1); val p11 = img.getRGB(x1, y1)
        def lerp(shift: Int): Int = {
          val top = channel(p00, shift) * (1 - wx) +
            channel(p10, shift) * wx
          val bot = channel(p01, shift) * (1 - wx) +
            channel(p11, shift) * wx
          math.max(0, math.min(255,
            math.round(top * (1 - wy) + bot * wy).toInt))
        }
        (lerp(16) << 16) | (lerp(8) << 8) | lerp(0)
      })
      Some(out)
    }
  }

  /** Perceptual difference hash (dHash, 64-bit): decode, bilinear-
    * sample a 9×8 luminance grid (the same half-pixel-center kernel
    * as [[resizeImage]]), set bit `r·8+c` when cell (r,c) is strictly
    * darker than its right neighbor. Robust to re-encoding, global
    * brightness shifts, and mild resampling — the standard cheap
    * image-near-dup signature (LAION-style image dedup). None when no
    * codec accepts the payload. */
  def dHash(content: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val sw = img.getWidth; val sh = img.getHeight
      val gw = 9; val gh = 8
      val sx = sw.toDouble / gw; val sy = sh.toDouble / gh
      def lum(x: Int, y: Int): Double = {
        val p = img.getRGB(x, y)
        0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
          0.114 * (p & 0xff)
      }
      def gray(gx: Int, gy: Int): Double = {
        val fx = (gx + 0.5) * sx - 0.5
        val fy = (gy + 0.5) * sy - 0.5
        val x0 = math.max(0, math.min(sw - 1, math.floor(fx).toInt))
        val y0 = math.max(0, math.min(sh - 1, math.floor(fy).toInt))
        val x1 = math.min(sw - 1, x0 + 1)
        val y1 = math.min(sh - 1, y0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        val wy = math.max(0.0, math.min(1.0, fy - y0))
        (lum(x0, y0) * (1 - wx) + lum(x1, y0) * wx) * (1 - wy) +
          (lum(x0, y1) * (1 - wx) + lum(x1, y1) * wx) * wy
      }
      var sig = 0L
      var r = 0
      while (r < gh) {
        var c = 0
        while (c < 8) {
          if (gray(c, r) < gray(c + 1, r)) sig |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      Some(sig)
    }
  }

  /** Image near-duplicate pairs: one `mapPartitions` dHash pass over
    * the image rows, then the SAME pigeonhole block join the text
    * module uses for simhash ([[graft.text.Dedup
    * .simhashNearDupsFromSigs]] — guaranteed recall at the radius,
    * skew-capped, one shuffle per block). Undecodable rows drop out
    * of pairing. The cross-modality reuse is the point: a 64-bit
    * Hamming signature is the same scale problem whether it came from
    * tokens or pixels. */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    import media.sparkSession.implicits._
    val sigs = media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        if (r.modality != "image") None
        else dHash(r.content).map(h => (r.media_id, h))
      }
    }.toDF("media_id", "dhash")
    graft.text.Dedup.simhashNearDupsFromSigs(sigs, "media_id",
      "dhash", maxHamming, bits = 64, maxBucketSize = maxBucketSize)
  }

  /** [[resizePlan]] made REAL for image rows: decode, bilinear
    * resample, PNG re-encode via `mapPartitions`; rows no codec
    * accepts keep a null payload but still carry the plan columns, so
    * the stage is total like [[extractFeatures]]. Returns
    * (media_id, width, height, target_width, target_height,
    * resized_png, resized_bytes). */
  def resizeMedia(media: Dataset[MediaRow], targetW: Int,
      targetH: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val png = if (r.modality == "image")
          resizeImage(r.content, targetW, targetH).orNull
        else null
        (r.media_id, r.width, r.height, targetW, targetH, png,
          if (png == null) null
          else java.lang.Integer.valueOf(png.length))
      }
    }.toDF("media_id", "width", "height", "target_width",
      "target_height", "resized_png", "resized_bytes")
  }

  /** Minimal PCM WAV encoder — 16-bit little-endian, hand-rolled, so
    * the byte length is the design constant `44 + 2*samples*channels`
    * (same rationale as [[encodePngRgb]]). Interleaved input. */
  def encodePcm16Wav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
    val data = samples.flatMap(s => le16(s & 0xffff))
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels * 2) ++ le16(channels * 2) ++
      le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  /** Frame sampling for video rows: animated-GIF, MJPEG-AVI,
    * MJPEG-MP4, MPEG-1, and baseline H.264 payloads go through the
    * REAL decoders (`decodeGifFrames` / `decodeAviMjpegFrames` /
    * `decodeMp4JpegFrames` / [[Mpeg1.decodeFrames]] /
    * [[H264.decodeFrames]] — evenly-spaced frames, re-encoded PNG,
    * container/VUI-true timing; MPEG-1 and H.264 are full codec
    * decodes — Huffman/CAVLC entropy, intra prediction, IDCT — not
    * container walks); payloads needing still-absent codecs
    * (CABAC/main-profile h264, HEVC) fall back to `fps`-spaced
    * deterministic stub slices, so the pipeline shape is identical
    * either way. */
  def sampleFrames(media: Dataset[MediaRow], fps: Double = 1.0,
      maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      decodeGifFrames(r.content, maxFrames)
        .map(_.zipWithIndex.map { case (png, i) =>
          Frame(r.media_id, i, i / fps, png)
        })
        .orElse(decodeAviMjpegFrames(r.content, maxFrames)
          .map(_.zipWithIndex.map { case ((off, png), i) =>
            Frame(r.media_id, i, off, png)
          }))
        .orElse(decodeMp4JpegFrames(r.content, maxFrames)
          .map(_.zipWithIndex.map { case ((off, png), i) =>
            Frame(r.media_id, i, off, png)
          }))
        .orElse(Mpeg1.decodeFrames(r.content, maxFrames)
          .map(_.zipWithIndex.map { case ((off, png), i) =>
            Frame(r.media_id, i, off, png)
          }))
        .orElse(H264.decodeFrames(r.content, maxFrames)
          .map(_.zipWithIndex.map { case ((off, png), i) =>
            Frame(r.media_id, i, off, png)
          }))
        .getOrElse {
          val n = math.min(maxFrames, math.max(1,
            (r.duration_s * fps).toInt))
          (0 until n).map { i =>
            val offset = i / fps
            val sliceStart = if (r.content.isEmpty) 0
              else (i * 7) % math.max(1, r.content.length - 1)
            Frame(r.media_id, i, offset,
              r.content.slice(sliceStart,
                math.min(r.content.length, sliceStart + 16)))
          }
        }.iterator
    }
  }

  /** Resize metadata transform (decode-free): records the target size a
    * real resize kernel would produce. */
  def resizePlan(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media.withColumn("target_width", lit(targetW))
      .withColumn("target_height", lit(targetH))
      .withColumn("scale_x", lit(targetW) / col("width"))
      .withColumn("scale_y", lit(targetH) / col("height"))
}
