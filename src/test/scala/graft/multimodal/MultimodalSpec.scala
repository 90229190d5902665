package graft.multimodal

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val media = Multimodal.syntheticMediaTable(
    Tables.table(spark, TestSpark.sfDir, "documents"), "doc_id", "text")

  test("media table has binary payloads and typed metadata") {
    val r = media.limit(3).collect()
    assert(r.forall(_.getAs[Array[Byte]]("content").nonEmpty))
    assert(media.select($"modality").distinct().count() == 3)
  }

  test("extractFeatures yields fixed-dim vectors, deterministic") {
    val ds = media.as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(ds).collect()
      .sortBy(_.media_id)
    assert(f1.forall(_.features.length == Multimodal.FeatureDim))
    assert(f1.forall(_.n_bytes > 0))
    val f2 = Multimodal.extractFeatures(ds.repartition(7)).collect()
      .sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("decodeImage really decodes a PNG: dimensions and pixel stats") {
    // 4x2 image: left half pure red, right half pure blue
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.decodeImage(bos.toByteArray).get
    assert(f.length == Multimodal.FeatureDim)
    assert(f(0) == 1.0f && f(1) == 4.0f && f(2) == 2.0f) // decoded, w, h
    assert(math.abs(f(3) - 0.5f) < 1e-6) // half the pixels full red
    assert(f(4) == 0.0f)                 // no green anywhere
    assert(math.abs(f(5) - 0.5f) < 1e-6) // half the pixels full blue
    assert(math.abs(f(14) - 2.0f) < 1e-6) // aspect 4/2
    assert(f(15) == 1.0f)                 // fully opaque
    // luminance: red 0.299*255, blue 0.114*255 -> mean (0.299+0.114)/2
    assert(math.abs(f(6) - (0.299f + 0.114f) / 2) < 1e-4)
  }

  test("extractFeatures routes real PNG payloads through the decoder") {
    val img = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 3) img.setRGB(x, y, 0x00ff00)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, 3, 3, 1.0),
      Multimodal.MediaRow(2L, "image", "not an image".getBytes, 3, 3, 1.0),
      Multimodal.MediaRow(3L, "audio", png, 3, 3, 1.0))
    val out = Multimodal.extractFeatures(rows.toDS()).collect()
      .sortBy(_.media_id)
    // decoded image: flag 1, true dims, pure green
    assert(out(0).features(0) == 1.0f && out(0).features(1) == 3.0f)
    assert(out(0).features(4) == 1.0f && out(0).features(3) == 0.0f)
    // undecodable payload and audio fall back to the deterministic stub
    assert(out(1).features.toSeq ==
      Multimodal.fakeDecode("not an image".getBytes).toSeq)
    assert(out(2).features.toSeq == Multimodal.fakeDecode(png).toSeq)
  }

  /** Minimal WAV writer for fixtures: PCM, little-endian. */
  private def wavBytes(samples: Array[Array[Short]], sampleRate: Int,
      bits: Int): Array[Byte] = {
    val channels = samples.length
    val nFrames = samples(0).length
    val frameBytes = bits / 8 * channels
    val dataLen = nFrames * frameBytes
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort)
    bb.putInt(sampleRate); bb.putInt(sampleRate * frameBytes)
    bb.putShort(frameBytes.toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataLen)
    for (f <- 0 until nFrames; c <- 0 until channels)
      if (bits == 16) bb.putShort(samples(c)(f))
      else bb.put(((samples(c)(f) / 256) + 128).toByte)
    bb.array()
  }

  test("decodeAudioWav parses 16-bit mono PCM: rate, duration, rms, zcr") {
    val rate = 8000; val freq = 400.0; val n = 8000 // 1 second
    val amp = 16384 // half scale
    val sine = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / rate)).toShort)
    val f = Multimodal.decodeAudioWav(
      wavBytes(Array(sine), rate, 16)).get
    assert(f(0) == 2.0f)            // audio flag
    assert(f(1) == rate.toFloat)    // sample rate from the header
    assert(f(2) == 1.0f)            // channels
    assert(math.abs(f(3) - 1.0f) < 1e-6)  // duration 1 s
    // sine RMS = amp/sqrt(2) of full scale
    assert(math.abs(f(5) - amp / 32768.0 / math.sqrt(2)) < 1e-3)
    assert(math.abs(f(6) - amp / 32768.0f) < 1e-3) // peak
    // 400 Hz sine crosses zero 2*400 times per second
    assert(math.abs(f(7) - 2 * freq / rate) < 1e-3)
    assert(math.abs(f(12)) < 1e-3)  // no DC offset
    assert(f(13) == 16.0f)          // bit depth
    assert(f(14) == 0.0f)           // nothing clipped at half scale
  }

  test("decodeAudioWav folds stereo to mono and rejects non-WAV") {
    val rate = 1000
    val left = Array.fill(100)(16384.toShort)
    val right = Array.fill(100)((-16384).toShort)
    // L and R cancel -> silent mono fold
    val f = Multimodal.decodeAudioWav(
      wavBytes(Array(left, right), rate, 16)).get
    assert(f(2) == 2.0f && f(5) == 0.0f && f(6) == 0.0f)
    assert(Multimodal.decodeAudioWav(("RIFFnope" * 8).getBytes).isEmpty)
    assert(Multimodal.decodeAudioWav(Array.emptyByteArray).isEmpty)
  }

  test("decodeAudioWav survives lying chunk sizes and truncation") {
    // header claims a near-Int.MaxValue data chunk: the bound check
    // must not integer-overflow into acceptance
    val evil = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes); evil.putInt(56); evil.put("WAVE".getBytes)
    evil.put("fmt ".getBytes); evil.putInt(16)
    evil.putShort(1); evil.putShort(1); evil.putInt(8000)
    evil.putInt(16000); evil.putShort(2); evil.putShort(16)
    evil.put("data".getBytes); evil.putInt(0x7FFFFFF0)
    assert(Multimodal.decodeAudioWav(evil.array()).isEmpty)
    // truncated mid-header
    assert(Multimodal.decodeAudioWav(
      "RIFF1234WAVEfmt".getBytes).isEmpty)
  }

  test("extractFeatures routes WAV audio through the real parser") {
    val rate = 4000
    val tone = Array.tabulate(400)(i =>
      (8192 * math.sin(2 * math.Pi * 100 * i / rate)).toShort)
    val wav = wavBytes(Array(tone), rate, 16)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav, 0, 0, 0.1),
      Multimodal.MediaRow(2L, "audio", "not audio".getBytes, 0, 0, 1.0))
    val out = Multimodal.extractFeatures(rows.toDS()).collect()
      .sortBy(_.media_id)
    assert(out(0).features(0) == 2.0f && out(0).features(1) == rate)
    assert(out(1).features.toSeq ==
      Multimodal.fakeDecode("not audio".getBytes).toSeq)
  }

  /** Animated-GIF fixture: one solid-color 4x4 frame per color. */
  private def gifBytes(colors: Seq[Int]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, c)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  test("decodeGifFrames extracts real, evenly spaced GIF frames") {
    val gif = gifBytes(Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    val all = Multimodal.decodeGifFrames(gif, maxFrames = 8).get
    assert(all.length == 4)
    // each extracted frame is a decodable PNG of the right color
    val feats = all.map(png => Multimodal.decodeImage(png).get)
    assert(feats.forall(f => f(1) == 4.0f && f(2) == 4.0f))
    assert(feats(0)(3) > 0.9f && feats(0)(4) < 0.2f) // red frame
    assert(feats(1)(4) > 0.9f)                        // green frame
    assert(feats(2)(5) > 0.9f)                        // blue frame
    // down-sampling stays evenly spaced: first and last frame kept
    val two = Multimodal.decodeGifFrames(gif, maxFrames = 2).get
    val f2 = two.map(png => Multimodal.decodeImage(png).get)
    assert(f2(0)(3) > 0.9f, "first frame is the red one")
    assert(f2(1)(3) > 0.9f && f2(1)(4) > 0.9f && f2(1)(5) > 0.9f,
      "last frame is the white one")
    assert(Multimodal.decodeGifFrames("not a gif".getBytes, 8).isEmpty)
  }

  test("sampleFrames routes GIF videos through the real decoder") {
    val gif = gifBytes(Seq(0xff0000, 0x00ff00, 0x0000ff))
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", gif, 4, 4, 3.0),
      Multimodal.MediaRow(2L, "video", "raw payload bytes".getBytes,
        0, 0, 2.0))
    val out = Multimodal.sampleFrames(rows.toDS(), fps = 1.0,
      maxFrames = 8).collect().sortBy(r => (r.media_id, r.frame_index))
    val gifFrames = out.filter(_.media_id == 1L)
    assert(gifFrames.length == 3)
    assert(gifFrames.forall(_.content.startsWith(pngMagic)))
    val stubFrames = out.filter(_.media_id == 2L)
    assert(stubFrames.length == 2) // duration 2 s at 1 fps, stub path
    assert(stubFrames.forall(!_.content.startsWith(pngMagic)))
  }

  /** Solid-color JPEG frame. */
  private def jpegBytes(c: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("MJPEG-AVI round trip: real frames, real container timing") {
    val avi = Multimodal.encodeMjpegAvi(
      Seq(jpegBytes(0xff0000), jpegBytes(0x00ff00), jpegBytes(0x0000ff),
        jpegBytes(0xffffff)),
      usPerFrame = 40000L, width = 8, height = 8) // 25 fps
    val all = Multimodal.decodeAviMjpegFrames(avi, maxFrames = 8).get
    assert(all.length == 4)
    // container-true timing: frame i at i * 40000 us
    assert(all.map(_._1) == Seq(0.0, 0.04, 0.08, 0.12))
    // each frame is a decodable PNG of the right color (JPEG is lossy,
    // so assert dominance, not exact values)
    val feats = all.map { case (_, png) => Multimodal.decodeImage(png).get }
    assert(feats.forall(f => f(1) == 8.0f && f(2) == 8.0f))
    assert(feats(0)(3) > 0.7f && feats(0)(4) < 0.4f) // red frame
    assert(feats(1)(4) > 0.7f)                        // green frame
    assert(feats(2)(5) > 0.7f)                        // blue frame
    // even down-sampling keeps first and last frames
    val two = Multimodal.decodeAviMjpegFrames(avi, maxFrames = 2).get
    assert(two.map(_._1) == Seq(0.0, 0.12))
    val f2 = two.map { case (_, png) => Multimodal.decodeImage(png).get }
    assert(f2(0)(3) > 0.7f, "first frame is the red one")
    assert(f2(1)(3) > 0.7f && f2(1)(4) > 0.7f && f2(1)(5) > 0.7f,
      "last frame is the white one")
    // rejects non-AVI and non-JPEG video chunks
    assert(Multimodal.decodeAviMjpegFrames("not an avi".getBytes, 8).isEmpty)
    assert(Multimodal.decodeAviMjpegFrames(
      Multimodal.encodeMjpegAvi(Seq("not a jpeg".getBytes), 1000L, 8, 8),
      8).isEmpty)
  }

  test("sampleFrames routes MJPEG-AVI videos through the real decoder") {
    val avi = Multimodal.encodeMjpegAvi(
      Seq(jpegBytes(0xff0000), jpegBytes(0x00ff00)), 40000L, 8, 8)
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi, 8, 8, 1.0),
      Multimodal.MediaRow(2L, "video", "raw payload".getBytes, 0, 0, 2.0))
    val out = Multimodal.sampleFrames(rows.toDS(), fps = 1.0,
      maxFrames = 8).collect().sortBy(r => (r.media_id, r.frame_index))
    val aviFrames = out.filter(_.media_id == 1L)
    assert(aviFrames.length == 2)
    assert(aviFrames.forall(_.content.startsWith(pngMagic)))
    assert(aviFrames.map(_.offset_s).toSeq == Seq(0.0, 0.04))
    assert(out.filter(_.media_id == 2L)
      .forall(!_.content.startsWith(pngMagic)))
  }

  test("MJPEG-MP4 round trip: real frames, real sample-table timing") {
    val mp4 = Multimodal.encodeMjpegMp4(
      Seq(jpegBytes(0xff0000), jpegBytes(0x00ff00), jpegBytes(0x0000ff),
        jpegBytes(0xffffff)),
      timescale = 1000L, sampleDelta = 40L, width = 8, height = 8)
    val all = Multimodal.decodeMp4JpegFrames(mp4, maxFrames = 8).get
    assert(all.length == 4)
    // stts-true timing: sample i at i * 40 / 1000 s
    assert(all.map(_._1) == Seq(0.0, 0.04, 0.08, 0.12))
    val feats = all.map { case (_, png) => Multimodal.decodeImage(png).get }
    assert(feats.forall(f => f(1) == 8.0f && f(2) == 8.0f))
    assert(feats(0)(3) > 0.7f && feats(0)(4) < 0.4f) // red frame
    assert(feats(1)(4) > 0.7f)                        // green frame
    assert(feats(2)(5) > 0.7f)                        // blue frame
    // even down-sampling keeps first and last
    val two = Multimodal.decodeMp4JpegFrames(mp4, maxFrames = 2).get
    assert(two.map(_._1) == Seq(0.0, 0.12))
    // container discrimination both ways + non-JPEG rejection
    assert(Multimodal.decodeMp4JpegFrames("not an mp4".getBytes, 8).isEmpty)
    assert(Multimodal.decodeAviMjpegFrames(mp4, 8).isEmpty)
    assert(Multimodal.decodeMp4JpegFrames(
      Multimodal.encodeMjpegAvi(Seq(jpegBytes(0xff0000)), 1000L, 8, 8),
      8).isEmpty)
    assert(Multimodal.decodeMp4JpegFrames(
      Multimodal.encodeMjpegMp4(Seq("not a jpeg".getBytes), 1000L, 40L,
        8, 8), 8).isEmpty)
  }

  test("decodeMp4JpegFrames survives lying sample-table counts") {
    // a valid tree whose stsz claims ~2^31 samples must be REJECTED
    // before any allocation sized by it — OutOfMemoryError is fatal
    // and would escape the NonFatal fallback
    val mp4 = Multimodal.encodeMjpegMp4(
      Seq(jpegBytes(0xff0000), jpegBytes(0x00ff00)), 1000L, 40L, 8, 8)
    def patched(tableTag: String, countOff: Int): Array[Byte] = {
      val t = tableTag.getBytes("US-ASCII")
      val i = mp4.indices.indexWhere(j => j + 4 <= mp4.length &&
        mp4(j) == t(0) && mp4(j + 1) == t(1) && mp4(j + 2) == t(2) &&
        mp4(j + 3) == t(3))
      assert(i > 0, s"$tableTag not found")
      val bad = mp4.clone()
      bad(i + countOff) = 0x7f.toByte
      bad(i + countOff + 1) = 0xff.toByte
      bad(i + countOff + 2) = 0xff.toByte
      bad(i + countOff + 3) = 0xf0.toByte
      bad
    }
    // stsz payload: ver/flags(4) sample_size(4) COUNT at tag+12;
    // stsc/stts/stco payload: ver/flags(4) COUNT at tag+8
    assert(Multimodal.decodeMp4JpegFrames(patched("stsz", 12), 4).isEmpty)
    assert(Multimodal.decodeMp4JpegFrames(patched("stsc", 8), 4).isEmpty)
    assert(Multimodal.decodeMp4JpegFrames(patched("stts", 8), 4).isEmpty)
    assert(Multimodal.decodeMp4JpegFrames(patched("stco", 8), 4).isEmpty)
  }

  test("sampleFrames routes MJPEG-MP4 videos through the real decoder") {
    val mp4 = Multimodal.encodeMjpegMp4(
      Seq(jpegBytes(0xff0000), jpegBytes(0x00ff00)), 1000L, 40L, 8, 8)
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", mp4, 8, 8, 1.0),
      Multimodal.MediaRow(2L, "video", "raw payload".getBytes, 0, 0, 2.0))
    val out = Multimodal.sampleFrames(rows.toDS(), fps = 1.0,
      maxFrames = 8).collect().sortBy(r => (r.media_id, r.frame_index))
    val mp4Frames = out.filter(_.media_id == 1L)
    assert(mp4Frames.length == 2)
    assert(mp4Frames.forall(_.content.startsWith(pngMagic)))
    assert(mp4Frames.map(_.offset_s).toSeq == Seq(0.0, 0.04))
    assert(out.filter(_.media_id == 2L)
      .forall(!_.content.startsWith(pngMagic)))
  }

  test("sampleFrames only emits for video, bounded by maxFrames") {
    val ds = media.as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(ds, fps = 1.0, maxFrames = 5)
      .toDF().cache()
    assert(frames.count() > 0)
    val joined = frames.join(media, "media_id")
    assert(joined.where($"modality" =!= "video").count() == 0)
    val perMedia = frames.groupBy($"media_id").count()
    assert(perMedia.agg(max($"count")).head().getLong(0) <= 5)
  }

  test("encodePngRgb: design-constant length, real decode round trip") {
    // length contract: h*(1+3w) + 68 — the constant the q74 oracle
    // restates (2x2 -> 82); ImageIO (the REAL decoder) must accept the
    // stored-deflate stream and recover dimensions and exact stats
    val png = Multimodal.encodePngRgb(2, 2, (255, 0, 0))
    assert(png.length == 2 * (1 + 3 * 2) + 68 && png.length == 82)
    val f = Multimodal.decodeImage(png).get
    assert(f(0) == 1.0f && f(1) == 2.0f && f(2) == 2.0f)
    assert(f(3) == 1.0f && f(4) == 0.0f && f(5) == 0.0f) // solid red
    val png2 = Multimodal.encodePngRgb(5, 3, (0, 128, 255))
    assert(png2.length == 3 * (1 + 3 * 5) + 68)
    val f2 = Multimodal.decodeImage(png2).get
    assert(f2(1) == 5.0f && f2(2) == 3.0f && f2(3) == 0.0f)
  }

  test("encodePcm16Wav: design-constant length, real parse round trip") {
    val wav = Multimodal.encodePcm16Wav(8000, 1,
      Array.fill[Short](8)(0x4000.toShort))
    assert(wav.length == 44 + 2 * 8 && wav.length == 60)
    val f = Multimodal.decodeAudioWav(wav).get
    assert(f(0) == 2.0f && f(1) == 8000.0f && f(2) == 1.0f)
    assert(f(13) == 16.0f) // bit depth
    assert(math.abs(f(4) - 0.5f) < 1e-4) // |0x4000/0x8000| mean amp
    // stereo: length 44 + 2*samples, channels recovered
    val st = Multimodal.encodePcm16Wav(44100, 2,
      Array[Short](100, -100, 200, -200))
    assert(st.length == 44 + 8)
    val fs = Multimodal.decodeAudioWav(st).get
    assert(fs(1) == 44100.0f && fs(2) == 2.0f)
  }

  test("resizeImage: real bilinear resample, design-formula bytes") {
    // solid color stays solid at any size; output length is the
    // stored-deflate formula raw + 5*ceil(raw/65535) + 63
    val red = Multimodal.encodePngRgb(2, 2, (255, 0, 0))
    val up = Multimodal.resizeImage(red, 5, 4).get
    assert(up.length == 4 * (1 + 3 * 5) + 5 + 63)
    val f = Multimodal.decodeImage(up).get
    assert(f(1) == 5.0f && f(2) == 4.0f)
    assert(f(3) == 1.0f && f(4) == 0.0f && f(5) == 0.0f)
    // exact bilinear values: a 2x1 [0, 255] red ramp to 4x1 under
    // half-pixel-center mapping gives reds [0, 64, 191, 255]
    val ramp = Multimodal.encodePng(2, 1,
      (x, _) => if (x == 0) 0x000000 else 0xff0000)
    val out = Multimodal.resizeImage(ramp, 4, 1).get
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out))
    val reds = (0 until 4).map(x => (img.getRGB(x, 0) >> 16) & 0xff)
    assert(reds == Seq(0, 64, 191, 255), s"got $reds")
    // multi-block path: 224x224 raw = 150752 -> 3 stored blocks
    val big = Multimodal.resizeImage(red, 224, 224).get
    assert(big.length == 224 * (1 + 3 * 224) + 5 * 3 + 63)
    assert(Multimodal.decodeImage(big).get(1) == 224.0f)
    // undecodable payloads yield None, never throw
    assert(Multimodal.resizeImage("not an image".getBytes, 4, 4).isEmpty)
  }

  test("resizeMedia resizes image rows, passes undecodable as null") {
    val png = Multimodal.encodePngRgb(3, 2, (0, 255, 0))
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, 3, 2, 0.0),
      Multimodal.MediaRow(2L, "image", "garbage".getBytes, 0, 0, 0.0),
      Multimodal.MediaRow(3L, "audio", png, 0, 0, 1.0))
    val out = Multimodal.resizeMedia(rows.toDS(), 6, 4)
      .orderBy($"media_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Int]("resized_bytes") ==
      4 * (1 + 3 * 6) + 5 + 63)
    assert(Multimodal.decodeImage(
      out(0).getAs[Array[Byte]]("resized_png")).get(4) == 1.0f)
    assert(out(1).isNullAt(out(1).fieldIndex("resized_bytes")))
    assert(out(2).isNullAt(out(2).fieldIndex("resized_png")))
  }

  def patternPng(p: Int, offset: Int): Array[Byte] =
    Multimodal.encodePng(9, 8, (x, y) => {
      val v = math.abs((x * 7 + y * 13 + p * 37) * 1103515245 + 12345)
        .>>(16) % 201 + offset
      (v << 16) | (v << 8) | v
    })

  test("dHash: brightness-invariant, pattern-discriminating") {
    val a = Multimodal.dHash(patternPng(1, 0)).get
    val b = Multimodal.dHash(patternPng(1, 2)).get  // +2 brightness
    val c = Multimodal.dHash(patternPng(2, 0)).get  // different pattern
    assert(a == b, "global brightness shift must not change dHash")
    assert(java.lang.Long.bitCount(a ^ c) > 16,
      s"distinct patterns too close: ${java.lang.Long.bitCount(a ^ c)}")
    // survives a lossy JPEG re-encode within a small radius
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(patternPng(1, 0)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val j = Multimodal.dHash(bos.toByteArray).get
    assert(java.lang.Long.bitCount(a ^ j) <= 10,
      s"jpeg re-encode drifted ${java.lang.Long.bitCount(a ^ j)} bits")
    assert(Multimodal.dHash("not an image".getBytes).isEmpty)
  }

  test("imageNearDups pairs planted twins via the pigeonhole join") {
    val rows = (0 until 12).map { i =>
      // twins (2m, 2m+1): same pattern, +2 brightness on the odd one
      Multimodal.MediaRow(i.toLong, "image",
        patternPng(i / 2, (i % 2) * 2), 9, 8, 0.0)
    } :+ Multimodal.MediaRow(99L, "image", "garbage".getBytes, 0, 0, 0.0)
    val pairs = Multimodal.imageNearDups(rows.toDS(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq ==
      (0 until 6).map(m => (2L * m, 2L * m + 1)).toSeq)
  }

  test("resizePlan computes scales") {
    val r = Multimodal.resizePlan(media, 224, 224)
      .select($"width", $"target_width", $"scale_x").limit(1).head()
    assert(r.getInt(1) == 224)
    assert(math.abs(r.getDouble(2) - 224.0 / r.getInt(0)) < 1e-9)
  }
}
