package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Multimodal._

/** Multimodal plumbing: typed mapPartitions decode with vectorized batch
  * shape, deterministic fake codec, feature/frame column operators. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = (1L to 10L)
    .map(i => (i, "image", ("payload-" * (i.toInt * 200)).getBytes("UTF-8")))
    .toDF("asset_id", "kind", "bytes")

  test("decodePartitions yields one frame per 4KiB, deterministic dims") {
    val frames = decodePartitions(assets, FakeCodec).collect()
    // asset 1: 1600 bytes -> 1 frame; asset 10: 16000 bytes -> 3 frames
    val byAsset = frames.groupBy(_.asset_id).view.mapValues(_.length).toMap
    assert(byAsset(1L) === 1)
    assert(byAsset(10L) === 3)
    val again = decodePartitions(assets, FakeCodec).collect()
    assert(frames.map(f => (f.asset_id, f.frame_idx, f.width, f.height)).toSet ===
      again.map(f => (f.asset_id, f.frame_idx, f.width, f.height)).toSet)
    assert(frames.forall(f => f.width >= 64 && f.width < 640))
    assert(frames.forall(f => f.height >= 64 && f.height < 480))
    assert(frames.forall(_.pixels.length <= 256))
  }

  test("codec sees vectorized batches, not single rows") {
    // record batch sizes through the output (the closure is serialized to
    // executors, so driver-side collections would stay empty)
    val batchSizeCodec = new MediaCodec {
      override def decodeBatch(batch: Seq[MediaAsset]): Seq[DecodedFrame] =
        Seq(DecodedFrame(-1L, batch.size, 0, 0, Array.empty))
    }
    val observed = decodePartitions(assets.repartition(1), batchSizeCodec, batchSize = 4)
      .collect().map(_.frame_idx).toSeq
    assert(observed.max === 4, s"expected batches of 4, saw $observed")
    assert(observed.sum === 10)
  }

  test("hashFeatures: fixed dims, [0,1) range, deterministic") {
    val feats = assets.select(col("asset_id"), hashFeatures(col("bytes"), 16).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(feats.values.forall(_.length === 16))
    assert(feats.values.flatten.forall(v => v >= 0.0 && v < 1.0))
    // identical payloads -> identical features; distinct -> distinct
    assert(feats(1L) !== feats(2L))
  }

  test("sampleFrames: stride keeps every 4th frame, hash stable") {
    val df = Seq((1L, "x" * 1024), (2L, "y" * 100)).toDF("id", "payload")
    val out = sampleFrames(df, "id", "payload", frameBytes = 256, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 1024 chars -> 4 frames -> only frame 0 kept; 100 chars -> 1 frame
    assert(out.map(t => (t._1, t._2)).toSet === Set((1L, 0L), (2L, 0L)))
    assert(out.forall(_._3.length === 32))
  }

  private def wavBytes(channels: Int, rate: Int, samples: Int): Array[Byte] = {
    // 16-bit PCM with a deterministic ramp so byte slices are checkable
    val bpf = channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + samples * bpf)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples * bpf)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * bpf).putShort(bpf.toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(samples * bpf)
    for (i <- 0 until samples; c <- 0 until channels)
      buf.putShort(((i * 7 + c * 3) % 32767).toShort)
    buf.array()
  }

  private def bmpBytes(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowSize * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * height)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up rows; pixel (x, y-from-top) = BGR (x, y, x+y) for checking
    for (yUp <- 0 until height) {
      val y = height - 1 - yUp
      for (x <- 0 until width)
        buf.put(x.toByte).put(y.toByte).put((x + y).toByte)
      for (_ <- width * 3 until rowSize) buf.put(0.toByte)
    }
    buf.array()
  }

  test("RealCodecs.PcmWav decodes real RIFF/WAVE into exact sample windows") {
    val media = Seq(
      (1L, "audio", wavBytes(channels = 2, rate = 8000, samples = 1500)),
      (2L, "audio", wavBytes(channels = 1, rate = 16000, samples = 100)))
      .toDF("asset_id", "kind", "bytes")
    val frames = decodePartitions(media, RealCodecs.PcmWav(1024)).collect()
      .groupBy(_.asset_id)
    // asset 1: 1500 stereo sample frames -> windows of 1024 + 476
    val a1 = frames(1L).sortBy(_.frame_idx)
    assert(a1.map(f => (f.frame_idx, f.width, f.height)).toSeq ===
      Seq((0, 1024, 2), (1, 476, 2)))
    assert(a1(0).pixels.length === 1024 * 4 && a1(1).pixels.length === 476 * 4)
    // first stereo sample frame is (0, 3) as little-endian shorts
    assert(a1(0).pixels.take(4).toSeq === Seq[Byte](0, 0, 3, 0))
    // window 1 starts at sample 1024: left channel = (1024*7) % 32767 = 7168
    val s = java.nio.ByteBuffer.wrap(a1(1).pixels.take(2).toArray)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort
    assert(s === ((1024 * 7) % 32767).toShort)
    assert(frames(2L).map(f => (f.width, f.height)).toSeq === Seq((100, 1)))
    // malformed payloads are refused with the asset id, not skipped
    val bad = Seq((9L, "audio", "not a wav at all".getBytes("US-ASCII")))
      .toDF("asset_id", "kind", "bytes")
    val e = intercept[org.apache.spark.SparkException](
      decodePartitions(bad, RealCodecs.PcmWav(1024)).collect())
    assert(e.getMessage.contains("asset 9") || e.getCause.getMessage.contains("asset 9"))
  }

  test("RealCodecs.Bmp24 decodes dimensions and strips row padding, top-down") {
    val media = Seq((5L, "image", bmpBytes(3, 2))).toDF("asset_id", "kind", "bytes")
    val f = decodePartitions(media, RealCodecs.Bmp24).collect().head
    assert((f.asset_id, f.frame_idx, f.width, f.height) === ((5L, 0, 3, 2)))
    // top-down BGR rows, padding gone: row y=0 = (x, 0, x); row y=1 = (x, 1, x+1)
    assert(f.pixels.length === 3 * 2 * 3)
    assert(f.pixels.toSeq === Seq[Byte](
      0, 0, 0, 1, 0, 1, 2, 0, 2,
      0, 1, 1, 1, 1, 2, 2, 1, 3))
  }

  test("pcmWindowStats16 and bmpColorStats compute exact per-channel statistics") {
    // constant-amplitude mono square wave: rms == peak == amplitude
    val amp = 1000
    val bpf = 2
    val buf = java.nio.ByteBuffer.allocate(44 + 8 * bpf)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8 * bpf).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000 * bpf).putShort(bpf.toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(8 * bpf)
    for (i <- 0 until 8) buf.putShort((if (i % 2 == 0) amp else -amp).toShort)
    val media = Seq((1L, "audio", buf.array())).toDF("asset_id", "kind", "bytes")
    val stats = Multimodal.pcmWindowStats16(
      decodePartitions(media, RealCodecs.PcmWav(1024))).collect()
    assert(stats.length === 1)
    assert(stats.head === PcmWindowStats(1L, 0, 0, 8L, amp, amp * 1000L))

    // 2x1 image with known BGR values → exact q3 channel means
    val img = bmpBytes(2, 1) // row y=0: (0,0,0) and (1,0,1)
    val cmedia = Seq((7L, "image", img)).toDF("asset_id", "kind", "bytes")
    val cs = Multimodal.bmpColorStats(
      decodePartitions(cmedia, RealCodecs.Bmp24)).collect()
    assert(cs.toSeq === Seq(BmpColorStats(7L, 500L, 0L, 500L)))
  }

  test("RealCodecs.ByMagic routes real formats and falls back only for video") {
    val media = Seq(
      (1L, "audio", wavBytes(1, 8000, 10)),
      (2L, "image", bmpBytes(2, 2)),
      (3L, "video", ("payload-" * 600).getBytes("UTF-8")), // unknown → FakeCodec
      (4L, "image", pngBytes(3, 2)),
      (5L, "image", jpegBytes(8, 8, 90, 120, 200)))
      .toDF("asset_id", "kind", "bytes")
    val frames = decodePartitions(media, RealCodecs.ByMagic()).collect()
      .groupBy(_.asset_id)
    assert(frames(1L).head.height === 1 && frames(1L).head.width === 10)
    assert(frames(2L).head.width === 2 && frames(2L).head.height === 2)
    assert(frames(3L).nonEmpty) // fake frames, deterministic
    assert(frames(3L).forall(f => f.width >= 64 && f.width < 640))
    assert(frames(4L).head.width === 3 && frames(4L).head.height === 2) // real PNG decode
    assert(frames(5L).head.width === 8 && frames(5L).head.height === 8) // real JPEG decode
  }

  /** PNG payload via the JDK encoder: pixel (x, y) has RGB
    * (x*40, y*40, x+y) so decode can assert exact values (PNG is
    * lossless). */
  private def pngBytes(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 40) << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Solid-color JPEG via the JDK encoder — a flat field survives DCT
    * compression almost exactly, so decode can assert tight bounds. */
  private def jpegBytes(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("RealCodecs.ImageIo decodes real PNG with exact pixels, JPEG within codec tolerance") {
    val media = Seq(
      (11L, "image", pngBytes(3, 2)),
      (12L, "image", jpegBytes(4, 4, 90, 120, 200)))
      .toDF("asset_id", "kind", "bytes")
    val frames = decodePartitions(media, RealCodecs.ImageIo).collect()
      .groupBy(_.asset_id)

    // PNG is lossless: every BGR byte matches the encoded pattern exactly
    val png = frames(11L).head
    assert((png.frame_idx, png.width, png.height) === ((0, 3, 2)))
    val expected = for (y <- 0 until 2; x <- 0 until 3; v <- Seq(x + y, y * 40, x * 40))
      yield v.toByte
    assert(png.pixels.toSeq === expected)

    // JPEG is lossy, but a solid field decodes within a few counts
    val jpg = frames(12L).head
    assert((jpg.width, jpg.height) === ((4, 4)))
    assert(jpg.pixels.length === 4 * 4 * 3)
    val (eb, eg, er) = (200, 120, 90)
    jpg.pixels.grouped(3).foreach { p =>
      assert(math.abs((p(0) & 0xFF) - eb) <= 8, s"B ${p(0) & 0xFF} vs $eb")
      assert(math.abs((p(1) & 0xFF) - eg) <= 8, s"G ${p(1) & 0xFF} vs $eg")
      assert(math.abs((p(2) & 0xFF) - er) <= 8, s"R ${p(2) & 0xFF} vs $er")
    }

    // feature extraction runs unchanged on ImageIo frames (shared BGR
    // layout): exact q3 means for the PNG pattern
    val cs = Multimodal.bmpColorStats(
      decodePartitions(Seq((11L, "image", pngBytes(3, 2)))
        .toDF("asset_id", "kind", "bytes"), RealCodecs.ImageIo)).collect()
    // B = x+y over {0,1,2}x{0,1}: mean = (0+1+2+1+2+3)/6 = 1.5 → 1500
    // G = y*40: mean = 20 → 20000; R = x*40: mean = 40 → 40000
    assert(cs.toSeq === Seq(BmpColorStats(11L, 1500L, 20000L, 40000L)))

    // malformed image payloads are refused with the asset id
    val bad = Seq((13L, "image", Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 0, 0, 0)))
      .toDF("asset_id", "kind", "bytes")
    val e = intercept[org.apache.spark.SparkException](
      decodePartitions(bad, RealCodecs.ImageIo).collect())
    assert(e.getMessage.contains("asset 13") || e.getCause.getMessage.contains("asset 13"))
  }

  private def animatedGif(w: Int, h: Int,
                          colors: Seq[(Int, Int, Int, Int, Int, Int)]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { case (r0, g0, b0, r1, g1, b1) =>
      val cm = new java.awt.image.IndexColorModel(8, 2,
        Array[Byte](r0.toByte, r1.toByte), Array[Byte](g0.toByte, g1.toByte),
        Array[Byte](b0.toByte, b1.toByte))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x + y) % 2) // checkerboard indexes
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.flush(); writer.dispose(); ios.close()
    baos.toByteArray
  }

  test("RealCodecs.ImageIo decodes every frame of an animated GIF with exact pixels") {
    // 3-frame 16x8 animated GIF, explicit 2-color indexed palette per
    // frame, checkerboard raster — palette-indexed GIF round-trips
    // losslessly through the JDK writer/reader (at height ≥ 5; see the
    // reader-bug guard test below), so pixels pin EXACTLY
    val colors = Seq((0xCC, 0x10, 0x20, 0x01, 0x02, 0x03),
      (0x00, 0xFF, 0x7F, 0x40, 0x41, 0x42), (0x11, 0x22, 0x33, 0xF0, 0xE0, 0xD0))
    val media = Seq((9L, "image", animatedGif(16, 8, colors)))
      .toDF("asset_id", "kind", "bytes")
    val frames = decodePartitions(media, RealCodecs.ImageIo)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    assert(frames.forall(f => f.width == 16 && f.height == 8))
    frames.zip(colors).foreach { case (f, (r0, g0, b0, r1, g1, b1)) =>
      val expected = (for (y <- 0 until 8; x <- 0 until 16) yield {
        if ((x + y) % 2 == 0) Seq(b0.toByte, g0.toByte, r0.toByte)
        else Seq(b1.toByte, g1.toByte, r1.toByte)
      }).flatten
      assert(f.pixels.toSeq === expected, s"frame ${f.frame_idx} pixels differ")
    }
    // ByMagic routes the animated GIF to ImageIo (not the fallback)
    val routed = decodePartitions(media, RealCodecs.ByMagic()).collect()
    assert(routed.length === 3)
    // per-frame color stats keep the frame index
    val solid = Seq((3L, "image",
      animatedGif(8, 5, Seq((10, 20, 30, 10, 20, 30), (40, 50, 60, 40, 50, 60)))))
      .toDF("asset_id", "kind", "bytes")
    val stats = Multimodal.frameColorStats(
        decodePartitions(solid, RealCodecs.ImageIo))
      .collect().sortBy(_.frame_idx)
    assert(stats.map(s => (s.frame_idx, s.mean_b_q3, s.mean_g_q3, s.mean_r_q3)).toSeq
      === Seq((0, 30000L, 20000L, 10000L), (1, 60000L, 50000L, 40000L)))
  }

  test("ImageIo rejects the JDK GIF reader's corrupt-height range loudly; 1x1 is fine") {
    // this JDK's GIFImageReader returns wrong rows for heights 2..4 (the
    // bytes are correct — verified against an independent LZW decode);
    // silent corruption would poison downstream features, so the codec
    // must throw with the asset id instead
    val bad = Seq((7L, "image",
      animatedGif(16, 2, Seq((1, 2, 3, 4, 5, 6)))))
      .toDF("asset_id", "kind", "bytes")
    val e = intercept[org.apache.spark.SparkException](
      decodePartitions(bad, RealCodecs.ImageIo).collect())
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("asset 7") && msg.contains("heights 2..4"))
    // the 1x1 tracking pixel — the common tiny real-world GIF — decodes
    val px = Seq((8L, "image", animatedGif(1, 1, Seq((9, 8, 7, 0, 0, 0)))))
      .toDF("asset_id", "kind", "bytes")
    val f = decodePartitions(px, RealCodecs.ImageIo).collect()
    assert(f.length === 1 && f.head.pixels.toSeq === Seq(7.toByte, 8.toByte, 9.toByte))
  }

  /** Minimal uncompressed RGB24 AVI: frame f, pixel (x, y-from-top) has
    * BGR (x+10f, y+20f, x+y+f) — bottom-up padded DIB rows in '00db'
    * chunks, exactly the layout AviRgb24 must invert. */
  private def aviBytes(width: Int, height: Int, nFrames: Int,
                       frameFourCc: String = "00db",
                       streamType: String = "vids"): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val fb = rowSize * height
    val strl = 4 + 8 + 56 + 8 + 40
    val hdrl = 4 + 8 + 56 + 8 + strl
    val movi = 4 + nFrames * (8 + fb)
    val riff = 4 + 8 + hdrl + 8 + movi
    val buf = java.nio.ByteBuffer.allocate(8 + riff)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def t(s: String) = buf.put(s.getBytes("US-ASCII"))
    t("RIFF"); buf.putInt(riff); t("AVI ")
    t("LIST"); buf.putInt(hdrl); t("hdrl")
    t("avih"); buf.putInt(56)
    (0 until 14).foreach(_ => buf.putInt(0))
    t("LIST"); buf.putInt(strl); t("strl")
    t("strh"); buf.putInt(56)
    t(streamType); t("DIB "); (0 until 12).foreach(_ => buf.putInt(0))
    t("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(fb).putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(movi); t("movi")
    for (f <- 0 until nFrames) {
      t(frameFourCc); buf.putInt(fb)
      for (yUp <- 0 until height) {
        val y = height - 1 - yUp
        for (x <- 0 until width)
          buf.put((x + 10 * f).toByte).put((y + 20 * f).toByte).put((x + y + f).toByte)
        for (_ <- width * 3 until rowSize) buf.put(0.toByte)
      }
    }
    buf.array()
  }

  test("RealCodecs.AviRgb24 decodes every frame with exact pixels, padding stripped") {
    val frames = RealCodecs.AviRgb24.decodeBatch(
      Seq(MediaAsset(9L, "video", aviBytes(3, 2, 2))))
    assert(frames.length === 2)
    frames.zipWithIndex.foreach { case (fr, f) =>
      assert((fr.width, fr.height, fr.frame_idx) === (3, 2, f))
      // top-down BGR with the 1-byte-per-row padding gone
      val expected = (for (y <- 0 until 2; x <- 0 until 3)
        yield Seq(x + 10 * f, y + 20 * f, x + y + f)).flatten.map(_.toByte)
      assert(fr.pixels.toSeq === expected, s"frame $f pixel mismatch")
    }
    // determinism across calls
    val again = RealCodecs.AviRgb24.decodeBatch(
      Seq(MediaAsset(9L, "video", aviBytes(3, 2, 2))))
    assert(again.map(_.pixels.toSeq) === frames.map(_.pixels.toSeq))
  }

  test("AviRgb24 rejects compressed frames, non-video streams and truncation loudly") {
    def failsWith(bytes: Array[Byte], fragment: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        RealCodecs.AviRgb24.decodeBatch(Seq(MediaAsset(7L, "video", bytes)))
      }
      assert(e.getMessage.contains("asset 7") && e.getMessage.contains(fragment),
        s"expected '$fragment' with the asset id, got: ${e.getMessage}")
    }
    failsWith(aviBytes(3, 2, 1, frameFourCc = "00dc"), "native decoder")
    failsWith(aviBytes(3, 2, 1, streamType = "auds"), "not a video stream")
    failsWith(aviBytes(3, 2, 1).dropRight(5), "overruns payload")
    failsWith("RIFFxxxxWAVE".getBytes("US-ASCII"), "not a RIFF/AVI payload")
  }

  test("AviMjpeg decodes MJPEG-in-AVI frames within JPEG tolerance; loud on abuse") {
    val colors = Seq((40, 120, 200), (88, 24, 152), (216, 168, 56))
    val bytes = graft.queries.MultimodalQueries.mjpegAvi(16, 8, colors)
    val frames = RealCodecs.AviMjpeg.decodeBatch(Seq(MediaAsset(5L, "video", bytes)))
    assert(frames.length === 3)
    frames.zipWithIndex.foreach { case (fr, f) =>
      assert((fr.width, fr.height, fr.frame_idx) === (16, 8, f))
      val (r, g, b) = colors(f)
      // solid frames are DC-only: the lossy round-trip stays within a
      // few counts of the source color on every pixel
      fr.pixels.grouped(3).zipWithIndex.foreach { case (Array(pb, pg, pr), i) =>
        assert(math.abs((pb & 0xFF) - b) <= 4, s"frame $f px $i blue ${pb & 0xFF} vs $b")
        assert(math.abs((pg & 0xFF) - g) <= 4, s"frame $f px $i green ${pg & 0xFF} vs $g")
        assert(math.abs((pr & 0xFF) - r) <= 4, s"frame $f px $i red ${pr & 0xFF} vs $r")
      }
    }
    // determinism across calls
    val again = RealCodecs.AviMjpeg.decodeBatch(Seq(MediaAsset(5L, "video", bytes)))
    assert(again.map(_.pixels.toSeq) === frames.map(_.pixels.toSeq))
    // an UNCOMPRESSED avi routed here fails loudly, and vice versa
    val e1 = intercept[IllegalArgumentException] {
      RealCodecs.AviMjpeg.decodeBatch(Seq(MediaAsset(6L, "video", aviBytes(3, 2, 1))))
    }
    assert(e1.getMessage.contains("not MJPG"))
    val e2 = intercept[IllegalArgumentException] {
      RealCodecs.AviRgb24.decodeBatch(Seq(MediaAsset(6L, "video", bytes)))
    }
    assert(e2.getMessage.contains("bpp") || e2.getMessage.contains("native decoder"),
      s"got: ${e2.getMessage}")
  }

  test("ByMagic sniffs the MJPG fourcc and routes compressed AVI to the real decode") {
    val mjpeg = graft.queries.MultimodalQueries.mjpegAvi(16, 8, Seq((88, 136, 184)))
    val media = Seq(
      (1L, "video", mjpeg),
      (2L, "video", aviBytes(4, 3, 2)))
      .toDF("asset_id", "kind", "bytes")
    val frames = decodePartitions(media, RealCodecs.ByMagic()).collect()
      .groupBy(_.asset_id)
    assert(frames(1L).length === 1 && frames(1L).head.width === 16,
      "MJPG AVI must route to AviMjpeg")
    assert(frames(2L).length === 2 && frames(2L).head.width === 4,
      "DIB AVI must still route to AviRgb24")
  }

  test("ByMagic tells the two RIFF forms apart: AVI decodes as video, WAV as audio") {
    val media = Seq(
      (1L, "audio", wavBytes(1, 8000, 10)),
      (2L, "video", aviBytes(4, 3, 2)))
      .toDF("asset_id", "kind", "bytes")
    val frames = decodePartitions(media, RealCodecs.ByMagic()).collect()
      .groupBy(_.asset_id)
    assert(frames(1L).head.height === 1, "WAV must route to PcmWav (channels=height)")
    assert(frames(2L).length === 2 && frames(2L).head.width === 4 &&
      frames(2L).head.height === 3, "AVI must route to the real video decode")
  }

  test("AviPcmAudio demuxes the audio track: stream discovery, chunk concat, windows") {
    // 700 stereo ramp samples split across two '01wb' chunks behind a
    // video stream — windows must match the standalone-WAV decode of the
    // same ramp exactly (same PCM, same window contract)
    val av = graft.queries.MultimodalQueries.rampAviAv(channels = 2, samples = 700)
    val frames = RealCodecs.AviPcmAudio(256).decodeBatch(Seq(MediaAsset(3L, "video", av)))
      .sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.width, f.height)) ===
      Seq((0, 256, 2), (1, 256, 2), (2, 188, 2)))
    val wav = RealCodecs.PcmWav(256).decodeBatch(
      Seq(MediaAsset(3L, "audio", wavBytes(2, 8000, 700)))).sortBy(_.frame_idx)
    assert(frames.map(_.pixels.toSeq) === wav.map(_.pixels.toSeq),
      "demuxed PCM must be byte-identical to the standalone WAV ramp")
    // the sample straddling the chunk cut (frame 350) survives the concat
    val s350 = java.nio.ByteBuffer.wrap(frames(1).pixels, (350 - 256) * 4, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort
    assert(s350 === ((350 * 7) % 32767).toShort)
    // a video-only AVI has no audio track to extract — loud failure
    val e = intercept[IllegalArgumentException](
      RealCodecs.AviPcmAudio(256).decodeBatch(Seq(MediaAsset(9L, "video", aviBytes(3, 2, 1)))))
    assert(e.getMessage.contains("asset 9") && e.getMessage.contains("auds"))
  }

  test("pcmWindowStats16 refuses non-16-bit PCM frames loudly") {
    // 8-bit mono WAV: parseWav accepts it, stats16 must not silently misread
    val samples = 16
    val buf = java.nio.ByteBuffer.allocate(44 + samples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    buf.put("data".getBytes("US-ASCII")).putInt(samples)
    for (i <- 0 until samples) buf.put((i * 3).toByte)
    val media = Seq((21L, "audio", buf.array())).toDF("asset_id", "kind", "bytes")
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.pcmWindowStats16(
        decodePartitions(media, RealCodecs.PcmWav(1024))).collect())
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("asset 21") && msg.contains("16-bit"))
  }

  test("dHash64: brightness-shift invariant, structure-sensitive, deterministic grid") {
    import Multimodal.{DecodedFrame, dHash64}
    def frame(id: Long, f: (Int, Int) => Int, w: Int = 18, h: Int = 16): DecodedFrame = {
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (f(x, y) & 0xFF).toByte
        val o = (y * w + x) * 3
        px(o) = v; px(o + 1) = v; px(o + 2) = v
      }
      DecodedFrame(id, 0, w, h, px)
    }
    val base = frame(1L, (x, y) => (x * 37 + y * 91) % 200)
    val brighter = frame(2L, (x, y) => (x * 37 + y * 91) % 200 + 55) // +55 everywhere
    val flipped = frame(3L, (x, y) => ((17 - x) * 37 + y * 91) % 200)
    val hs = dHash64(spark.createDataset(Seq(base, brighter, flipped))(
        org.apache.spark.sql.Encoders.product[DecodedFrame]))
      .collect().map(f => f.asset_id -> f.dhash).toMap
    assert(hs(1L) === hs(2L), "a uniform brightness shift must not change dHash")
    assert(hs(1L) !== hs(3L), "mirroring the gradient must flip comparison bits")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) > 20,
      "a structural flip should change many bits, not one")
  }

  test("audioFingerprint64: gain-invariant, order-driven, short clips pad low bits") {
    import Multimodal.{DecodedFrame, audioFingerprint64}
    def win(id: Long, w: Int, amp: Int, n: Int = 8): DecodedFrame = {
      val px = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        px(i * 2) = (amp & 0xFF).toByte; px(i * 2 + 1) = ((amp >> 8) & 0xFF).toByte
      }
      DecodedFrame(id, w, n, 1, px)
    }
    val amps = Seq(100, 900, 300, 300, 1200) // bits: 1,0,0,1 → high nibble 1001
    val frames = amps.zipWithIndex.map { case (a, w) => win(1L, w, a) } ++
      amps.zipWithIndex.map { case (a, w) => win(2L, w, a * 2) } ++ // gain ×2
      amps.reverse.zipWithIndex.map { case (a, w) => win(3L, w, a) } // reordered
    val fp = audioFingerprint64(spark.createDataset(frames)(
        org.apache.spark.sql.Encoders.product[DecodedFrame]))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 comparisons → bits at positions 63..60: 1001 (gt, le, eq, gt)
    val expected = java.lang.Long.parseLong("9", 16) << 60
    assert(fp(1L) === expected)
    assert(fp(2L) === fp(1L), "a uniform gain change must not alter the fingerprint")
    assert(fp(3L) !== fp(1L), "window order is the signal")
    // a single-window clip has zero comparisons but MUST still emit its
    // fp = 0 row — dropping it would make one-window exact dupes invisible
    val solo = audioFingerprint64(spark.createDataset(Seq(win(9L, 0, 500)))(
        org.apache.spark.sql.Encoders.product[Multimodal.DecodedFrame]))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(solo === Map(9L -> 0L))
  }

  test("pngDims parses real PNG headers; non-PNG bytes yield NULLs") {
    val bi = new java.awt.image.BufferedImage(37, 21,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", baos)
    val rows = Seq(
      (1L, baos.toByteArray),
      (2L, "definitely not a png".getBytes("UTF-8")))
      .toDF("asset_id", "bytes")
    val (w, h) = Multimodal.pngDims(col("bytes"))
    val got = rows.select(col("asset_id"), w.as("w"), h.as("h"))
      .orderBy("asset_id").collect()
    assert(got(0).getLong(1) === 37L && got(0).getLong(2) === 21L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }

  test("JpegDims walks real/progressive headers; garbage and truncation yield NULL") {
    val bi = new java.awt.image.BufferedImage(41, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", baos)
    val real = baos.toByteArray
    // handcrafted PROGRESSIVE frame header (SOF2, h=32 w=64) — ImageIO
    // only writes baseline, and the exclusion set (C4/C8/CC skipped,
    // C2 accepted) is exactly what a wrong marker test misses
    val sof2 = Array(0xFF, 0xD8, 0xFF, 0xC2, 0x00, 0x0B, 0x08,
      0x00, 0x20, 0x00, 0x40, 0x01, 0x11, 0x00).map(_.toByte)
    // a DHT (C4) before SOF must be SKIPPED, not read as a frame header
    val dhtFirst = Array(0xFF, 0xD8, 0xFF, 0xC4, 0x00, 0x04, 0x01, 0x02,
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x07, 0x00, 0x09, 0x01, 0x11, 0x00)
      .map(_.toByte)
    val pngBaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", pngBaos)
    val rows = Seq(
      (1L, real), (2L, sof2), (3L, dhtFirst),
      (4L, pngBaos.toByteArray),                    // wrong magic
      (5L, real.take(6)),                           // truncated
      (6L, Array(0xFF, 0xD8, 0xFF, 0xDA).map(_.toByte)) // SOS before SOF
    ).toDF("asset_id", "bytes")
    val (w, h) = graft.functions.JpegDims.dims(col("bytes"))
    val got = rows.select(col("asset_id"), w.as("w"), h.as("h"))
      .orderBy("asset_id").collect()
    assert(got(0).getLong(1) === 41L && got(0).getLong(2) === 23L)
    assert(got(1).getLong(1) === 64L && got(1).getLong(2) === 32L)
    assert(got(2).getLong(1) === 9L && got(2).getLong(2) === 7L)
    assert((3 to 5).forall(i => got(i).isNullAt(1) && got(i).isNullAt(2)),
      got.mkString(","))
  }

  test("JpegDims never throws under byte fuzz; mutations of a real JPEG stay sane") {
    val bi = new java.awt.image.BufferedImage(17, 11,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", baos)
    val real = baos.toByteArray
    val rnd = new scala.util.Random(7)
    // pure random bytes: any answer is fine, throwing is not
    (0 until 5000).foreach { _ =>
      val b = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      graft.functions.JpegDims.packedDims(b): Unit
    }
    // single-byte mutations of a real JPEG: parse or refuse, never throw
    (0 until 2000).foreach { _ =>
      val b = real.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      graft.functions.JpegDims.packedDims(b): Unit
    }
    // every truncation point of a real JPEG: never throws, and once the
    // SOF header is fully present the answer is stable
    val full = graft.functions.JpegDims.packedDims(real)
    assert(full === ((17L << 24) | 11L))
    (0 until real.length).foreach { n =>
      val v = graft.functions.JpegDims.packedDims(real.take(n))
      assert(v == -1L || v == full, s"truncation at $n gave $v")
    }
  }

  test("sceneCuts: lag distance per asset; first frame dropped; threshold gates") {
    val stats = Seq(
      // asset 1: colors hold, jump at f=2, hold again
      (1L, 0, 4L, 4L, 4L), (1L, 1, 4L, 4L, 4L), (1L, 2, 9L, 4L, 4L), (1L, 3, 9L, 4L, 4L),
      // asset 2: every frame drifts by exactly 1 in one channel
      (2L, 0, 0L, 0L, 0L), (2L, 1, 1L, 0L, 0L), (2L, 2, 2L, 0L, 0L))
      .toDF("asset_id", "frame_idx", "r", "g", "b")
    val got = Multimodal.sceneCuts(stats, "asset_id", "frame_idx",
        Seq("r", "g", "b"), threshold = 2L)
      .orderBy("asset_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, 1, 0L, false), (1L, 2, 5L, true), (1L, 3, 0L, false),
      (2L, 1, 1L, false), (2L, 2, 1L, false)))
    // threshold 1: the slow drift becomes cuts too
    val cuts1 = Multimodal.sceneCuts(stats, "asset_id", "frame_idx",
        Seq("r", "g", "b"), threshold = 1L)
      .filter(col("is_cut")).count()
    assert(cuts1 === 3L)
  }

  test("sceneCuts: a NULL channel stat mid-asset fails loudly, never vanishes") {
    // the old `dist IS NOT NULL` filter couldn't distinguish the
    // intended first-frame lag NULL from a NULL stat mid-asset — the
    // frame (and its boundary) silently disappeared and the next
    // comparison jumped across it
    val stats = Seq(
      (1L, 0, Some(4L)), (1L, 1, None: Option[Long]), (1L, 2, Some(9L)))
      .toDF("asset_id", "frame_idx", "r")
    val e = intercept[Exception] {
      Multimodal.sceneCuts(stats, "asset_id", "frame_idx", Seq("r"), threshold = 2L)
        .collect()
    }
    assert(e.getMessage.contains("NULL channel stat"),
      s"expected the loud NULL-stat error, got: ${e.getMessage}")
  }
}
