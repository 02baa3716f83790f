package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hashing
import graft.ops.Multimodal

/** Multimodal column operators as driver-verified queries. The `documents`
  * payload stands in for the media bytes (same UTF-8 bytes in both
  * engines), and every derived value is md5-based, so the decode-header
  * stub, feature hashing, and frame sampling are hash-checked end to end
  * — the plumbing a real codec plugs into (graft.ops.Multimodal).
  */
object MultimodalQueries extends QueryModule {

  private def hx = "md5(text)"

  /** Deterministic PCM ramp WAV (the MultimodalSpec generator): 16-bit
    * sample at frame i, channel c = (i·7 + c·3) mod 32767 — a closed
    * form the oracle can recompute without parsing a byte. */
  /** Deterministic mono WAV for the audio-fingerprint gate: 66 windows
    * of 64 constant-amplitude samples; amplitude is a group-strided
    * multiplicative hash (the stride varies by group, so bit sequences
    * decorrelate across groups — a shared stride would make every
    * fingerprint a phase rotation of one Weyl word), variants perturb
    * the first 3 windows. */
  private def patternWav(grp: Long, variant: Long): Array[Byte] = {
    val samples = 66 * 64
    val buf = java.nio.ByteBuffer.allocate(44 + samples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples * 2)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000)
      .putInt(8000 * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(samples * 2)
    for (i <- 0 until samples) {
      val w = i / 64
      val base = ((((w + 1) * (grp * 2 + 7)) * 2654435761L) % 4294967296L) / 262144L
      val amp = if (w < 3) (base + variant * 500) % 16384 else base
      buf.putShort(amp.toShort)
    }
    buf.array()
  }

  private def rampWav(channels: Int, rate: Int, samples: Int): Array[Byte] = {
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

  /** Deterministic 24-bit bottom-up BMP (the MultimodalSpec generator's
    * shape): pixel (x, y-from-top) carries BGR (x mod 256, y mod 256,
    * (x+y) mod 256) — closed form for the oracle. */
  /** Deterministic grayscale BMP for the dHash gate: pixel gray is a
    * Knuth multiplicative hash of (x, y, group) — structurally DIFFERENT
    * across groups — with a 6×6 corner perturbation per variant, so
    * same-group variants are near-dups (hamming ≤ ~5) and cross-group
    * pairs are far. The oracle recomputes the identical closed form. */
  private def patternBmp(width: Int, height: Int, grp: Long, variant: Long): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowSize * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * height)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (yUp <- 0 until height) {
      val y = height - 1 - yUp
      for (x <- 0 until width) {
        val base = (((x + y * width + grp * width * height + 1) * 2654435761L)
          % 4294967296L) / 16777216L
        val gray = (if (x < 6 && y < 6) (base + variant * 60) % 256 else base).toByte
        buf.put(gray).put(gray).put(gray)
      }
      for (_ <- width * 3 until rowSize) buf.put(0.toByte)
    }
    buf.array()
  }

  private def rampBmp(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowSize * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * height)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (yUp <- 0 until height) {
      val y = height - 1 - yUp
      for (x <- 0 until width)
        buf.put((x % 256).toByte).put((y % 256).toByte).put(((x + y) % 256).toByte)
      for (_ <- width * 3 until rowSize) buf.put(0.toByte)
    }
    buf.array()
  }

  /** Deterministic ANIMATED GIF: one solid-color full-size frame per
    * entry of `colors` (packed 0xRRGGBB), written through the JDK's own
    * GIF writer (`writeToSequence`) with an explicit 2-entry indexed
    * palette — the writer preserves indexed palettes exactly, so every
    * decoded pixel is the closed-form color and the oracle recomputes
    * per-frame means without touching a byte. */
  private def solidGif(width: Int, height: Int, colors: Seq[Int]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val cm = new java.awt.image.IndexColorModel(8, 2,
          Array[Byte](((c >> 16) & 0xFF).toByte, 0),
          Array[Byte](((c >> 8) & 0xFF).toByte, 0),
          Array[Byte]((c & 0xFF).toByte, 0))
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        // raster initializes to index 0 = the frame color
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Deterministic uncompressed RGB24 AVI (the byte layout
    * RealCodecs.AviRgb24 decodes): frame f, pixel (x, y-from-top)
    * carries BGR ((x + 11f) mod 256, (y + 7f) mod 256, (x+y+3f) mod 256)
    * — closed form for the oracle. Frames are bottom-up padded DIB rows
    * in '00db' movi chunks, the standard uncompressed-AVI shape. */
  /** Deterministic RGB24 AVI for the video near-dup gate: gray pixels
    * from the (x, y, frame, group) multiplicative-hash closed form, with
    * frame 1's 6×6 corner perturbed per variant — same-group clips are
    * near-dups in exactly one frame region. */
  private def patternAvi(width: Int, height: Int, nFrames: Int,
                         grp: Long, variant: Long): Array[Byte] = {
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
    buf.putInt(40000).putInt(0).putInt(0).putInt(0).putInt(nFrames).putInt(0)
      .putInt(1).putInt(fb).putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(strl); t("strl")
    t("strh"); buf.putInt(56)
    t("vids"); t("DIB "); buf.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(25).putInt(0).putInt(nFrames).putInt(fb)
      .putInt(0).putInt(0)
    buf.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    t("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(fb).putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(movi); t("movi")
    for (f <- 0 until nFrames) {
      t("00db"); buf.putInt(fb)
      for (yUp <- 0 until height) {
        val y = height - 1 - yUp
        for (x <- 0 until width) {
          val base = (((x + y * width + f * width * height +
            grp * width * height * nFrames + 1) * 2654435761L)
            % 4294967296L) / 16777216L
          val gray = (if (f == 1 && x < 6 && y < 6) (base + variant * 60) % 256
                      else base).toByte
          buf.put(gray).put(gray).put(gray)
        }
        for (_ <- width * 3 until rowSize) buf.put(0.toByte)
      }
    }
    buf.array()
  }

  private def rampAvi(width: Int, height: Int, nFrames: Int): Array[Byte] = {
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
    buf.putInt(40000).putInt(0).putInt(0).putInt(0).putInt(nFrames).putInt(0)
      .putInt(1).putInt(fb).putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(strl); t("strl")
    t("strh"); buf.putInt(56)
    t("vids"); t("DIB "); buf.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(25).putInt(0).putInt(nFrames).putInt(fb)
      .putInt(0).putInt(0)
    buf.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    t("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(fb).putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(movi); t("movi")
    for (f <- 0 until nFrames) {
      t("00db"); buf.putInt(fb)
      for (yUp <- 0 until height) {
        val y = height - 1 - yUp
        for (x <- 0 until width)
          buf.put(((x + f * 11) % 256).toByte).put(((y + f * 7) % 256).toByte)
            .put(((x + y + f * 3) % 256).toByte)
        for (_ <- width * 3 until rowSize) buf.put(0.toByte)
      }
    }
    buf.array()
  }

  /** MJPEG AVI: one solid-RGB JPEG (JDK writer, quality 0.95) per entry
    * of `colors`, stored as '00dc' movi chunks behind a 'vids' stream
    * whose BITMAPINFOHEADER compression is the MJPG fourcc — the
    * real-compressed-video fixture for RealCodecs.AviMjpeg. Solid
    * frames survive the lossy JPEG round-trip to within a couple of
    * counts per channel (uniform blocks are DC-only), so a gate that
    * buckets channel means to 16 levels — with the fixture colors
    * CENTERED in their bucket (c ≡ 8 mod 16) — is deterministic despite
    * the codec being genuinely lossy. */
  private[graft] def mjpegAvi(width: Int, height: Int,
                              colors: Seq[(Int, Int, Int)]): Array[Byte] = {
    def jpegOf(r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val gr = img.createGraphics()
      gr.setColor(new java.awt.Color(r, g, b))
      gr.fillRect(0, 0, width, height)
      gr.dispose()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val baos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try {
        w.setOutput(ios)
        val p = w.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.95f)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
        ios.flush()
      } finally { w.dispose(); ios.close() }
      baos.toByteArray
    }
    val jpegs = colors.map { case (r, g, b) => jpegOf(r, g, b) }
    val strl = 4 + 8 + 56 + 8 + 40
    val hdrl = 4 + 8 + 56 + 8 + strl
    val movi = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val riff = 4 + 8 + hdrl + 8 + movi
    val buf = java.nio.ByteBuffer.allocate(8 + riff)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def t(s: String) = buf.put(s.getBytes("US-ASCII"))
    t("RIFF"); buf.putInt(riff); t("AVI ")
    t("LIST"); buf.putInt(hdrl); t("hdrl")
    t("avih"); buf.putInt(56)
    buf.putInt(40000).putInt(0).putInt(0).putInt(0).putInt(jpegs.size).putInt(0)
      .putInt(1).putInt(0).putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(strl); t("strl")
    t("strh"); buf.putInt(56)
    t("vids"); t("MJPG"); buf.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(25).putInt(0).putInt(jpegs.size).putInt(0)
      .putInt(0).putInt(0)
    buf.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    t("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    t("MJPG") // biCompression = the MJPG fourcc
    buf.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(movi); t("movi")
    jpegs.foreach { j =>
      t("00dc"); buf.putInt(j.length); buf.put(j)
      if ((j.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  /** Interleaved A/V AVI: one 4×3 video frame (stream 0, 'DIB ') plus a
    * PCM ramp audio track (stream 1, WAVEFORMATEX) whose samples follow
    * the rampWav closed form — sample (i, c) = (i·7 + c·3) mod 32767 —
    * split across TWO '01wb' chunks so the demuxer's chunk
    * concatenation is actually exercised. */
  private[graft] def rampAviAv(channels: Int, samples: Int): Array[Byte] = {
    val width = 4; val height = 3
    val rowSize = ((24 * width + 31) / 32) * 4
    val fb = rowSize * height
    val pcm = java.nio.ByteBuffer.allocate(samples * channels * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until samples; c <- 0 until channels)
      pcm.putShort(((i * 7 + c * 3) % 32767).toShort)
    val bytes = pcm.array()
    val cut = (samples / 2) * channels * 2 // sample-frame boundary
    val (a1, a2) = bytes.splitAt(cut)
    val strlV = 4 + 8 + 56 + 8 + 40
    val strlA = 4 + 8 + 56 + 8 + 16
    val hdrl = 4 + 8 + 56 + 8 + strlV + 8 + strlA
    val movi = 4 + (8 + fb) + (8 + a1.length) + (8 + a2.length)
    val riff = 4 + 8 + hdrl + 8 + movi
    val buf = java.nio.ByteBuffer.allocate(8 + riff)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def t(s: String) = buf.put(s.getBytes("US-ASCII"))
    t("RIFF"); buf.putInt(riff); t("AVI ")
    t("LIST"); buf.putInt(hdrl); t("hdrl")
    t("avih"); buf.putInt(56)
    buf.putInt(40000).putInt(0).putInt(0).putInt(0).putInt(1).putInt(0)
      .putInt(2).putInt(fb).putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(strlV); t("strl")
    t("strh"); buf.putInt(56)
    t("vids"); t("DIB "); (0 until 12).foreach(_ => buf.putInt(0))
    t("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(fb).putInt(0).putInt(0).putInt(0).putInt(0)
    t("LIST"); buf.putInt(strlA); t("strl")
    t("strh"); buf.putInt(56)
    t("auds"); buf.putInt(1); (0 until 12).foreach(_ => buf.putInt(0))
    t("strf"); buf.putInt(16) // WAVEFORMATEX, cbSize omitted
    buf.putShort(1).putShort(channels.toShort).putInt(8000)
      .putInt(8000 * channels * 2).putShort((channels * 2).toShort).putShort(16)
    t("LIST"); buf.putInt(movi); t("movi")
    t("00db"); buf.putInt(fb)
    for (yUp <- 0 until height; _ <- 0 until rowSize) buf.put(0.toByte): Unit
    t("01wb"); buf.putInt(a1.length); buf.put(a1)
    t("01wb"); buf.putInt(a2.length); buf.put(a2)
    buf.array()
  }

  def defs: Map[String, QueryDef] = Map(
    // The AUDIO track of an interleaved A/V container, hash-gated end to
    // end: ramp PCM interleaved as '01wb' chunks behind a video stream,
    // demuxed by RealCodecs.AviPcmAudio (stream discovery, WAVEFORMATEX
    // parse, multi-chunk concatenation), windowed into the same 256-frame
    // stats as mm_wav_stats — and the oracle recomputes every window from
    // the ramp closed form without touching a byte. A wrong stream pick,
    // dropped chunk, or misaligned concat breaks the hash.
    "mm_avi_audio" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val ch = 1 + (id % 2).toInt
            val n = 400 + (id % 200).toInt
            (id, "video", rampAviAv(ch, n))
          }).toDF("asset_id", "kind", "bytes")
        Multimodal.pcmWindowStats16(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.AviPcmAudio(256)))
          .toDF()
          .orderBy(col("asset_id"), col("frame_idx"), col("channel"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS id, 1 + doc_id % 2 AS ch, 400 + doc_id % 200 AS n
             |  FROM documents WHERE doc_id < 100
             |), f AS (
             |  SELECT id, ch, unnest(range(0, n)) AS fr FROM a
             |), c AS (
             |  SELECT id, fr, unnest(range(0, ch)) AS chan FROM f
             |), v AS (
             |  SELECT id, chan, fr // 256 AS w, (fr * 7 + chan * 3) % 32767 AS s FROM c
             |)
             |SELECT id AS asset_id, CAST(w AS INT) AS frame_idx,
             |  CAST(chan AS INT) AS channel,
             |  CAST(count(*) AS BIGINT) AS n_samples,
             |  CAST(max(s) AS INT) AS peak_abs,
             |  CAST(floor(sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) * 1000.0 + 0.5) AS BIGINT) AS rms_q3
             |FROM v GROUP BY 1, 2, 3
             |ORDER BY asset_id, frame_idx, channel""".stripMargin)),

    // REAL VIDEO decode, hash-gated end to end: uncompressed RGB24 AVIs
    // (2..4 ramp frames, varying dims incl. row padding) are fabricated
    // per doc_id, decoded by the strict RIFF chunk walk
    // (RealCodecs.AviRgb24 — the same byte-layout discipline as the WAV
    // and BMP paths), reduced to per-frame q3 channel means — and the
    // oracle recomputes every frame's means from the ramp closed form
    // without parsing a byte. A wrong chunk offset, dropped/reordered
    // frame, bad padding strip, row order, or channel order breaks the
    // hash.
    "mm_avi_frames" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val w = 3 + (id % 7).toInt // widths 3..9: varied row padding
            val h = 2 + (id % 5).toInt
            val nf = 2 + (id % 3).toInt
            (id, "video", rampAvi(w, h, nf))
          }).toDF("asset_id", "kind", "bytes")
        Multimodal.frameColorStats(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.AviRgb24))
          .toDF()
          .orderBy(col("asset_id"), col("frame_idx"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS id, 3 + doc_id % 7 AS w, 2 + doc_id % 5 AS h,
             |    2 + doc_id % 3 AS nf
             |  FROM documents WHERE doc_id < 100
             |), fr AS (
             |  SELECT id, w, h, unnest(range(0, nf)) AS f FROM a
             |), px AS (
             |  SELECT id, w, h, f, unnest(range(0, w)) AS x FROM fr
             |), pxy AS (
             |  SELECT id, w, h, f, x, unnest(range(0, h)) AS y FROM px
             |), sums AS (
             |  SELECT id, f,
             |    CAST(w * h AS BIGINT) AS n,
             |    CAST(sum((x + f * 11) % 256) AS BIGINT) AS sb,
             |    CAST(sum((y + f * 7) % 256) AS BIGINT) AS sg,
             |    CAST(sum((x + y + f * 3) % 256) AS BIGINT) AS sr
             |  FROM pxy GROUP BY id, f, w, h
             |)
             |SELECT id AS asset_id, CAST(f AS INT) AS frame_idx,
             |  CAST(floor(CAST(sb AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT) AS mean_b_q3,
             |  CAST(floor(CAST(sg AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT) AS mean_g_q3,
             |  CAST(floor(CAST(sr AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT) AS mean_r_q3
             |FROM sums ORDER BY asset_id, frame_idx""".stripMargin)),
    // REAL COMPRESSED-video decode, hash-gated: per-doc MJPEG AVIs
    // (1..3 solid-color JPEG frames behind an MJPG 'vids' stream) are
    // fabricated, routed through ByMagic's compression sniff to
    // RealCodecs.AviMjpeg (RIFF walk + per-'00dc' JDK JPEG decode), and
    // reduced to 16-level channel-mean buckets. The fixture colors sit
    // CENTERED in their bucket (c ≡ 8 mod 16) while the lossy JPEG
    // round-trip of a solid frame moves means by ≲2 counts — so the
    // bucket is exact and the oracle recomputes it from the color
    // closed form without decoding anything. A dropped frame, wrong
    // chunk routing, or channel-order slip breaks the hash.
    "mm_mjpeg_frames" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 60)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val nf = 1 + (id % 3).toInt
            val colors = (0 until nf).map { f =>
              (16 * ((id + 3 * f) % 16).toInt + 8,
                16 * ((2 * id + 5 * f + 1) % 16).toInt + 8,
                16 * ((3 * id + 7 * f + 2) % 16).toInt + 8)
            }
            (id, "video", mjpegAvi(16, 8, colors))
          }).toDF("asset_id", "kind", "bytes")
        Multimodal.frameColorStats(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.ByMagic()))
          .toDF()
          .select(col("asset_id"), col("frame_idx"),
            floor(col("mean_r_q3") / 16000).cast("long").as("r16"),
            floor(col("mean_g_q3") / 16000).cast("long").as("g16"),
            floor(col("mean_b_q3") / 16000).cast("long").as("b16"))
          .orderBy(col("asset_id"), col("frame_idx"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS id, 1 + doc_id % 3 AS nf
             |  FROM documents WHERE doc_id < 60
             |), fr AS (
             |  SELECT id, unnest(range(0, nf)) AS f FROM a
             |)
             |SELECT id AS asset_id, CAST(f AS INT) AS frame_idx,
             |  CAST((id + 3 * f) % 16 AS BIGINT) AS r16,
             |  CAST((2 * id + 5 * f + 1) % 16 AS BIGINT) AS g16,
             |  CAST((3 * id + 7 * f + 2) % 16 AS BIGINT) AS b16
             |FROM fr ORDER BY asset_id, frame_idx""".stripMargin)),

    // REAL PNG header metadata without decoding a pixel: genuine PNGs
    // (JDK ImageIO encoder) with closed-form dims, parsed by the
    // scan-stage IHDR expression — the oracle recomputes width/height
    // from the formula without touching a byte, so a mis-offset, an
    // endianness slip, or a signature misfire breaks the gate.
    "mm_png_meta" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val w = 16 + (id % 21).toInt
            val h = 9 + (id % 13).toInt
            val bi = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = bi.createGraphics()
            g.setColor(new java.awt.Color(((id * 37) % 256).toInt, 0, 0))
            g.fillRect(0, 0, w, h)
            g.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "png", baos)
            (id, baos.toByteArray)
          }).toDF("asset_id", "bytes")
        val (wCol, hCol) = Multimodal.pngDims(col("bytes"))
        media.select(col("asset_id"), wCol.as("width"), hCol.as("height"))
          .orderBy(col("asset_id"))
      },
      Some("""SELECT doc_id AS asset_id,
             |  CAST(16 + doc_id % 21 AS BIGINT) AS width,
             |  CAST(9 + doc_id % 13 AS BIGINT) AS height
             |FROM documents WHERE doc_id < 200 ORDER BY asset_id""".stripMargin)),

    // JPEG header metadata WITHOUT decode — the pngDims twin for the
    // variable-layout format: REAL ImageIO-encoded JPEGs (JFIF APP0 +
    // quantization/huffman tables precede the frame header, so the
    // kernel's segment walk is genuinely exercised), dims from a
    // closed-form doc_id formula the oracle recomputes. A mis-skipped
    // segment or off-by-one in the SOF offsets shifts every dimension.
    "mm_jpeg_meta" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val w = 16 + (id % 21).toInt
            val h = 9 + (id % 13).toInt
            val bi = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = bi.createGraphics()
            g.setColor(new java.awt.Color(((id * 37) % 256).toInt, 0, 0))
            g.fillRect(0, 0, w, h)
            g.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "jpg", baos)
            (id, baos.toByteArray)
          }).toDF("asset_id", "bytes")
        val (wCol, hCol) = graft.functions.JpegDims.dims(col("bytes"))
        media.select(col("asset_id"), wCol.as("width"), hCol.as("height"))
          .orderBy(col("asset_id"))
      },
      Some("""SELECT doc_id AS asset_id,
             |  CAST(16 + doc_id % 21 AS BIGINT) AS width,
             |  CAST(9 + doc_id % 13 AS BIGINT) AS height
             |FROM documents WHERE doc_id < 200 ORDER BY asset_id""".stripMargin)),

    // Scene-cut detection composed onto the REAL MJPEG decode path:
    // 4–6-frame MJPEG AVIs whose color holds for two frames then jumps
    // (bucket-centered solid colors survive the lossy round-trip into
    // exact 16-level buckets), shot boundaries from the L1 bucket
    // distance of consecutive frames. The oracle replays the closed-form
    // color walk and the same lag/abs/threshold arithmetic — a missed
    // boundary, an off-by-one frame order, or codec noise above the
    // bucket width breaks the hash.
    "mm_scene_cuts" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 60)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val nf = 4 + (id % 3).toInt
            val colors = (0 until nf).map { f =>
              val k = f / 2 // color holds for two frames, then jumps
              (16 * ((id + 5 * k) % 16).toInt + 8,
                16 * ((2 * id + 3 * k + 1) % 16).toInt + 8,
                16 * ((3 * id + 7 * k + 2) % 16).toInt + 8)
            }
            (id, "video", mjpegAvi(16, 8, colors))
          }).toDF("asset_id", "kind", "bytes")
        val stats = Multimodal.frameColorStats(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.ByMagic()))
          .toDF()
          .select(col("asset_id"), col("frame_idx"),
            floor(col("mean_r_q3") / 16000).cast("long").as("r16"),
            floor(col("mean_g_q3") / 16000).cast("long").as("g16"),
            floor(col("mean_b_q3") / 16000).cast("long").as("b16"))
        Multimodal.sceneCuts(stats, "asset_id", "frame_idx",
            Seq("r16", "g16", "b16"), threshold = 1L)
          .orderBy(col("asset_id"), col("frame_idx"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS id, 4 + doc_id % 3 AS nf
             |  FROM documents WHERE doc_id < 60
             |), fr AS (
             |  SELECT id, unnest(range(0, nf)) AS f FROM a
             |), st AS (
             |  SELECT id, f,
             |    (id + 5 * (f // 2)) % 16 AS r16,
             |    (2 * id + 3 * (f // 2) + 1) % 16 AS g16,
             |    (3 * id + 7 * (f // 2) + 2) % 16 AS b16
             |  FROM fr
             |), dd AS (
             |  SELECT id, f,
             |    abs(r16 - lag(r16) OVER w) + abs(g16 - lag(g16) OVER w)
             |      + abs(b16 - lag(b16) OVER w) AS dist
             |  FROM st WINDOW w AS (PARTITION BY id ORDER BY f)
             |)
             |SELECT id AS asset_id, CAST(f AS INT) AS frame_idx,
             |  CAST(dist AS BIGINT) AS dist, dist >= 1 AS is_cut
             |FROM dd WHERE dist IS NOT NULL
             |ORDER BY asset_id, frame_idx""".stripMargin)),

    // REAL multi-frame decode, hash-gated end to end: animated GIFs
    // (2..4 solid-color frames, varying dims) are fabricated per doc_id,
    // decoded frame-by-frame through the JDK GIF reader
    // (RealCodecs.ImageIo getNumImages + per-frame read), reduced to
    // per-frame q3 channel means — and the oracle recomputes every
    // frame's means from the color closed form without parsing a byte.
    // A dropped frame, wrong frame order, palette corruption, or
    // channel-order slip breaks the hash.
    "mm_gif_frames" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            // dims stay ≥ 5 high: this JDK's GIF reader corrupts (and the
            // codec therefore rejects) frame heights 2..4 — see ImageIo
            val w = 8 + (id % 5).toInt
            val h = 5 + (id % 4).toInt
            val nf = 2 + (id % 3).toInt
            val colors = (0 until nf).map { f =>
              (((id * 7 + f * 13) % 256).toInt << 16) |
                (((id * 3 + f * 5) % 256).toInt << 8) |
                ((id * 11 + f * 17) % 256).toInt
            }
            (id, "image", solidGif(w, h, colors))
          }).toDF("asset_id", "kind", "bytes")
        Multimodal.frameColorStats(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.ImageIo))
          .toDF()
          .orderBy(col("asset_id"), col("frame_idx"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS id, 2 + doc_id % 3 AS nf
             |  FROM documents WHERE doc_id < 100
             |), fr AS (
             |  SELECT id, unnest(range(0, nf)) AS f FROM a
             |)
             |SELECT id AS asset_id, CAST(f AS INT) AS frame_idx,
             |  CAST(((id * 11 + f * 17) % 256) * 1000 AS BIGINT) AS mean_b_q3,
             |  CAST(((id * 3 + f * 5) % 256) * 1000 AS BIGINT) AS mean_g_q3,
             |  CAST(((id * 7 + f * 13) % 256) * 1000 AS BIGINT) AS mean_r_q3
             |FROM fr ORDER BY asset_id, frame_idx""".stripMargin)),

    // The REAL image decode path, hash-gated like mm_wav_stats below:
    // deterministic ramp BMPs (varying dims incl. row padding), decoded
    // by the byte-layout Bmp24 codec, reduced to exact q3 channel means —
    // the oracle recomputes each mean from the pixel formula without
    // touching a byte. Wrong padding strip, row order, or channel order
    // breaks the hash.
    "mm_bmp_stats" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val w = 3 + (id % 7).toInt // widths 3..9: varied row padding
            val h = 2 + (id % 5).toInt
            (id, "image", rampBmp(w, h))
          }).toDF("asset_id", "kind", "bytes")
        Multimodal.bmpColorStats(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.Bmp24))
          .toDF()
          .orderBy(col("asset_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS id, 3 + doc_id % 7 AS w, 2 + doc_id % 5 AS h
             |  FROM documents WHERE doc_id < 100
             |), px AS (
             |  SELECT id, w, h, unnest(range(0, w)) AS x FROM a
             |), pxy AS (
             |  SELECT id, w, h, x, unnest(range(0, h)) AS y FROM px
             |), sums AS (
             |  SELECT id,
             |    CAST(w * h AS BIGINT) AS n,
             |    CAST(sum(x % 256) AS BIGINT) AS sb,
             |    CAST(sum(y % 256) AS BIGINT) AS sg,
             |    CAST(sum((x + y) % 256) AS BIGINT) AS sr
             |  FROM pxy GROUP BY id, w, h
             |)
             |SELECT id AS asset_id,
             |  CAST(floor(CAST(sb AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT) AS mean_b_q3,
             |  CAST(floor(CAST(sg AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT) AS mean_g_q3,
             |  CAST(floor(CAST(sr AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT) AS mean_r_q3
             |FROM sums ORDER BY asset_id""".stripMargin)),

    // The REAL audio decode path, hash-gated end to end: deterministic
    // ramp WAVs are fabricated per doc_id (mono/stereo, varying length),
    // decoded by the strict RIFF chunk walk (RealCodecs.PcmWav), windowed
    // into 256-frame stats — and the oracle recomputes every window's
    // count/peak/rms from the ramp's CLOSED FORM, never touching a byte.
    // A wrong chunk offset, byte order, window split, or stats formula
    // breaks the hash.
    "mm_wav_stats" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            val ch = 1 + (id % 2).toInt
            val n = 500 + (id % 300).toInt
            (id, "audio", rampWav(ch, 8000, n))
          }).toDF("asset_id", "kind", "bytes")
        Multimodal.pcmWindowStats16(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.PcmWav(256)))
          .toDF()
          .orderBy(col("asset_id"), col("frame_idx"), col("channel"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS id, 1 + doc_id % 2 AS ch, 500 + doc_id % 300 AS n
             |  FROM documents WHERE doc_id < 100
             |), f AS (
             |  SELECT id, ch, unnest(range(0, n)) AS fr FROM a
             |), c AS (
             |  SELECT id, fr, unnest(range(0, ch)) AS chan FROM f
             |), v AS (
             |  SELECT id, chan, fr // 256 AS w, (fr * 7 + chan * 3) % 32767 AS s FROM c
             |)
             |SELECT id AS asset_id, CAST(w AS INT) AS frame_idx,
             |  CAST(chan AS INT) AS channel,
             |  CAST(count(*) AS BIGINT) AS n_samples,
             |  CAST(max(s) AS INT) AS peak_abs,
             |  CAST(floor(sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) * 1000.0 + 0.5) AS BIGINT) AS rms_q3
             |FROM v GROUP BY 1, 2, 3
             |ORDER BY asset_id, frame_idx, channel""".stripMargin)),

    // Perceptual near-duplicate image detection, hash-gated end to end:
    // real BMP decode → integer dHash (9×8 area-average grid, BT.601
    // gray, MSB-first bits) → 4×16-bit band blocking → exact Hamming
    // verify ≤ 10. The scale shape is the MinHash-LSH one: payload bytes
    // never shuffle — only (asset_id, band) rows block and (id, hash)
    // pairs verify. The oracle rebuilds every pixel from the fixture's
    // closed form and replays grid/bits/bands/ham identically.
    "mm_dhash_neardup" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, "image", patternBmp(24, 16, id / 4, id % 4))
          }).toDF("asset_id", "kind", "bytes")
        val hashes = Multimodal.dHash64(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.Bmp24))
          .toDF().localCheckpoint() // feeds banding AND both verify sides
        val bands = hashes.select(col("asset_id"),
          explode(array((0 until 4).map(i => struct(lit(i).as("bi"),
            shiftright(col("dhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("e"))
          .select(col("asset_id"), col("e.bi").as("bi"), col("e.bv").as("bv"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
              col("x.asset_id") < col("y.asset_id"))
          .select(col("x.asset_id").as("a"), col("y.asset_id").as("b")).distinct()
        cand
          .join(hashes.select(col("asset_id").as("a"), col("dhash").as("ha")), "a")
          .join(hashes.select(col("asset_id").as("b"), col("dhash").as("hb")), "b")
          .select(col("a"), col("b"),
            bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
          .where(col("hamming") <= 10)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH a AS MATERIALIZED (
             |  SELECT doc_id AS id, 24 AS w, 16 AS h, doc_id // 4 AS grp, doc_id % 4 AS var
             |  FROM documents WHERE doc_id < 200
             |), px AS (SELECT id, w, h, grp, var, unnest(range(0, w)) AS x FROM a),
             |pxy AS (SELECT id, w, h, grp, var, x, unnest(range(0, h)) AS y FROM px),
             |g AS MATERIALIZED (
             |  SELECT id, w, h, x, y,
             |    CASE WHEN x < 6 AND y < 6
             |      THEN (((x + y*24 + grp*384 + 1) * 2654435761) % 4294967296 // 16777216 + var*60) % 256
             |      ELSE ((x + y*24 + grp*384 + 1) * 2654435761) % 4294967296 // 16777216 END AS gray
             |  FROM pxy
             |), cells AS MATERIALIZED (
             |  SELECT id, (y*8)//h AS cy, (x*9)//w AS cx, sum(gray)//count(*) AS avgv
             |  FROM g GROUP BY 1,2,3
             |), bits AS (
             |  SELECT l.id, l.cy, l.cx, CASE WHEN r.avgv > l.avgv THEN 1 ELSE 0 END AS bit
             |  FROM cells l JOIN cells r ON r.id = l.id AND r.cy = l.cy AND r.cx = l.cx + 1
             |  WHERE l.cx < 8
             |), bands AS MATERIALIZED (
             |  SELECT id, (63 - (cy*8+cx)) // 16 AS bi,
             |    CAST(sum(bit * (1::BIGINT << ((63 - (cy*8+cx)) % 16))) AS BIGINT) AS bv
             |  FROM bits GROUP BY 1, 2
             |), cand AS (
             |  SELECT DISTINCT x.id AS a, y.id AS b FROM bands x
             |  JOIN bands y ON x.bi = y.bi AND x.bv = y.bv AND x.id < y.id
             |), ham AS (
             |  SELECT c.a, c.b, CAST(sum(bit_count(xor(xa.bv, xb.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands xa ON xa.id = c.a
             |  JOIN bands xb ON xb.id = c.b AND xb.bi = xa.bi
             |  GROUP BY 1, 2
             |)
             |SELECT a, b, hamming FROM ham WHERE hamming <= 10 ORDER BY a, b""".stripMargin)),

    // Audio near-duplicate detection via the energy-delta fingerprint:
    // real RIFF/PCM decode → per-window integer energies → sign-of-delta
    // 64-bit fingerprint (gain-invariant) → band blocking → exact
    // Hamming verify — the audio sibling of mm_dhash_neardup, same
    // payload-bytes-never-shuffle scale shape. The oracle rebuilds every
    // window amplitude from the closed form (energy = 64·A², monotone in
    // A ≥ 0, so amplitude comparisons ARE energy comparisons bit for
    // bit) and replays bits/bands/ham.
    "mm_audio_fp_neardup" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, "audio", patternWav(id / 4, id % 4))
          }).toDF("asset_id", "kind", "bytes")
        val fps = Multimodal.audioFingerprint64(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.PcmWav(64)))
          .localCheckpoint() // feeds banding AND both verify sides
        val bands = fps.select(col("asset_id"),
          explode(array((0 until 4).map(i => struct(lit(i).as("bi"),
            shiftright(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("e"))
          .select(col("asset_id"), col("e.bi").as("bi"), col("e.bv").as("bv"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
              col("x.asset_id") < col("y.asset_id"))
          .select(col("x.asset_id").as("a"), col("y.asset_id").as("b")).distinct()
        cand
          .join(fps.select(col("asset_id").as("a"), col("fp").as("fa")), "a")
          .join(fps.select(col("asset_id").as("b"), col("fp").as("fb")), "b")
          .select(col("a"), col("b"),
            bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long").as("hamming"))
          .where(col("hamming") <= 8)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH a AS MATERIALIZED (
             |  SELECT doc_id AS id, doc_id // 4 AS grp, doc_id % 4 AS var
             |  FROM documents WHERE doc_id < 200
             |), wnd AS (SELECT id, grp, var, unnest(range(0, 66)) AS w FROM a),
             |amp AS MATERIALIZED (
             |  SELECT id, w,
             |    CASE WHEN w < 3
             |      THEN (((((w+1) * (grp*2+7)) * 2654435761) % 4294967296) // 262144 + var*500) % 16384
             |      ELSE ((((w+1) * (grp*2+7)) * 2654435761) % 4294967296) // 262144 END AS amp
             |  FROM wnd
             |), bits AS (
             |  SELECT l.id, l.w, CASE WHEN r.amp > l.amp THEN 1 ELSE 0 END AS bit
             |  FROM amp l JOIN amp r ON r.id = l.id AND r.w = l.w + 1 WHERE l.w < 64
             |), bands AS MATERIALIZED (
             |  SELECT id, (63 - w) // 16 AS bi,
             |    CAST(sum(bit * (1::BIGINT << ((63 - w) % 16))) AS BIGINT) AS bv
             |  FROM bits GROUP BY 1, 2
             |), cand AS (
             |  SELECT DISTINCT x.id AS a, y.id AS b FROM bands x
             |  JOIN bands y ON x.bi = y.bi AND x.bv = y.bv AND x.id < y.id
             |), ham AS (
             |  SELECT c.a, c.b, CAST(sum(bit_count(xor(xa.bv, xb.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands xa ON xa.id = c.a
             |  JOIN bands xb ON xb.id = c.b AND xb.bi = xa.bi
             |  GROUP BY 1, 2
             |)
             |SELECT a, b, hamming FROM ham WHERE hamming <= 8 ORDER BY a, b""".stripMargin)),

    // Video near-duplicate detection: real RGB24-AVI container decode →
    // per-FRAME dHash (the image kernel, frame_idx preserved) → banding
    // on (frame, band) so a pair must collide within the same frame
    // position → exact per-frame Hamming summed over the clip. Completes
    // the text/embedding/image/audio/video near-dup family on one scale
    // shape: payloads decode in place, only (id, frame, band) rows and
    // per-frame 64-bit hashes ever shuffle.
    "mm_video_dhash_neardup" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, "video", patternAvi(24, 16, 3, id / 4, id % 4))
          }).toDF("asset_id", "kind", "bytes")
        val hashes = Multimodal.dHash64(
            Multimodal.decodePartitions(media, Multimodal.RealCodecs.AviRgb24))
          .toDF().localCheckpoint() // feeds banding AND both verify sides
        val bands = hashes.select(col("asset_id"), col("frame_idx"),
          explode(array((0 until 4).map(i => struct(lit(i).as("bi"),
            shiftright(col("dhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("e"))
          .select(col("asset_id"), col("frame_idx"), col("e.bi").as("bi"), col("e.bv").as("bv"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.frame_idx") === col("y.frame_idx") &&
              col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
              col("x.asset_id") < col("y.asset_id"))
          .select(col("x.asset_id").as("a"), col("y.asset_id").as("b")).distinct()
        cand
          .join(hashes.select(col("asset_id").as("a"), col("frame_idx"),
            col("dhash").as("ha")), "a")
          .join(hashes.select(col("asset_id").as("b"), col("frame_idx"),
            col("dhash").as("hb")), Seq("b", "frame_idx"))
          .groupBy(col("a"), col("b"))
          .agg(sum(bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")).as("hamming"))
          .where(col("hamming") <= 20)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH a AS MATERIALIZED (
             |  SELECT doc_id AS id, doc_id // 4 AS grp, doc_id % 4 AS var
             |  FROM documents WHERE doc_id < 200
             |), fr AS (SELECT id, grp, var, unnest(range(0, 3)) AS f FROM a),
             |px AS (SELECT id, grp, var, f, unnest(range(0, 24)) AS x FROM fr),
             |pxy AS (SELECT id, grp, var, f, x, unnest(range(0, 16)) AS y FROM px),
             |g AS MATERIALIZED (
             |  SELECT id, f, x, y,
             |    CASE WHEN f = 1 AND x < 6 AND y < 6
             |      THEN (((x + y*24 + f*384 + grp*1152 + 1) * 2654435761) % 4294967296 // 16777216 + var*60) % 256
             |      ELSE ((x + y*24 + f*384 + grp*1152 + 1) * 2654435761) % 4294967296 // 16777216 END AS gray
             |  FROM pxy
             |), cells AS MATERIALIZED (
             |  SELECT id, f, (y*8)//16 AS cy, (x*9)//24 AS cx, sum(gray)//count(*) AS avgv
             |  FROM g GROUP BY 1,2,3,4
             |), bits AS (
             |  SELECT l.id, l.f, l.cy, l.cx, CASE WHEN r.avgv > l.avgv THEN 1 ELSE 0 END AS bit
             |  FROM cells l JOIN cells r ON r.id = l.id AND r.f = l.f AND r.cy = l.cy AND r.cx = l.cx + 1
             |  WHERE l.cx < 8
             |), bands AS MATERIALIZED (
             |  SELECT id, f, (63 - (cy*8+cx)) // 16 AS bi,
             |    CAST(sum(bit * (1::BIGINT << ((63 - (cy*8+cx)) % 16))) AS BIGINT) AS bv
             |  FROM bits GROUP BY 1, 2, 3
             |), cand AS (
             |  SELECT DISTINCT x.id AS a, y.id AS b FROM bands x
             |  JOIN bands y ON x.f = y.f AND x.bi = y.bi AND x.bv = y.bv AND x.id < y.id
             |), ham AS (
             |  SELECT c.a, c.b, CAST(sum(bit_count(xor(xa.bv, xb.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands xa ON xa.id = c.a
             |  JOIN bands xb ON xb.id = c.b AND xb.f = xa.f AND xb.bi = xa.bi
             |  GROUP BY 1, 2
             |)
             |SELECT a, b, hamming FROM ham WHERE hamming <= 20 ORDER BY a, b""".stripMargin)),

    "mm_meta" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val (w, h, c) = Multimodal.fakeMeta(col("text").cast("binary"))
        docs.select(col("doc_id"), w.as("width"), h.as("height"), c.as("channels"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  64 + (${Hashing.h64Sql(hx, "w")} % 576) AS width,
              |  64 + (${Hashing.h64Sql(hx, "h")} % 416) AS height,
              |  1 + (${Hashing.h64Sql(hx, "c")} % 3) AS channels
              |FROM documents ORDER BY doc_id""".stripMargin)),

    "mm_features" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val hxc = md5(col("text").cast("binary"))
        def f(i: Int) =
          (Hashing.h64(hxc, s"feat:$i") % 1000000L).cast("double") / 1000000.0
        val checksum = (0 until 16).map(i => Hashing.h64(hxc, s"feat:$i") % 1000000L)
          .reduce(_ + _)
        docs.select(col("doc_id"), f(0).as("f0"), f(7).as("f7"), f(15).as("f15"),
            checksum.as("checksum"))
          .orderBy(col("doc_id"))
      },
      {
        def f(i: Int) = s"CAST((${Hashing.h64Sql(hx, s"feat:$i")} % 1000000) AS DOUBLE) / 1000000.0"
        val checksum = (0 until 16)
          .map(i => s"(${Hashing.h64Sql(hx, s"feat:$i")} % 1000000)").mkString(" + ")
        Some(s"""SELECT doc_id, ${f(0)} AS f0, ${f(7)} AS f7, ${f(15)} AS f15,
                |  ($checksum) AS checksum
                |FROM documents ORDER BY doc_id""".stripMargin)
      }),

    "mm_frames" -> QueryDef(
      (s, d) =>
        Multimodal.sampleFrames(Tables.documents(s, d), "doc_id", "text",
            frameBytes = 256, stride = 4)
          .orderBy(col("asset_id"), col("frame_idx")),
      Some("""WITH n AS (
             |  SELECT doc_id, text,
             |    greatest(CAST(ceil(length(text) / 256.0) AS BIGINT), 1) AS nf
             |  FROM documents
             |), ex AS (
             |  SELECT doc_id, text, unnest(range(0, nf)) AS frame_idx FROM n
             |)
             |SELECT doc_id AS asset_id, frame_idx,
             |  md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_hash
             |FROM ex WHERE frame_idx % 4 = 0
             |ORDER BY asset_id, frame_idx""".stripMargin))
  )
}
