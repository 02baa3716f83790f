package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Data model: media travel as opaque `binary` payloads with typed
  * metadata — `(asset_id, kind, bytes, meta struct)` — partitioned by
  * asset_id so a decode pass is embarrassingly parallel and a single
  * oversized asset can't skew a partition (100 TB rule: payload bytes
  * never join-shuffle; only ids/metadata/features do).
  *
  * Two operator families:
  *  1. Column-level analysis (meta extraction, feature hashing, frame
  *     sampling): pure Catalyst expressions over the payload — codegen'd,
  *     zero shuffle, and md5-derived so the DuckDB oracle reproduces them
  *     exactly (graft.queries.MultimodalQueries).
  *  2. Codec decode ([[decodePartitions]]): the Spark-side plumbing for a
  *     real image/audio codec — typed `Dataset.mapPartitions` (the Scala
  *     analog of `mapInPandas`) with explicit micro-batching so a
  *     vectorized decoder gets arrays of payloads, not one call per row.
  *     The codec is injectable. [[RealCodecs]] decode PCM WAV,
  *     uncompressed 24-bit BMP, uncompressed RGB24 AVI video, and
  *     MJPEG-in-AVI COMPRESSED video FOR REAL (byte-layout specs +
  *     per-frame JDK JPEG decode, pure JVM), and JPEG/PNG/GIF/TIFF FOR
  *     REAL through the JDK's own `javax.imageio` readers (pure JVM,
  *     ship with the stock JDK); [[FakeCodec]] remains the deterministic
  *     stand-in only for INTER-FRAME compressed video (H.264/VP9),
  *     whose decode genuinely needs native libraries — swapping in a
  *     JNI/JavaCV decoder changes no plumbing.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             sampleRate: Int, durationMs: Long, format: String)
  final case class MediaAsset(asset_id: Long, kind: String, bytes: Array[Byte])
  final case class DecodedFrame(asset_id: Long, frame_idx: Int,
                                width: Int, height: Int, pixels: Array[Byte])

  /** Codec interface: one call per micro-batch of payloads (vectorized —
    * the batch shape a native decoder wants). */
  trait MediaCodec extends Serializable {
    def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame]
  }

  /** Deterministic stand-in codec for INTER-FRAME compressed video —
    * PERMANENT SCOPE, not a stub to burn down: H.264/VP9 decode requires
    * native libraries (libavcodec or a JNI bridge) that a pure-JVM
    * library cannot ship, and everything pure-JVM-decodable already
    * decodes for real ([[RealCodecs]]: PCM WAV, BMP, RGB24 AVI,
    * MJPEG-in-AVI, and JPEG/PNG/GIF/TIFF via javax.imageio). Deployments
    * with native decoders swap one [[MediaCodec]] in; no plumbing
    * changes. Emits one "frame" per 4 KiB of payload with md5-derived
    * dimensions and a pixel buffer sampled from the payload bytes; fully
    * reproducible for tests. */
  object FakeCodec extends MediaCodec {
    override def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame] =
      assets.flatMap { a =>
        val n = math.max(1, a.bytes.length / 4096)
        (0 until n).map { i =>
          val h = Hashing.planTimeH64(s"frame:${a.asset_id}:$i")
          val w = 64 + (h % 576).toInt
          val ht = 64 + ((h >> 16) % 416).toInt
          val px = a.bytes.slice(i * 4096, math.min(a.bytes.length, i * 4096 + 256))
          DecodedFrame(a.asset_id, i, w, ht, px)
        }
      }
  }

  /** REAL pure-JVM codecs — no native library needed for any of these:
    *  - [[RealCodecs.PcmWav]]: RIFF/WAVE PCM — audio decodes to
    *    fixed-size sample windows (frame = one window; `width` = sample
    *    frames in the window, `height` = channels, `pixels` = the raw
    *    little-endian PCM bytes of the window).
    *  - [[RealCodecs.Bmp24]]: uncompressed 24-bit BMP (BITMAPINFOHEADER,
    *    BI_RGB) — one frame per image, `pixels` = top-down BGR with row
    *    padding stripped.
    *  - [[RealCodecs.ImageIo]]: JPEG/PNG/GIF/TIFF via the JDK's
    *    `javax.imageio` readers (pure JVM, present in the stock JDK) —
    *    one frame per image, `pixels` = top-down BGR matching [[Bmp24]]'s
    *    layout so every still-image feature step shares one contract.
    *  - [[RealCodecs.AviRgb24]]: uncompressed RGB24 AVI video (RIFF
    *    'AVI ', 'DIB ' stream) — one frame per '00db' movi chunk,
    *    `pixels` = top-down BGR like [[Bmp24]].
    *  - [[RealCodecs.ByMagic]]: routes each asset on its magic bytes and
    *    hands everything else (compressed video — H.264/VP9 decode
    *    genuinely needs native libs) to a fallback, by default
    *    [[FakeCodec]], confining the documented-stub boundary to
    *    compressed video ONLY.
    * Malformed payloads throw `IllegalArgumentException` with the asset
    * id — the caller quarantines (DLQ pattern), a silent skip would
    * corrupt token accounting. */
  object RealCodecs {

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parsed WAV essentials. `dataOffset`/`dataLen` bound the PCM bytes. */
    final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
                             dataOffset: Int, dataLen: Int) {
      def bytesPerSampleFrame: Int = channels * (bitsPerSample / 8)
      def sampleFrames: Int =
        if (bytesPerSampleFrame == 0) 0 else dataLen / bytesPerSampleFrame
      def durationMs: Long =
        if (sampleRate == 0) 0L else sampleFrames.toLong * 1000L / sampleRate
    }

    /** Strict RIFF/WAVE chunk walk (PCM format 1 only). */
    def parseWav(bytes: Array[Byte]): WavInfo = {
      require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
        s"not a RIFF/WAVE payload (${bytes.length} bytes)")
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
      var data: Option[(Int, Int)] = None // offset, len
      var o = 12
      while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(bytes, o)
        val size = u32(bytes, o + 4).toInt
        require(size >= 0 && o + 8 + size <= bytes.length,
          s"chunk '$id' overruns payload (size=$size at offset $o)")
        if (id == "fmt ") {
          require(size >= 16, s"fmt chunk too small ($size)")
          val audioFormat = u16(bytes, o + 8)
          require(audioFormat == 1, s"only PCM (format 1) supported, got $audioFormat")
          fmt = Some((u16(bytes, o + 10), u32(bytes, o + 12).toInt, u16(bytes, o + 22)))
        } else if (id == "data") data = Some((o + 8, size))
        o += 8 + size + (size & 1) // chunks pad to even
      }
      (fmt, data) match {
        case (Some((ch, rate, bits)), Some((off, len))) =>
          require(ch > 0 && rate > 0 && (bits == 8 || bits == 16 || bits == 24 || bits == 32),
            s"unsupported PCM shape: channels=$ch rate=$rate bits=$bits")
          WavInfo(ch, rate, bits, off, len)
        case _ => throw new IllegalArgumentException(
          s"WAV missing ${if (fmt.isEmpty) "fmt " else "data"} chunk")
      }
    }

    /** PCM WAV → fixed windows of `samplesPerWindow` sample frames. */
    final case class PcmWav(samplesPerWindow: Int = 1024) extends MediaCodec {
      require(samplesPerWindow > 0, s"samplesPerWindow must be positive")
      override def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame] =
        assets.flatMap { a =>
          val info =
            try parseWav(a.bytes)
            catch { case e: IllegalArgumentException =>
              throw new IllegalArgumentException(s"asset ${a.asset_id}: ${e.getMessage}")
            }
          val bpf = info.bytesPerSampleFrame
          val total = info.sampleFrames
          val nWin = math.max(1, (total + samplesPerWindow - 1) / samplesPerWindow)
          (0 until nWin).map { w =>
            val startFrame = w * samplesPerWindow
            val frames = math.max(0, math.min(samplesPerWindow, total - startFrame))
            val from = info.dataOffset + startFrame * bpf
            DecodedFrame(a.asset_id, w, frames, info.channels,
              java.util.Arrays.copyOfRange(a.bytes, from, from + frames * bpf))
          }
        }
    }

    /** Uncompressed 24-bit BMP → one frame, top-down BGR, padding
      * stripped. */
    object Bmp24 extends MediaCodec {
      override def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame] =
        assets.map { a =>
          val b = a.bytes
          def fail(msg: String) =
            throw new IllegalArgumentException(s"asset ${a.asset_id}: $msg")
          if (b.length < 54 || b(0) != 'B' || b(1) != 'M') fail("not a BMP payload")
          val dataOffset = u32(b, 10).toInt
          val dibSize = u32(b, 14).toInt
          if (dibSize < 40) fail(s"DIB header too small ($dibSize)")
          val width = u32(b, 18).toInt
          val heightRaw = u32(b, 22).toInt
          val bottomUp = heightRaw >= 0 // negative height = top-down rows
          val height = math.abs(heightRaw)
          val bpp = u16(b, 28)
          val compression = u32(b, 30)
          if (bpp != 24 || compression != 0)
            fail(s"only uncompressed 24-bit BMP supported (bpp=$bpp compression=$compression)")
          if (width <= 0 || height <= 0) fail(s"bad dimensions ${width}x$heightRaw")
          // all size math in Long: a crafted width like 178956971 overflows
          // 24*width in Int, sails past the overrun check, and breaks the
          // fail-with-asset-id contract with a raw runtime exception
          val rowSizeL = ((24L * width + 31L) / 32L) * 4L
          if (dataOffset < 54 || dataOffset.toLong + rowSizeL * height > b.length)
            fail(s"pixel data overruns payload")
          val pixelsL = width.toLong * height.toLong * 3L
          if (pixelsL > Int.MaxValue) fail(s"pixel buffer too large (${width}x$height)")
          val rowSize = rowSizeL.toInt
          val out = new Array[Byte](pixelsL.toInt)
          var y = 0
          while (y < height) {
            val srcRow = if (bottomUp) height - 1 - y else y
            System.arraycopy(b, dataOffset + srcRow * rowSize, out, y * width * 3, width * 3)
            y += 1
          }
          DecodedFrame(a.asset_id, 0, width, height, out)
        }
    }

    /** Uncompressed RGB24 AVI (RIFF 'AVI ', 'DIB ' video stream) — REAL
      * VIDEO decode in pure JVM: the container is a RIFF chunk tree like
      * WAV, and each '00db' movi chunk is a BMP-style bottom-up padded
      * BGR raster, so the strict chunk walk + the [[Bmp24]] row logic
      * decode it exactly. One [[DecodedFrame]] per stored frame in
      * storage order, `pixels` = top-down BGR — the same layout every
      * other still/video source emits, so frame features run unchanged.
      *
      * Scope (loud, not silent): only stream 0 as an uncompressed 24-bit
      * 'vids' stream is supported; '00dc' (compressed) frames throw with
      * the asset id — H.264/VP9 genuinely need native decoders and stay
      * behind the [[FakeCodec]] fallback. Non-video chunks (e.g. '01wb'
      * audio interleave) are skipped: this codec extracts the video
      * track, the audio track is [[PcmWav]]'s job upstream. */
    /** The ONE strict RIFF/AVI chunk walker both AVI codecs share:
      * validates the preamble, recurses into LISTs, bounds every chunk
      * in LONG arithmetic (a crafted size near Int.MaxValue would wrap
      * an Int sum negative and sail past the guard), skips pad bytes,
      * and hands each leaf chunk (id, payloadOffset, size) to
      * `onChunk`. */
    private def walkAvi(b: Array[Byte], fail: String => Nothing)
                       (onChunk: (String, Int, Int) => Unit): Unit = {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ")
        fail(s"not a RIFF/AVI payload (${b.length} bytes)")
      def walk(from: Int, to: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = tag(b, o)
          val size = u32(b, o + 4).toInt
          if (size < 0 || o.toLong + 8L + size > to)
            fail(s"chunk '$id' overruns payload (size=$size at offset $o)")
          if (id == "LIST") {
            if (size < 4) fail(s"LIST chunk too small ($size)")
            walk(o + 12, o + 8 + size) // subtype tag at o+8, then body
          } else onChunk(id, o + 8, size)
          o += 8 + size + (size & 1) // chunks pad to even
        }
      }
      walk(12, b.length)
    }

    object AviRgb24 extends MediaCodec {
      private final case class VidFmt(width: Int, height: Int)

      override def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame] =
        assets.flatMap { a =>
          val b = a.bytes
          def fail(msg: String): Nothing =
            throw new IllegalArgumentException(s"asset ${a.asset_id}: $msg")
          var fmt: Option[VidFmt] = None
          val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          walkAvi(b, fail) { (id, po, size) =>
            id match {
              case "strh" =>
                // the first stream header decides: only vids is decoded
                if (size < 8) fail(s"strh chunk too small ($size)")
                if (fmt.isEmpty && tag(b, po) != "vids")
                  fail(s"stream 0 is '${tag(b, po)}', not a video stream")
              case "strf" =>
                if (fmt.isEmpty) { // BITMAPINFOHEADER of the vids stream
                  if (size < 40) fail(s"strf BITMAPINFOHEADER too small ($size)")
                  val w = u32(b, po + 4).toInt
                  val hRaw = u32(b, po + 8).toInt
                  val bpp = u16(b, po + 14)
                  val compression = u32(b, po + 16)
                  if (bpp != 24 || compression != 0)
                    fail(s"only uncompressed 24-bit video supported " +
                      s"(bpp=$bpp compression=$compression)")
                  if (w <= 0 || hRaw == 0)
                    fail(s"bad dimensions ${w}x$hRaw")
                  fmt = Some(VidFmt(w, hRaw))
                }
              case "00db" =>
                frames += java.util.Arrays.copyOfRange(b, po, po + size)
              case "00dc" =>
                fail("compressed video frames ('00dc') need a native decoder")
              case _ => () // idx1, audio interleave, junk padding
            }
          }

          val VidFmt(width, hRaw) = fmt.getOrElse(
            fail("AVI missing a 'vids' strf (BITMAPINFOHEADER)"))
          val bottomUp = hRaw >= 0
          val height = math.abs(hRaw)
          val rowSizeL = ((24L * width + 31L) / 32L) * 4L
          if (width.toLong * height * 3L > Int.MaxValue)
            fail(s"pixel buffer too large (${width}x$height)")
          if (frames.isEmpty) fail("AVI contains no '00db' frames")
          frames.zipWithIndex.map { case (raw, i) =>
            if (raw.length.toLong != rowSizeL * height)
              fail(s"frame $i: ${raw.length} bytes != ${rowSizeL * height} " +
                s"for ${width}x$height RGB24")
            val rowSize = rowSizeL.toInt
            val out = new Array[Byte](width * height * 3)
            var y = 0
            while (y < height) {
              val srcRow = if (bottomUp) height - 1 - y else y
              System.arraycopy(raw, srcRow * rowSize, out, y * width * 3, width * 3)
              y += 1
            }
            DecodedFrame(a.asset_id, i, width, height, out)
          }.toSeq
        }
    }

    /** MJPEG-in-AVI — REAL COMPRESSED-video decode in pure JVM: the
      * shared RIFF walker locates the 'vids' stream whose
      * BITMAPINFOHEADER compression is the 'MJPG' fourcc, and each
      * '00dc' movi chunk is a standalone JPEG image decoded through
      * [[ImageIo]]'s JDK reader path (frame index = storage order,
      * `pixels` = top-down BGR like every other source). This retires
      * the [[FakeCodec]] stub for the one compressed-video codec that
      * needs no native library; H.264/VP9 remain behind the fallback.
      *
      * Loud-failure contract like the siblings: a non-MJPG stream,
      * '00db' (uncompressed) chunks in an MJPEG stream, or an
      * undecodable JPEG chunk throws with the asset id. */
    object AviMjpeg extends MediaCodec {
      override def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame] =
        assets.flatMap { a =>
          val b = a.bytes
          def fail(msg: String): Nothing =
            throw new IllegalArgumentException(s"asset ${a.asset_id}: $msg")
          var sawFmt = false
          val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          walkAvi(b, fail) { (id, po, size) =>
            id match {
              case "strh" =>
                if (size < 8) fail(s"strh chunk too small ($size)")
                if (!sawFmt && tag(b, po) != "vids")
                  fail(s"stream 0 is '${tag(b, po)}', not a video stream")
              case "strf" =>
                if (!sawFmt) {
                  if (size < 40) fail(s"strf BITMAPINFOHEADER too small ($size)")
                  if (tag(b, po + 16) != "MJPG")
                    fail(s"stream 0 compression is '${tag(b, po + 16)}', not MJPG")
                  sawFmt = true
                }
              case "00dc" =>
                frames += java.util.Arrays.copyOfRange(b, po, po + size)
              case "00db" =>
                fail("'00db' uncompressed frames inside an MJPEG stream")
              case _ => () // audio interleave, idx1, junk
            }
          }
          if (!sawFmt) fail("AVI missing a 'vids' strf (BITMAPINFOHEADER)")
          if (frames.isEmpty) fail("AVI contains no '00dc' frames")
          frames.zipWithIndex.map { case (jpeg, i) =>
            // each chunk is a complete JPEG: reuse the still-image
            // reader end to end, re-index to the video frame number
            val f = ImageIo.decodeBatch(Seq(MediaAsset(a.asset_id, "jpeg", jpeg)))
              .headOption.getOrElse(fail(s"frame $i decoded to nothing"))
            DecodedFrame(a.asset_id, i, f.width, f.height, f.pixels)
          }.toSeq
        }
    }

    /** The AUDIO track of an AVI container — the demux counterpart of
      * [[AviRgb24]]: locates the first 'auds' stream, parses its
      * WAVEFORMATEX (PCM format 1 only), concatenates that stream's
      * 'NNwb' movi chunks in storage order, and windows the PCM exactly
      * like [[PcmWav]] (frame = one window, `width` = sample frames,
      * `height` = channels, `pixels` = raw little-endian PCM bytes), so
      * [[pcmWindowStats16]] and every audio feature step run unchanged
      * on either source. An AVI without an audio stream throws with the
      * asset id — silently emitting nothing would corrupt accounting. */
    final case class AviPcmAudio(samplesPerWindow: Int = 1024) extends MediaCodec {
      require(samplesPerWindow > 0, "samplesPerWindow must be positive")
      override def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame] =
        assets.flatMap { a =>
          val b = a.bytes
          def fail(msg: String): Nothing =
            throw new IllegalArgumentException(s"asset ${a.asset_id}: $msg")
          var streamIdx = -1 // ordinal of the NEXT strh
          var audioIdx = -1 // stream index of the first auds stream
          var lastWasAuds = false
          var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
          val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          def audioChunkId = f"$audioIdx%02dwb"

          walkAvi(b, fail) { (id, po, size) =>
            id match {
              case "strh" =>
                if (size < 8) fail(s"strh chunk too small ($size)")
                streamIdx += 1
                lastWasAuds = tag(b, po) == "auds"
                if (lastWasAuds && audioIdx < 0) audioIdx = streamIdx
              case "strf" =>
                if (lastWasAuds && fmt.isEmpty) { // WAVEFORMATEX
                  if (size < 16) fail(s"auds strf too small ($size)")
                  val formatTag = u16(b, po)
                  if (formatTag != 1)
                    fail(s"only PCM audio (format 1) supported, got $formatTag")
                  fmt = Some((u16(b, po + 2), u32(b, po + 4).toInt, u16(b, po + 14)))
                }
              case other if audioIdx >= 0 && other == audioChunkId =>
                chunks += java.util.Arrays.copyOfRange(b, po, po + size)
              case _ => ()
            }
          }

          val (channels, rate, bits) = fmt.getOrElse(
            fail("AVI contains no PCM 'auds' stream"))
          if (channels <= 0 || rate <= 0 ||
            !(bits == 8 || bits == 16 || bits == 24 || bits == 32))
            fail(s"unsupported PCM shape: channels=$channels rate=$rate bits=$bits")
          val pcm = Array.concat(chunks.toSeq: _*)
          val bpf = channels * (bits / 8)
          // a ragged tail (truncated final chunk cutting mid-sample) must
          // not be silently discarded — same loud-failure contract as
          // every other malformed shape
          if (pcm.length % bpf != 0)
            fail(s"audio stream length ${pcm.length} is not a multiple of " +
              s"the $bpf-byte sample frame (truncated final chunk?)")
          val total = pcm.length / bpf
          val nWin = math.max(1, (total + samplesPerWindow - 1) / samplesPerWindow)
          (0 until nWin).map { w =>
            val startFrame = w * samplesPerWindow
            val frames = math.max(0, math.min(samplesPerWindow, total - startFrame))
            DecodedFrame(a.asset_id, w, frames, channels,
              java.util.Arrays.copyOfRange(pcm, startFrame * bpf,
                startFrame * bpf + frames * bpf))
          }
        }
    }

    /** Compressed still images (JPEG/PNG/GIF/TIFF) through the JDK's
      * `javax.imageio` readers — REAL decompression, pure JVM, no native
      * libraries (the readers ship with the stock JDK). One
      * [[DecodedFrame]] PER STORED FRAME: single-frame formats emit frame
      * 0 only; an animated GIF emits every frame (`getNumImages` + a
      * per-frame read), indexed in storage order and decoded AS STORED —
      * delta frames are not composited against prior frames (frame
      * sampling / per-frame stats want raw frames; an animation
      * compositor would sit above this codec). `pixels` = top-down BGR
      * (3 bytes/pixel, alpha dropped), the same layout [[Bmp24]] emits,
      * so [[bmpColorStats]] and any other still-image feature step run
      * unchanged on either source.
      *
      * JDK limitation, guarded loudly: this JDK's GIFImageReader returns
      * CORRUPT pixel rows for GIF frames with height 2..4 (verified
      * against an independent LZW decode of the same bytes — the reader,
      * not the data; height 1 and height ≥ 5 round-trip exactly). Such
      * frames throw `IllegalArgumentException` like any undecodable
      * payload — the caller quarantines; silently wrong pixels would
      * poison every downstream feature. */
    object ImageIo extends MediaCodec {
      private def toBgr(img: java.awt.image.BufferedImage,
                        fail: String => Nothing): Array[Byte] = {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
        if (w.toLong * h * 3L > Int.MaxValue) fail(s"pixel buffer too large (${w}x$h)")
        val out = new Array[Byte](w * h * 3)
        val row = new Array[Int](w) // getRGB row-wise bounds temp memory
        var y = 0
        var o = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x) // packed ARGB
            out(o) = (p & 0xFF).toByte
            out(o + 1) = ((p >> 8) & 0xFF).toByte
            out(o + 2) = ((p >> 16) & 0xFF).toByte
            x += 1
            o += 3
          }
          y += 1
        }
        out
      }

      override def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame] =
        assets.flatMap { a =>
          def fail(msg: String): Nothing =
            throw new IllegalArgumentException(s"asset ${a.asset_id}: $msg")
          // MemoryCacheImageInputStream, NOT a file-cache stream: the
          // default disk-backed cache means one temp-file
          // create/write/delete per asset in the executor hot path, and a
          // hard failure on a full/unwritable tmpdir
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(a.bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) fail("no ImageIO reader recognizes this payload")
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val n =
              try reader.getNumImages(true) // allowSearch: count ALL frames
              catch {
                case e: java.io.IOException => fail(s"frame count failed: ${e.getMessage}")
                case e: RuntimeException => fail(s"frame count failed: ${e.getMessage}")
              }
            if (n <= 0) fail("payload contains no frames")
            (0 until n).map { i =>
              val img =
                try reader.read(i)
                catch {
                  case e: java.io.IOException => fail(s"frame $i decode failed: ${e.getMessage}")
                  case e: RuntimeException => fail(s"frame $i decode failed: ${e.getMessage}")
                }
              if (img == null) fail(s"frame $i decoded to nothing")
              if (reader.getFormatName.equalsIgnoreCase("gif") &&
                  img.getHeight >= 2 && img.getHeight <= 4)
                fail(s"frame $i: this JDK's GIF reader corrupts heights 2..4 " +
                  s"(got ${img.getWidth}x${img.getHeight}) — re-encode or pad")
              DecodedFrame(a.asset_id, i, img.getWidth, img.getHeight,
                toBgr(img, fail))
            }
          } finally {
            reader.dispose()
            try iis.close() catch { case _: java.io.IOException => () }
          }
        }
    }

    /** Compression fourcc of an AVI's first video stream ("DIB " / ""
      * for uncompressed, "MJPG", "H264", …) — a header-only walk for
      * [[ByMagic]] routing; malformed containers yield None and fall to
      * whichever codec will produce the loud error. */
    private def aviVideoCompression(b: Array[Byte]): Option[String] = {
      var lastStrhVids = false
      var comp: Option[String] = None
      try walkAvi(b, msg => throw new IllegalArgumentException(msg)) { (id, po, size) =>
        id match {
          case "strh" if comp.isEmpty && size >= 8 =>
            lastStrhVids = tag(b, po) == "vids"
          case "strf" if comp.isEmpty && lastStrhVids && size >= 40 =>
            comp = Some(tag(b, po + 16))
          case _ => ()
        }
      } catch { case _: IllegalArgumentException => () }
      comp
    }

    /** Magic-byte dispatch: WAV, BMP, JPEG, PNG, GIF, TIFF, uncompressed
      * AVI, and MJPEG AVI (sniffed from the stream's compression fourcc)
      * decode for real; only unrecognized payloads (compressed video —
      * H.264/VP9 need native libs) go to `fallback`. */
    final case class ByMagic(fallback: MediaCodec = FakeCodec,
                             samplesPerWindow: Int = 1024) extends MediaCodec {
      private val wav = PcmWav(samplesPerWindow)
      override def decodeBatch(assets: Seq[MediaAsset]): Seq[DecodedFrame] = {
        def isWav(b: Array[Byte]) =
          b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"
        def isAvi(b: Array[Byte]) =
          b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI "
        def isBmp(b: Array[Byte]) = b.length >= 2 && b(0) == 'B' && b(1) == 'M'
        def isJpeg(b: Array[Byte]) =
          b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8
        def isPng(b: Array[Byte]) =
          b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
        def isGif(b: Array[Byte]) =
          b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
        def isTiff(b: Array[Byte]) =
          b.length >= 4 && ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
            (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))
        assets.flatMap {
          case a if isWav(a.bytes) => wav.decodeBatch(Seq(a))
          case a if isAvi(a.bytes) =>
            if (aviVideoCompression(a.bytes).contains("MJPG"))
              AviMjpeg.decodeBatch(Seq(a))
            else AviRgb24.decodeBatch(Seq(a))
          case a if isBmp(a.bytes) => Bmp24.decodeBatch(Seq(a))
          case a if isJpeg(a.bytes) || isPng(a.bytes) || isGif(a.bytes) || isTiff(a.bytes) =>
            ImageIo.decodeBatch(Seq(a))
          case a => fallback.decodeBatch(Seq(a))
        }
      }
    }
  }

  /** Decode pass: typed mapPartitions with explicit batching (the
    * `mapInPandas` batch contract — the codec sees `batchSize` assets per
    * call). Input df needs (asset_id, kind, bytes). */
  def decodePartitions(df: DataFrame, codec: MediaCodec,
                       batchSize: Int = 64): Dataset[DecodedFrame] = {
    implicit val assetEnc = Encoders.product[MediaAsset]
    implicit val frameEnc = Encoders.product[DecodedFrame]
    df.select(col("asset_id").cast("long"), col("kind").cast("string"),
        col("bytes").cast("binary"))
      .as[MediaAsset]
      .mapPartitions(it => it.grouped(batchSize).flatMap(b => codec.decodeBatch(b.toSeq)))
  }

  /** Per-window PCM statistics over [[RealCodecs.PcmWav]] output
    * (16-bit LE samples): exact integer sum-of-squares and peak per
    * channel, RMS reported as an integer-scaled q3 value
    * (floor(rms·10³ + 0.5)) so results are bit-stable however the frames
    * are partitioned — the real audio-feature step (silence/clipping
    * gates, loudness normalization) that runs after decode.
    *
    * @return (asset_id, frame_idx, channel, n_samples, peak_abs, rms_q3) */
  final case class PcmWindowStats(asset_id: Long, frame_idx: Int, channel: Int,
                                  n_samples: Long, peak_abs: Int, rms_q3: Long)

  def pcmWindowStats16(frames: Dataset[DecodedFrame]): Dataset[PcmWindowStats] = {
    implicit val enc = Encoders.product[PcmWindowStats]
    frames.flatMap { f =>
      val channels = f.height
      val n = f.width // sample frames in this window
      // PcmWav permits 8/24/32-bit PCM too; reading those 2 bytes at a
      // time would yield in-bounds but wrong stats — fail loudly instead
      require(f.pixels.length == n * channels * 2,
        s"asset ${f.asset_id} frame ${f.frame_idx}: expected 16-bit PCM " +
          s"(${n * channels * 2} bytes for $n frames x $channels ch), got ${f.pixels.length}")
      (0 until channels).map { c =>
        var ssq = 0L
        var peak = 0
        var i = 0
        while (i < n) {
          val o = (i * channels + c) * 2
          val s = ((f.pixels(o) & 0xFF) | (f.pixels(o + 1) << 8)).toShort.toInt
          ssq += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 1
        }
        val rms = if (n == 0) 0.0 else math.sqrt(ssq.toDouble / n)
        PcmWindowStats(f.asset_id, f.frame_idx, c, n.toLong, peak,
          math.floor(rms * 1e3 + 0.5).toLong)
      }
    }
  }

  /** Per-image color statistics over [[RealCodecs.Bmp24]] output: exact
    * integer channel sums → integer-scaled q3 means (BGR order, matching
    * the decoded layout) — the brightness/tint feature step after image
    * decode. @return (asset_id, mean_b_q3, mean_g_q3, mean_r_q3) */
  final case class BmpColorStats(asset_id: Long, mean_b_q3: Long,
                                 mean_g_q3: Long, mean_r_q3: Long)

  def bmpColorStats(frames: Dataset[DecodedFrame]): Dataset[BmpColorStats] = {
    implicit val enc = Encoders.product[BmpColorStats]
    frames.map { f =>
      val n = f.width.toLong * f.height
      val sums = new Array[Long](3)
      var i = 0
      while (i < f.pixels.length) {
        sums(i % 3) += f.pixels(i) & 0xFF
        i += 1
      }
      def q3(s: Long): Long =
        if (n == 0) 0L else math.floor(s.toDouble / n * 1e3 + 0.5).toLong
      BmpColorStats(f.asset_id, q3(sums(0)), q3(sums(1)), q3(sums(2)))
    }
  }

  /** 64-bit difference hash (dHash — the classic perceptual image
    * fingerprint for near-duplicate detection): grayscale via the BT.601
    * integer weights (r·299 + g·587 + b·114)/1000, area-average
    * downsample onto a 9×8 grid with the integer mapping
    * cx = x·9/w, cy = y·8/h (floor division end to end — no float
    * resampling, so the DuckDB oracle replays the hash bit for bit),
    * one bit per horizontally-adjacent cell pair (right > left), rows
    * top-down, assembled MSB-first: bit (row i, comparison j) lands at
    * position 63 − (i·8 + j). Images smaller than the grid leave empty
    * cells averaging 0. A constant brightness shift leaves the hash
    * unchanged (differences are invariant) — the property that makes
    * dHash robust where raw pixel hashing is useless. */
  final case class FrameHash(asset_id: Long, frame_idx: Int, dhash: Long)

  def dHash64(frames: Dataset[DecodedFrame]): Dataset[FrameHash] = {
    implicit val enc = Encoders.product[FrameHash]
    frames.map { f =>
      val gw = 9; val gh = 8
      val sum = new Array[Long](gh * gw)
      val cnt = new Array[Long](gh * gw)
      var y = 0
      while (y < f.height) {
        val cy = y * gh / f.height
        var x = 0
        while (x < f.width) {
          val cx = x * gw / f.width
          val o = (y * f.width + x) * 3
          val b = f.pixels(o) & 0xFF
          val g = f.pixels(o + 1) & 0xFF
          val r = f.pixels(o + 2) & 0xFF
          sum(cy * gw + cx) += (r * 299 + g * 587 + b * 114) / 1000
          cnt(cy * gw + cx) += 1
          x += 1
        }
        y += 1
      }
      def avg(i: Int, j: Int): Long = {
        val k = i * gw + j
        if (cnt(k) == 0) 0L else sum(k) / cnt(k)
      }
      var h = 0L
      var i = 0
      while (i < gh) {
        var j = 0
        while (j < gw - 1) {
          h = (h << 1) | (if (avg(i, j + 1) > avg(i, j)) 1L else 0L)
          j += 1
        }
        i += 1
      }
      FrameHash(f.asset_id, f.frame_idx, h)
    }
  }

  /** 64-bit AUDIO fingerprint — the energy-delta analog of [[dHash64]]:
    * per decoded PCM window, the exact integer energy Σs² of one
    * channel; per asset, one bit per consecutive window pair
    * (next > current), MSB-first over the first 64 comparisons (shorter
    * clips leave low bits 0). A uniform GAIN change rescales every
    * window's energy by the same factor, so the comparisons — and the
    * fingerprint — are invariant, the property that makes it a
    * loudness-robust near-dup key. Integer end to end; the DuckDB
    * oracle replays it exactly. Returns (asset_id, fp). */
  final case class WindowEnergy(asset_id: Long, frame_idx: Int, energy: Long)

  def audioFingerprint64(frames: Dataset[DecodedFrame], channel: Int = 0): DataFrame = {
    implicit val enc = Encoders.product[WindowEnergy]
    val en = frames.map { f =>
      val channels = f.height
      val n = f.width
      require(f.pixels.length == n * channels * 2,
        s"asset ${f.asset_id} frame ${f.frame_idx}: expected 16-bit PCM")
      require(channel < channels,
        s"asset ${f.asset_id}: channel $channel of $channels")
      var ssq = 0L
      var i = 0
      while (i < n) {
        val o = (i * channels + channel) * 2
        val s = ((f.pixels(o) & 0xFF) | (f.pixels(o + 1) << 8)).toShort.toLong
        ssq += s * s
        i += 1
      }
      WindowEnergy(f.asset_id, f.frame_idx, ssq)
    }.toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("asset_id").orderBy("frame_idx")
    en.withColumn("nxt", lead(col("energy"), 1).over(w))
      .withColumn("idx", row_number().over(w) - 1)
      // no pre-aggregation filter: a single-window asset has zero
      // comparisons but must still emit its documented fp = 0 row — a
      // where() here silently dropped such assets from the output
      .groupBy("asset_id")
      // sum of disjoint bit contributions IS the two's-complement long —
      // intermediates stay in range by construction (distinct powers)
      .agg(sum(when(col("nxt").isNotNull && col("idx") < 64 &&
        col("nxt") > col("energy"),
        expr("shiftleft(1L, 63 - idx)")).otherwise(lit(0L))).as("fp"))
  }

  /** [[bmpColorStats]] keeping the frame index — the per-frame feature
    * step for MULTI-frame sources (animated GIF via
    * [[RealCodecs.ImageIo]], video via an injected codec).
    * @return (asset_id, frame_idx, mean_b_q3, mean_g_q3, mean_r_q3) */
  final case class FrameColorStats(asset_id: Long, frame_idx: Int,
                                   mean_b_q3: Long, mean_g_q3: Long, mean_r_q3: Long)

  def frameColorStats(frames: Dataset[DecodedFrame]): Dataset[FrameColorStats] = {
    implicit val enc = Encoders.product[FrameColorStats]
    frames.map { f =>
      val n = f.width.toLong * f.height
      val sums = new Array[Long](3)
      var i = 0
      while (i < f.pixels.length) {
        sums(i % 3) += f.pixels(i) & 0xFF
        i += 1
      }
      def q3(s: Long): Long =
        if (n == 0) 0L else math.floor(s.toDouble / n * 1e3 + 0.5).toLong
      FrameColorStats(f.asset_id, f.frame_idx, q3(sums(0)), q3(sums(1)), q3(sums(2)))
    }
  }

  /** Scene-cut detection over per-frame statistics (keyframe selection
    * for video training pipelines: sample one frame per SCENE instead of
    * per fixed stride). A cut lands at frame f when the L1 distance
    * between consecutive frames' channel statistics reaches `threshold`
    * — the classic color-histogram shot-boundary heuristic, over
    * whatever per-frame reduction the decode stage produced (channel
    * means here; histograms would slot in the same way).
    *
    * Emits one row per non-first frame: (id, frame, dist, is_cut).
    * Callers feed BUCKETED integer stats (e.g. the 16-level channel
    * buckets the MJPEG gate uses) so lossy-codec noise below the bucket
    * width cannot flip a cut decision.
    *
    * Plan shape: one window partitioned by asset ordered by frame —
    * per-asset state is one lag row, shuffles carry (id, frame, k longs)
    * only; the pixel payloads never leave the decode stage. */
  def sceneCuts(stats: DataFrame, idCol: String, frameCol: String,
                channelCols: Seq[String], threshold: Long): DataFrame = {
    require(channelCols.nonEmpty, "need at least one channel column")
    require(threshold >= 1L, s"threshold must be >= 1, got $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(frameCol))
    val dist = channelCols.map(c =>
      abs(col(c).cast("long") - lag(col(c).cast("long"), 1).over(w)))
      .reduce(_ + _)
    // drop ONLY each asset's first frame (no lag row exists for it) via
    // row_number, never via `dist IS NOT NULL`: a NULL channel stat
    // mid-asset also NULLs the distance, and filtering on dist would
    // silently hide that frame's boundary AND shift the next comparison
    // across it — an unexpected NULL stat must fail loudly instead
    stats.withColumn("dist", dist)
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") > 1)
      .select(col(idCol), col(frameCol),
        when(col("dist").isNull, org.apache.spark.sql.functions.raise_error(
          concat(lit("sceneCuts: NULL channel stat at ("),
            col(idCol).cast("string"), lit(", "), col(frameCol).cast("string"),
            lit(") — stats must be non-null"))).cast("long"))
          .otherwise(col("dist")).as("dist"),
        (col("dist") >= threshold).as("is_cut"))
  }

  /** REAL PNG header metadata WITHOUT decoding a pixel: width/height are
    * the big-endian u32s at the fixed IHDR offsets (bytes 17–20 / 21–24
    * after the 8-byte signature + IHDR length/tag), parsed as pure
    * Column expressions — substring on the binary column, hex, base-16
    * conv. Non-PNG payloads (signature mismatch) yield NULLs, never
    * garbage dims.
    *
    * The 100 TB point: metadata extraction over a billion images must
    * not decode pixels — this runs in the scan stage's codegen span with
    * zero shuffle and touches 24 header bytes of each BLOB, where the
    * mapPartitions codec path exists for jobs that genuinely need the
    * pixels. */
  def pngDims(bytes: Column): (Column, Column) = {
    def u32(pos: Int): Column =
      conv(hex(substring(bytes, pos, 4)), 16, 10).cast("long")
    val isPng = hex(substring(bytes, 1, 8)) === "89504E470D0A1A0A"
    (when(isPng, u32(17)).otherwise(lit(null).cast("long")),
     when(isPng, u32(21)).otherwise(lit(null).cast("long")))
  }

  /** Deterministic fake "decode header" as pure columns (oracle-able):
    * md5-derived width/height/channels — the stand-in for reading a real
    * image header, exercised end-to-end by the driver gate. */
  def fakeMeta(bytes: Column): (Column, Column, Column) = {
    val hx = md5(bytes) // hex digest of the payload
    (lit(64) + Hashing.h64(hx, "w") % 576,
     lit(64) + Hashing.h64(hx, "h") % 416,
     lit(1) + Hashing.h64(hx, "c") % 3)
  }

  /** Feature hashing: dims md5-derived doubles in [0, 1) — the
    * deterministic stand-in for an embedding model, with the exact
    * Spark-side shape (one array column per asset). */
  def hashFeatures(bytes: Column, dims: Int): Column = {
    val hx = md5(bytes)
    array((0 until dims).map { i =>
      (Hashing.h64(hx, s"feat:$i") % 1000000L).cast("double") / 1000000.0
    }: _*)
  }

  /** Frame sampling over a payload column: one row per `frameBytes`-sized
    * chunk, keeping every `stride`-th frame. Payloads here are
    * UTF8-safe test stand-ins, so chunking is character-based; a real
    * container format would chunk on key-frame boundaries in the codec. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val n = greatest(ceil(length(col(payloadCol)).cast("double") / frameBytes).cast("long"), lit(1L))
    df.select(col(idCol).as("asset_id"), col(payloadCol).as("p"), n.as("n"))
      .select(col("asset_id"), col("p"),
        explode(sequence(lit(0L), col("n") - 1L)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("asset_id"), col("frame_idx"),
        md5(substring_index_chunk(col("p"), col("frame_idx"), frameBytes)).as("frame_hash"))
  }

  private def substring_index_chunk(p: Column, idx: Column, width: Int): Column =
    substring(p, (idx * width + 1).cast("int"), lit(width))
}
