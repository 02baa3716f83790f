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
  *     The codec itself is injectable: [[FakeCodec]] is a deterministic
  *     stand-in (this container ships no image/audio libraries — STUB);
  *     swapping in a JNI/JavaCV decoder changes no plumbing.
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

  /** STUB codec — deterministic fake standing in for a real image/audio
    * decoder (not available in this environment). Emits one "frame" per
    * 4 KiB of payload with md5-derived dimensions and a pixel buffer
    * sampled from the payload bytes; fully reproducible for tests. */
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
