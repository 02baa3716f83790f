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
}
