package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.delta.{DataSkipping, DeltaTable}

/** PassageIndex: positional phrase lookup over a band-partitioned Delta
  * postings index — exact occurrence counting, positions, and the
  * open-only-the-probe's-bands pruning contract. */
class PassageIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "colorless green ideas sleep furiously"),
    (3L, "we saw the quick brown fox yesterday and the quick brown fox today"),
    (4L, "quick brown foxes are not the quick brown fox"),
    (5L, "the quick brown")).toDF("doc_id", "text")

  private def freshIndex(n: Int = 3, bands: Int = 8): DeltaTable = {
    val idx = DeltaTable.forPath(spark, tmpDir("passage-idx") + "/idx")
    PassageIndex.build(idx, docs, "doc_id", "text", shingleN = n, numBands = bands)
    idx
  }

  test("probe counts verbatim occurrences with first positions") {
    val idx = freshIndex()
    val got = PassageIndex.probe(idx, "the quick brown fox", shingleN = 3, numBands = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: at 0; doc 3: at 2 and 8; doc 4: at 5 ("the quick brown fox"
    // tail); doc 5 is too short to hold all shingles; doc 2 never matches
    assert(got.toSeq === Seq((1L, 1L, 0L), (3L, 2L, 2L), (4L, 1L, 5L)))
    // a scrambled passage matches nothing even though every shingle of
    // "quick brown fox" exists somewhere — alignment is what's tested
    assert(PassageIndex.probe(idx, "brown fox the quick", shingleN = 3,
      numBands = 8).isEmpty)
    // single-shingle probe (k = 1): every holder of the trigram
    val one = PassageIndex.probe(idx, "the quick brown", shingleN = 3, numBands = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.toSeq === Seq((1L, 1L), (3L, 2L), (4L, 1L), (5L, 1L)))
  }

  test("postings are positional (not distinct) and the probe opens only its bands") {
    val idx = freshIndex()
    // doc 3 holds "the quick brown" twice → two postings rows, two pos
    val p = PassageIndex.postings(docs, "doc_id", "text", 3, 8)
      .filter(col("doc_id") === 3L)
    val hsh = graft.functions.Hashing.planTimeH64("passage:the quick brown")
    assert(p.filter(col("hsh") === hsh).select("pos")
      .as[Long].collect().sorted.toSeq === Seq(2L, 8L))
    // band partitioning: a single-band scan touches only that band's
    // files — the probe's pruning lever
    val snapFiles = idx.snapshot.files
    val b = ((hsh % 8) + 8) % 8
    val scanned = idx.scanFiles(Seq(DataSkipping.ColPred("band", "=", b.toInt)))
    assert(scanned.nonEmpty && scanned.size < snapFiles.size)
    assert(scanned.forall(_.partitionValues("band") == b.toString))
    // the probe's actual shape: ONE IN-list scan over its bands
    val inScan = idx.scanFiles(Seq(
      DataSkipping.ColPred("band", "in", Seq(b.toInt, (b.toInt + 1) % 8))))
    assert(inScan.size < snapFiles.size)
    assert(inScan.forall(f => Set(b.toString, ((b.toInt + 1) % 8).toString)(
      f.partitionValues("band"))))
    // an empty IN prunes everything (matches no row anywhere)
    assert(idx.scanFiles(Seq(
      DataSkipping.ColPred("band", "in", Seq.empty[Any]))).isEmpty)
  }

  test("probeAll maps each passage of a probe table to its holders") {
    val idx = freshIndex()
    val passages = Seq(
      (100L, "the quick brown fox"),
      (200L, "colorless green ideas sleep"),
      (300L, "entirely absent from this corpus"),
      (400L, "xx")). // shorter than shingleN: ignored, not an error
      toDF("pid", "passage")
    val got = PassageIndex.probeAll(idx, passages, "pid", "passage",
        shingleN = 3, numBands = 8)
      .orderBy("probe_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (100L, 1L, 1L, 0L), (100L, 3L, 2L, 2L), (100L, 4L, 1L, 5L),
      (200L, 2L, 1L, 0L)))
    // an all-too-short probe set returns an empty, correctly-typed frame
    assert(PassageIndex.probeAll(idx, Seq((1L, "zz")).toDF("pid", "passage"),
      "pid", "passage", shingleN = 3, numBands = 8).isEmpty)
  }

  test("the index maintains incrementally: appended docs' postings compose") {
    val idx = DeltaTable.forPath(spark, tmpDir("passage-idx-incr") + "/idx")
    PassageIndex.build(idx, docs.filter(col("doc_id") <= 2L),
      "doc_id", "text", shingleN = 3, numBands = 8)
    // second batch appends through the same build call — Delta append,
    // no rebuild; probes see the union
    PassageIndex.build(idx, docs.filter(col("doc_id") > 2L),
      "doc_id", "text", shingleN = 3, numBands = 8)
    val got = PassageIndex.probe(idx, "the quick brown fox",
        shingleN = 3, numBands = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("probe refuses a passage shorter than the shingle width") {
    val idx = freshIndex()
    intercept[IllegalArgumentException](
      PassageIndex.probe(idx, "too short", shingleN = 3, numBands = 8))
  }
}
