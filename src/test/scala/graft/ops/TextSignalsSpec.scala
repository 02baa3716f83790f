package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.PortableMath

/** Invariant checks for the entropy / TF-IDF-keyword text signals and the
  * lambda-side portable-ln Column twin they are built on.
  */
class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  // -- lnWideCol: the Column twin must be BIT-identical to lnWide ---------

  test("lnWideCol ≡ lnWide bit-for-bit across the wide domain, incl. past 2^53") {
    val xs = Seq(1L, 2L, 3L, 7L, 100L, 4096L, 65535L, (1L << 32) - 1, 1L << 32,
      (1L << 53) - 1, (1L << 53) + 1, (1L << 53) + 12345L, (1L << 62) - 7, 1L << 62)
    val got = xs.toDF("x")
      .select(col("x"), PortableMath.lnWideCol(col("x")).as("ln"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    xs.foreach { x =>
      assert(java.lang.Double.doubleToLongBits(got(x)) ===
        java.lang.Double.doubleToLongBits(PortableMath.lnWide(x)),
        s"lnWideCol($x) drifted from the Scala twin")
    }
  }

  // -- tokenEntropy -------------------------------------------------------

  private def qq(x: Long): Long =
    math.floor(PortableMath.lnWide(x) * 1.0e9 + 0.5).toLong

  /** Scala reference of the entropy contract for a token list. */
  private def refEntropy(toks: Seq[String]): (Long, Long, Long) = {
    val n = toks.size.toLong
    val counts = toks.groupBy(identity).map(_._2.size.toLong)
    val s = counts.map(c => c * qq(c)).sum
    (n, counts.size.toLong, n * qq(math.max(n, 1L)) - s)
  }

  private lazy val entDocs = Seq(
    (1L, "a a a a"),                       // single type: entropy exactly 0
    (2L, "a b c d"),                       // uniform distinct: n ln n scaled
    (3L, "the the cat sat on the mat"),    // skewed mix
    (4L, ""),                              // empty: all-zero row survives
    (5L, "Mixed CASE mixed case MIXED")    // lowercasing folds types
  ).toDF("doc_id", "text")

  test("tokenEntropy matches the exact-integer Scala reference per doc") {
    val got = TextAnalysis.tokenEntropy(entDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val texts = Map(1L -> "a a a a", 2L -> "a b c d",
      3L -> "the the cat sat on the mat", 4L -> "", 5L -> "Mixed CASE mixed case MIXED")
    texts.foreach { case (id, t) =>
      val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      assert(got(id) === refEntropy(toks), s"doc $id")
    }
    assert(got(1L)._3 === 0L, "single-type doc must score exactly 0")
    assert(got(4L) === ((0L, 0L, 0L)), "empty doc is (0, 0, 0)")
    assert(got(5L)._2 === 2L, "case folds before counting types")
    // uniform distinct beats the skewed doc per token: H=ln n is maximal
    assert(got(2L)._3 > got(1L)._3)
  }

  test("tokenEntropy is partitioning-independent") {
    val a = TextAnalysis.tokenEntropy(entDocs.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val b = TextAnalysis.tokenEntropy(entDocs.repartition(7, col("doc_id")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(a === b)
  }

  // -- tfidfKeywords ------------------------------------------------------

  private lazy val kwDocs = Seq(
    (1L, "common common rare1 rare1 rare1"),
    (2L, "common rare2"),
    (3L, "common rare3 rare3"),
    (4L, "common common common")
  ).toDF("doc_id", "text")

  /** Scala reference: tf · floor((lnWide(N) − lnWide(df))·1e9 + ½). */
  private def refKeywords(docs: Map[Long, Seq[String]], k: Int): Seq[(Long, Long, String, Long)] = {
    val n = docs.size.toLong
    val df = docs.values.flatMap(_.distinct).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    def idfQ(t: String): Long =
      math.floor((PortableMath.lnWide(n) - PortableMath.lnWide(df(t))) * 1.0e9 + 0.5).toLong
    docs.toSeq.flatMap { case (id, toks) =>
      toks.groupBy(identity).toSeq
        .map { case (t, o) => (t, o.size.toLong * idfQ(t)) }
        .sortBy { case (t, s) => (-s, t) }
        .take(k).zipWithIndex
        .map { case ((t, s), i) => (id, (i + 1).toLong, t, s) }
    }.sortBy(r => (r._1, r._2))
  }

  test("tfidfKeywords matches the Scala reference, rare terms outrank common") {
    val docs = Map(
      1L -> Seq("common", "common", "rare1", "rare1", "rare1"),
      2L -> Seq("common", "rare2"),
      3L -> Seq("common", "rare3", "rare3"),
      4L -> Seq("common", "common", "common"))
    val got = TextAnalysis.tfidfKeywords(kwDocs, "doc_id", "text", k = 2)
      .orderBy(col("doc_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === refKeywords(docs, 2))
    // the doc-unique term wins rank 1 wherever one exists
    assert(got.filter(r => r._1 == 1L && r._2 == 1L).head._3 === "rare1")
    assert(got.filter(r => r._1 == 2L && r._2 == 1L).head._3 === "rare2")
    // a doc with only the everywhere-term still emits it (idf_q = 0 score)
    val d4 = got.filter(_._1 == 4L)
    assert(d4.map(_._3) === Seq("common") && d4.head._4 === 0L)
  }

  test("tfidfKeywords: ties break on the term total order; k bounds output") {
    // two terms with identical tf and df in one doc → rank by term asc
    val tie = Seq((1L, "zz aa zz aa"), (2L, "zz aa")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywords(tie, "doc_id", "text", k = 1)
      .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got === Array((1L, "aa"), (2L, "aa")))
    val counts = TextAnalysis.tfidfKeywords(kwDocs, "doc_id", "text", k = 1)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ === 1L))
  }

  test("decodeBpeIds inverts the encode kernel; OOV renders <unk>") {
    val counts = Seq(("hello", 5L), ("world", 3L), ("held", 2L))
    val merges = TextAnalysis.trainBpeFromCounts(counts, 12)
    val vocab = TextAnalysis.bpeVocab(counts, merges)
    val docs = Seq(
      (1L, "hello world"), (2L, "held hello hello"),
      (3L, "woZld"), // 'Z' is outside the training alphabet → OOV
      (4L, "")).toDF("doc_id", "text")
    val ids = docs.select(col("doc_id"),
      graft.functions.BpeEncodeIds.of(TextAnalysis.tokens(col("text")), merges, vocab).as("ids"))
    val got = TextAnalysis.decodeBpeIds(ids, "doc_id", "ids", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("hello world", 0L)))
    assert(got(2L) === (("held hello hello", 0L)))
    assert(got(3L)._2 >= 1L && got(3L)._1.contains("<unk>"))
    assert(got(4L) === (("", 0L)))
  }

  test("sentenceChunks: boundary split, overlap, ragged tail, empty-doc drop") {
    val docs = Seq(
      (1L, "One. Two! Three? Four. Five."),   // 5 sentences
      (2L, "No terminator here at all"),       // 1 sentence
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.sentenceChunks(docs, "doc_id", "text",
        chunkSentences = 2, stride = 1)
      .orderBy("id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = got.filter(_._1 == 1L)
    // 5 sentences, size 2, stride 1 → ceil((5-2)/1)+1 = 4 chunks
    assert(d1.length === 4)
    assert(d1(0)._4 === "One. Two!")
    assert(d1(1)._4 === "Two! Three?", "stride-1 chunks must overlap by one sentence")
    assert(d1(3)._4 === "Four. Five." && d1(3)._3 === 2L)
    assert(got.filter(_._1 == 2L).map(_._4).toSeq === Seq("No terminator here at all"))
    assert(!got.exists(_._1 == 3L), "empty docs emit nothing")
  }

  test("tfidfKeywords is partitioning-independent") {
    val a = TextAnalysis.tfidfKeywords(kwDocs.repartition(1), "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val b = TextAnalysis.tfidfKeywords(kwDocs.repartition(5, col("text")), "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(a === b)
  }

  test("tokenSkipGrams: hand-counted windowed pairs, directional, edge-clamped") {
    // doc "a b c b": window 2 contexts per position —
    //   p1 a: b(2) c(3)          p2 b: a(1) c(3) b(4)
    //   p3 c: a(1) b(2) b(4)     p4 b: b(2) c(3)
    val docs = Seq((1L, "a b c b"), (2L, "x"), (3L, "  ")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenSkipGrams(docs, "text", window = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(
      ("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "a") -> 1L, ("b", "c") -> 2L, ("b", "b") -> 2L,
      ("c", "a") -> 1L, ("c", "b") -> 2L),
      s"got $got")
    // single-token and empty docs emit nothing (no pairs exist)
    assert(!got.keys.exists(p => p._1 == "x" || p._2 == "x"))
    // the total is Σ per-position in-window neighbors = 10
    assert(got.values.sum === 10L)
  }
}
