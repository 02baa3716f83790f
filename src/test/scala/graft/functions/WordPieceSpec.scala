package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the WordPiece family: greedy longest-match-first encoding with
  * `##` continuations, whole-word [UNK] semantics (stuck position or
  * over-length word), and the likelihood-scored trainer (exact integer
  * argmax with deterministic ties). */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def enc(word: String, vocab: Seq[String], maxLen: Int = 20): Seq[String] = {
    import scala.jdk.CollectionConverters._
    WordPieceKernel.encodeWord(word,
      new WordPieceKernel.Vocab(vocab, maxLen)).asScala.toSeq
  }

  test("encodeWord is greedy longest-match-first with ## continuations") {
    val v = Seq("a", "ab", "abc", "##b", "##c", "##bc", "##bcd")
    assert(enc("abc", v) === Seq("abc"), "whole-word piece wins outright")
    assert(enc("abbc", v) === Seq("ab", "##bc"),
      "longest start piece, then longest continuation")
    assert(enc("abcbcd", v) === Seq("abc", "##bcd"))
    assert(enc("ab", v) === Seq("ab"))
    assert(enc("abb", v) === Seq("ab", "##b"))
    // greedy is NOT optimal-by-count — it never backtracks: "abcb" takes
    // "abc" first and then strands "b"... which ##b rescues here; force
    // a strand with a vocab where the greedy prefix consumes the only
    // continuation anchor
    val v2 = Seq("ab", "a", "##bc")
    assert(enc("abc", v2) === Seq("[UNK]"),
      "greedy takes 'ab', strands 'c' — whole word is [UNK], no backtracking")
  }

  test("whole-word [UNK]: unknown start, stuck middle, over-length, empty") {
    val v = Seq("a", "##b")
    assert(enc("xa", v) === Seq("[UNK]"), "no start piece matches")
    assert(enc("abx", v) === Seq("[UNK]"), "stuck mid-word kills the whole word")
    assert(enc("ab", v, maxLen = 1) === Seq("[UNK]"),
      "the max_input_chars_per_word guard")
    assert(enc("", v) === Seq("[UNK]"))
  }

  test("trainer maximizes count(ab)/(count(a)count(b)) with deterministic ties") {
    // counts: ab→10, cb→10. Symbols: a:10, c:10, ##b:20.
    // score(a,##b) = 10/(10·20) = score(c,##b) — exact tie; lexicographic
    // pair order must pick (a,##b) first.
    val v1 = graft.ops.TextAnalysis.trainWordPieceFromCounts(
      Seq("ab" -> 10L, "cb" -> 10L), 1)
    assert(v1.contains("ab") && !v1.contains("cb"),
      s"tie must break lexicographically, got $v1")
    // likelihood beats raw frequency: pair (x,##y) appears 12 times but
    // its symbols are everywhere (x:24, ##y:24); (q,##z) appears 8 times
    // from rare symbols (q:8, ##z:8). 12/(24·24)=0.0208 < 8/(8·8)=0.125
    // — WordPiece merges qz first where BPE would merge xy.
    val v2 = graft.ops.TextAnalysis.trainWordPieceFromCounts(
      Seq("xy" -> 12L, "xw" -> 12L, "vy" -> 12L, "qz" -> 8L), 1)
    assert(v2.contains("qz") && !v2.contains("xy"),
      s"likelihood objective must prefer the rare-symbol pair, got $v2")
    // merged pieces keep the left symbol's continuation marker
    val v3 = graft.ops.TextAnalysis.trainWordPieceFromCounts(Seq("abc" -> 5L), 2)
    assert(v3.exists(_.startsWith("##")), s"continuation merge expected in $v3")
  }

  test("decode inverts encode for in-vocab text; UNK words surface as [UNK]") {
    import org.apache.spark.sql.functions.array_join
    val vocab = graft.ops.TextAnalysis.trainWordPieceFromCounts(
      Seq("spark" -> 30L, "scan" -> 20L, "sort" -> 10L, "park" -> 5L), 12)
    val docs = Seq(
      (1L, "spark scan sort park spark"), // fully in-vocab
      (2L, "sort zzz scan"),              // one UNK word
      (3L, "spark")).toDF("id", "text")
    val ids = docs.select(col("id"),
      WordPieceEncodeIds.of(graft.ops.TextAnalysis.tokens(col("text")), vocab).as("ids"))
    val dec = graft.ops.TextAnalysis.decodeWordPieceIds(ids, "id", "ids", vocab)
      .join(docs.select(col("id"),
        array_join(graft.ops.TextAnalysis.tokens(col("text")), " ").as("norm")), Seq("id"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("decoded"), r.getAs[Long]("n_unk"), r.getAs[String]("norm"))).toMap
    assert(dec(1L)._2 === 0L)
    assert(dec(1L)._1 === dec(1L)._3, "decode∘encode must be the identity in-vocab")
    assert(dec(3L)._1 === "spark" && dec(3L)._2 === 0L)
    assert(dec(2L)._2 === 1L)
    assert(dec(2L)._1 === "sort [UNK] scan")
  }

  test("WordPieceEncode rides the scan stage and matches the kernel") {
    val vocab = graft.ops.TextAnalysis.trainWordPieceFromCounts(
      Seq("spark" -> 30L, "scan" -> 20L, "sort" -> 10L), 8)
    val df = Seq((1L, "spark scan unknownword"), (2L, "sort sort"))
      .toDF("id", "text")
      .select(col("id"), WordPieceEncode.of(
        graft.ops.TextAnalysis.tokens(col("text")), vocab).as("p"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L).count(_ == "[UNK]") === 1)
    assert(got(1L).take(got(1L).length - 1).forall(_ != "[UNK]"),
      "trained words must encode without UNK")
    assert(got(2L) === WordPieceKernel.encodeWord("sort",
      new WordPieceKernel.Vocab(vocab, 20)).toArray.toSeq ++
      WordPieceKernel.encodeWord("sort",
        new WordPieceKernel.Vocab(vocab, 20)).toArray.toSeq)
  }
}
