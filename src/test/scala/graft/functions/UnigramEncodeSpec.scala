package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UnigramKernel contract: exact min-cost Viterbi (beats greedy where
  * they differ), the smallest-j tie rule, ▁ word marks, unk fallback —
  * pinned against hand-computed segmentations. The corpus-scale
  * replay lives in the text_unigram_encode oracle gate. */
class UnigramEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: Seq[(String, Long)] =
    ('a' to 'z').map(c => c.toString -> 2000000L) ++ Seq(
      "ab" -> 4000000L,               // exactly a+b: tie -> smallest j -> 'ab'
      "abc" -> 1000000L,
      "bc" -> 1500000L,
      "cd" -> 1500000L,
      "abcd" -> 3600000L)             // vs abc+d(3.0M) and ab+cd(5.5M)

  private def seg(word: String): Seq[String] = {
    val m = UnigramKernel.costsOf(vocab)
    import scala.jdk.CollectionConverters._
    UnigramKernel.segmentWord(word, m, 5000000L).asScala.toSeq
  }

  test("Viterbi picks the global min cost — including where greedy-longest loses") {
    // greedy longest-first takes 'abcd' (3.6M); optimal is abc+d (3.0M)
    assert(seg("abcd") === Seq("▁abc", "d"))
    assert(seg("abc") === Seq("▁abc"))
    // a+bc (2.0+1.5) beats ab+c (4.0+2.0) and abc applies only to prefix
    assert(seg("abcbc") === Seq("▁abc", "bc"))
  }

  test("cost ties resolve to the smallest split point (longest last piece)") {
    // 'ab' (4.0M) ties a+b (2.0+2.0): j=0 scanned first and kept
    assert(seg("ab") === Seq("▁ab"))
  }

  test("unknown characters fall back to single-char unk pieces") {
    assert(seg("a9b") === Seq("▁a", "9", "b"))
    assert(seg("99") === Seq("▁9", "9"))
    assert(seg("") === Seq.empty)
  }

  test("column kernel flattens words in order with ▁ marks; deterministic across partitionings") {
    val df = Seq((1L, "abcd ab xy"), (2L, ""), (3L, "abc")).toDF("id", "text")
    val out = df.select(col("id"),
        UnigramEncode.of(graft.ops.TextAnalysis.tokens(col("text")), vocab, 5000000L).as("ps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(out(1L) === Seq("▁abc", "d", "▁ab", "▁x", "y"))
    assert(out(2L) === Seq.empty)
    assert(out(3L) === Seq("▁abc"))
    val rep = df.repartition(5).select(col("id"),
        UnigramEncode.of(graft.ops.TextAnalysis.tokens(col("text")), vocab, 5000000L).as("ps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(rep === out)
  }
}
