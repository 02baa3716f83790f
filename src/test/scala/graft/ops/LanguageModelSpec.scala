package graft.ops

import graft.SparkSpec

/** Pruned bigram LM: exact counts with unk pooling, add-one smoothing,
  * and integer-scaled NLL scoring pinned against hand arithmetic. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigram LM: counts, unk pooling, smoothing, exact integer NLL, determinism") {
    val docs = Seq((1L, "a b a b"), (2L, "a b rare")).toDF("doc_id", "text")
    val lm = LanguageModel.train(docs, "text", maxVocab = 2, maxBigrams = 10)
    // a and b (3 occurrences each) fill the capped vocab; 'rare' pools to unk
    assert(lm.vocab === Map("a" -> 3L, "b" -> 3L))
    assert(lm.contexts(LanguageModel.Unk) === 1L)
    assert(lm.contexts(LanguageModel.Bos) === 2L)
    assert(lm.vocabSize === 3)
    assert(lm.bigrams === Map("<s> a" -> 2L, "a b" -> 3L, "b a" -> 1L, "b <unk>" -> 1L))

    val out = LanguageModel.scoreNll(docs, "doc_id", "text", lm).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def q6(c2: Long, c1: Long): Long =
      math.floor(-math.log((c2 + 1.0) / (c1 + 3.0)) * 1e6 + 0.5).toLong
    // doc 1 "a b a b": (<s>,a) (a,b) (b,a) (a,b)
    assert(out(1L) === ((4L, q6(2, 2) + q6(3, 3) + q6(1, 3) + q6(3, 3))))
    // doc 2 "a b rare": (<s>,a) (a,b) (b,<unk>)
    assert(out(2L) === ((3L, q6(2, 2) + q6(3, 3) + q6(1, 3))))

    // training is a pure function of exact counts — partitioning-independent
    assert(LanguageModel.train(docs.repartition(5), "text", 2, 10) === lm)

    // empty docs score 0; bigrams pruned out of the cap count as 0
    val e = LanguageModel.scoreNll(Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text", lm).head()
    assert(e.getLong(1) === 0L && e.getLong(2) === 0L)
    val pruned = lm.copy(bigrams = Map("a b" -> 3L))
    val p1 = LanguageModel.scoreNll(docs, "doc_id", "text", pruned).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(p1(1L) === q6(0, 2) + q6(3, 3) + q6(0, 3) + q6(3, 3))
  }

  test("literal <unk>/<s> corpus tokens pool into unk instead of colliding") {
    val docs = Seq((1L, "<unk> <unk> a"), (2L, "a <s> a")).toDF("doc_id", "text")
    val lm = LanguageModel.train(docs, "text", maxVocab = 5, maxBigrams = 10)
    // neither special literal may enter the vocab even with room to spare —
    // a vocab entry would collide with the special context rows (Spark's
    // map would overwrite; a SQL twin would fan out its context join)
    assert(lm.vocab === Map("a" -> 3L))
    assert(lm.contexts(LanguageModel.Unk) === 3L) // the 3 literal specials
    val out = LanguageModel.scoreNll(docs, "doc_id", "text", lm).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.values.forall(_ > 0L))
  }
}
