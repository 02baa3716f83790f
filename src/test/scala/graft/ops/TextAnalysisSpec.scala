package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PII scrubbing contract: explicit phone/email/IP forms are masked, and
  * — equally important — clean corpus text is NOT: dates, timestamps, and
  * bare numeric ids must survive (the round-4 review caught a greedy
  * digit-run pattern eating ISO timestamps). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.scrubPii(col("t"))).head().getString(0)

  test("scrubPii masks emails, IPs, and explicit phone forms") {
    assert(scrub("mail bob.smith+x@corp.example.org now")
      === "mail <EMAIL> now")
    assert(scrub("host 192.168.0.1 down") === "host <IP> down")
    assert(scrub("call +1 (555) 010-4242 today") === "call <PHONE> today")
    assert(scrub("call +44 20 7946 0958 today") === "call <PHONE> today")
    assert(scrub("fax (555) 123-4567.") === "fax <PHONE>.")
  }

  test("scrubPii leaves dates, timestamps, and bare numbers alone") {
    assert(scrub("released on 2021-11-02 03:04:05 UTC")
      === "released on 2021-11-02 03:04:05 UTC")
    assert(scrub("invoice 1234567890 total 12-34") === "invoice 1234567890 total 12-34")
    assert(scrub("range 1990-2020 grew 10 000 units") === "range 1990-2020 grew 10 000 units")
  }

  private def clean(s: String, minWords: Int = 3, maxDigit: Double = 0.5): String =
    Seq(s).toDF("t")
      .select(TextAnalysis.cleanLines(col("t"), minWords, maxDigit))
      .head().getString(0)

  test("cleanLines drops short, numeric, and blank lines; keeps prose") {
    val page = Seq(
      "Home | Products | About",   // 5 words incl separators → kept? '|' are words
      "a good clean sentence here",
      "42",                        // short + all digits
      "12 345 6789",               // 3 words, digit ratio 1
      "",                          // blank
      "page 3 of 17",              // 4 words, digits 3/9 = 0.33
      "   ",                       // whitespace only
      "two words").mkString("\n")
    assert(clean(page) ===
      Seq("Home | Products | About", "a good clean sentence here", "page 3 of 17")
        .mkString("\n"))
    // tighter digit ratio also drops the pagination line
    assert(clean(page, maxDigit = 0.3) ===
      Seq("Home | Products | About", "a good clean sentence here").mkString("\n"))
    // all lines dropped → empty document (caller filters on length)
    assert(clean("1 2 3\nx y") === "")
    // no newlines: the whole doc is one line, kept iff it passes
    assert(clean("three clean words") === "three clean words")
  }

  test("bm25 ranks term-dense docs higher, zero for no hits, tf saturates") {
    val docs = Seq(
      (1L, "spark spark spark spark row row"), // high tf for 'spark'
      (2L, "spark row table join merge line"), // one hit
      (3L, "row table join line key value"),   // no query terms
      (4L, "spark spark row table join line")  // two hits
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(3L) === 0.0)
    assert(scores(1L) > scores(4L) && scores(4L) > scores(2L) && scores(2L) > 0.0)
    // k1 saturation: 4 occurrences score less than 4x one occurrence
    assert(scores(1L) < 4.0 * scores(2L))
    // multi-term query sums per-term contributions
    val multi = TextAnalysis.bm25Scores(docs, "doc_id", "text", Seq("spark", "merge"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(multi(2L) > scores(2L)) // doc 2 also matches 'merge'
    assertThrows[IllegalArgumentException](
      TextAnalysis.bm25Scores(docs, "doc_id", "text", Seq.empty))
  }

  test("trainBpe learns deterministic merges; BpeEncode applies them greedily and losslessly") {
    import graft.functions.BpeEncode
    // exact pin: words aa×2 ab×1 → pair counts (a,a)=2 (a,</w>)=2 (a,b)=1
    // (b,</w>)=1; the count-2 tie breaks lexicographically and '<' < 'a'
    val tiny = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    assert(TextAnalysis.trainBpe(tiny, "text", numMerges = 1) === Seq(("a", "</w>")))
    val enc1 = Seq(Tuple1(Seq("aa", "ab"))).toDF("ts")
      .select(BpeEncode.of(col("ts"), Seq(("a", "</w>"))).as("p"))
      .head().getSeq[String](0)
    assert(enc1 === Seq("a", "a</w>", "a", "b", "</w>"))

    // Sennrich-style corpus: merges are a pure function of word counts
    val docs = Seq((1L, ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpe(docs, "text", 10)
    assert(merges.size === 10)
    assert(TextAnalysis.trainBpe(docs.repartition(7), "text", 10) === merges,
      "merge list must be partitioning-independent")

    // lossless: pieces concatenate back to each word + the EOW marker,
    // including for a word never seen in training
    val pieces = Seq(Tuple1(Seq("newest", "low", "zzz"))).toDF("ts")
      .select(BpeEncode.of(col("ts"), merges).as("p")).head().getSeq[String](0)
    assert(pieces.mkString("") === "newest</w>low</w>zzz</w>")
    def nPieces(ms: Seq[(String, String)]): Int =
      docs.select(size(BpeEncode.of(TextAnalysis.tokens(col("text")), ms)).as("n"))
        .head().getInt(0)
    // more merges → monotonically fewer pieces on the training corpus
    assert(nPieces(Nil) > nPieces(merges.take(3)))
    assert(nPieces(merges.take(3)) > nPieces(merges))
    // zero merges = characters + EOW per word
    val raw = Seq(Tuple1(Seq("ab"))).toDF("ts")
      .select(BpeEncode.of(col("ts"), Nil).as("p")).head().getSeq[String](0)
    assert(raw === Seq("a", "b", "</w>"))
    // vocab layout: sorted training alphabet, EOW, then merges in rank order
    assert(TextAnalysis.bpeVocab(Seq("aa" -> 2L, "ab" -> 1L), Seq(("a", "</w>")))
      === Seq("a", "b", "</w>", "a</w>"))
  }

  test("dedupFrequentLines drops corpus-frequent lines; all-boilerplate docs survive empty") {
    // footer repeats 4x (> max 3) -> dropped everywhere; unique lines kept;
    // doc 4 is ONLY the footer -> must come back as an empty row, not vanish
    val docs = Seq(
      (1L, "alpha unique line\nshared footer line"),
      (2L, "beta unique line\nshared footer line"),
      (3L, "gamma unique line\nshared footer line"),
      (4L, "shared footer line"),
      (5L, "delta unique line")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupFrequentLines(docs, "doc_id", "text", maxOccurrences = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("alpha unique line", 1L)))
    assert(out(4L) === (("", 0L)), "all-boilerplate doc must survive as an empty row")
    assert(out(5L) === (("delta unique line", 1L)))
    assert(out.size === 5)
    // at exactly maxOccurrences the line is NOT boilerplate (strict >)
    val out3 = TextAnalysis.dedupFrequentLines(
      docs.filter(col("doc_id") <= 3), "doc_id", "text", maxOccurrences = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out3(1L) === "alpha unique line\nshared footer line")
    // surviving-line ORDER is the original line order, not sorted
    val ordered = Seq((9L, "zz first\nshared\naa last"), (10L, "shared"),
        (11L, "shared"), (12L, "shared"), (13L, "shared"))
      .toDF("doc_id", "text")
    val kept9 = TextAnalysis.dedupFrequentLines(ordered, "doc_id", "text", 3)
      .filter(col("doc_id") === 9L).head().getString(1)
    assert(kept9 === "zz first\naa last")
  }

  test("NaiveBayes: separable classes classify correctly; ties break to smallest class") {
    val train = Seq(
      ("sports", "goal match team score goal win"),
      ("sports", "team match play score win goal"),
      ("finance", "market stock price trade market rally"),
      ("finance", "stock trade price market profit rally")).toDF("label", "text")
    val m = NaiveBayes.train(train, "label", "text", maxVocab = 20)
    assert(m.classes === Seq("finance", "sports"))
    // every class cost map covers vocab + <unk> with the same key set
    assert(m.costQ6("sports").keySet === m.costQ6("finance").keySet)
    val test = Seq((1L, "goal team score"), (2L, "stock market price"),
      (3L, "completely unseen words only"), (4L, "")).toDF("id", "text")
    val out = NaiveBayes.classify(test, "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) === "sports")
    assert(out(2L) === "finance")
    // all-OOV and empty docs: equal priors and equal unk costs -> the
    // deterministic tie-break picks the lexicographically smallest class
    assert(out(3L) === "finance")
    assert(out(4L) === "finance")
  }

  test("encodeIds maps tokens through the vocab, OOV to -1, length-preserving") {
    val docs = Seq((1L, "The cat sat"), (2L, "dog the DOG"), (3L, ""))
      .toDF("doc_id", "text")
    val vocab = Seq(("the", 5L, 0L), ("dog", 2L, 1L)).toDF("token", "n", "id")
    val out = TextAnalysis.encodeIds(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1).toSeq, r.getLong(2)))).toMap
    assert(out(1L) === ((Seq(0L, -1L, -1L), 2L))) // lowercased 'the' hits
    assert(out(2L) === ((Seq(1L, 0L, 1L), 0L)))
    assert(out(3L) === ((Seq.empty[Long], 0L)))   // empty doc: [] and 0 OOV
    // a vocab that maps one token to two ids is a bug, not a coin flip
    assertThrows[IllegalArgumentException](TextAnalysis.encodeIds(docs, "doc_id", "text",
      Seq(("the", 1L, 0L), ("the", 1L, 9L)).toDF("token", "n", "id")))
  }
}
