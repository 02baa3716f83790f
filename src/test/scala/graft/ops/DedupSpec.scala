package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Ground-truth checks for the dedup family on a hand-built corpus:
  * the count-based operators must agree with exhaustive array-set math,
  * and the LSH/blocked variants must find the constructed near-dup pairs.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text about spark engines at scale"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "lorem ipsum dolor sit amet consectetur adipiscing elit")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps smallest id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length === 4) // 1&4 merge
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("keep_id") === 1L)
  }

  test("contamination flags docs sharing an n-gram with the benchmark, exactly") {
    // bench doc shares the 3-gram "quick brown fox" (and more) with docs
    // 1,2,4; doc 3 and 5 share nothing
    val bench = Seq((100L, "the quick brown fox sat down")).toDF("doc_id", "text")
    val out = Dedup.contamination(docs, bench, "doc_id", "text", shingleN = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L),
      s"got ${out.map(_.getLong(0)).toSeq}")
    // exact hit accounting: docs 1 and 4 ("...fox jumps over the lazy dog")
    // share "the quick brown" and "quick brown fox" with the bench doc
    val d1 = out.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("hits") === 2L)
    assert(d1.getAs[Long]("doc_ngrams") === 7L)
    assert(d1.getAs[Double]("frac") === math.round(2.0 / 7.0 * 1e6) / 1e6)
    // a doc wholly inside the benchmark is fully contaminated
    val self = Seq((200L, "the quick brown fox sat down")).toDF("doc_id", "text")
    val full = Dedup.contamination(self, bench, "doc_id", "text", shingleN = 3)
      .collect().head
    assert(full.getAs[Long]("hits") === full.getAs[Long]("doc_ngrams"))
    assert(full.getAs[Double]("frac") === 1.0)
    // empty benchmark -> nothing contaminated
    assert(Dedup.contamination(docs, bench.filter(lit(false)),
      "doc_id", "text", shingleN = 3).count() === 0L)
  }

  test("count-based ngram Jaccard equals exhaustive array-set Jaccard") {
    val counted = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // exhaustive ground truth from the string-shingle/array path
    val base = docs.select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("id"), Dedup.shinglesFromTokens(col("ts"), 2).as("sh"))
    val exhaustive = base.alias("a").crossJoin(base.alias("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        round(Dedup.jaccard(col("a.sh"), col("b.sh")), 6).as("j"))
      .filter(col("j") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(counted === exhaustive)
    assert(counted.nonEmpty) // (1,2) and (1,4)/(2,4) qualify by construction
  }

  test("minhash LSH finds exact and near duplicates with exact Jaccard") {
    val out = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 4L)) === 1.0) // identical docs
    assert(out.contains((1L, 2L))) // 7-of-9 shared bigrams, J ≈ 0.778
    assert(out((1L, 2L)) === out((2L, 4L)))
  }

  test("simhash finds identical docs at hamming 0") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.exists { case (a, b, h) => a == 1L && b == 4L && h == 0L })
  }

  test("embedding near-dup finds identical vectors via signature buckets") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.25f)),
      (2L, Array(1.0f, 0.0f, 0.5f, 0.25f)),
      (3L, Array(-1.0f, 2.0f, -0.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
        threshold = 0.9, planes = 8, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("duplicateClusters resolves pairs into min-id components") {
    // two components: {1,2,4} (chained 1-2, 2-4) and {7,9}
    val pairs = Seq((1L, 2L), (2L, 4L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
    // a longer chain still converges (diameter 4)
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("id_a", "id_b")
    val c = Dedup.duplicateClusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.values.toSet === Set(10L) && c.size === 5)
  }

  test("bestOfCluster keeps the highest-scoring member; singletons survive") {
    // clusters {1,2,4} and {7,9}; 3 and 5 unclustered
    val clusters = Seq((1L, 1L), (2L, 1L), (4L, 1L), (7L, 7L), (9L, 7L))
      .toDF("id", "cluster_id")
    val docs = Seq((1L, 10L), (2L, 30L), (4L, 30L), (3L, 1L), (5L, 99L),
      (7L, 5L), (9L, 8L)).toDF("doc_id", "score")
    val got = Dedup.bestOfCluster(docs, "doc_id", "score", clusters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster 1: scores 10/30/30 — tie at 30 breaks to the SMALLER id (2,
    // not 4); cluster 7: 9 wins on score despite the larger id;
    // singletons 3 and 5 survive untouched
    assert(got === Map(2L -> 30L, 9L -> 8L, 3L -> 1L, 5L -> 99L))
    // deterministic under partitioning
    val rep = Dedup.bestOfCluster(docs.repartition(5), "doc_id", "score",
        clusters.repartition(3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep === got)
    // incremental stability: appending a WORSE member changes nothing
    val more = docs.unionAll(Seq((8L, 4L)).toDF("doc_id", "score"))
    val withNew = Seq((8L, 7L)).toDF("id", "cluster_id").unionAll(clusters)
    val got2 = Dedup.bestOfCluster(more, "doc_id", "score", withNew)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got)
    // a docs frame already carrying an internal name would make the
    // join/coalesce silently wrong — must refuse loudly
    val clash = docs.withColumn("cluster_id", lit(0L))
    val e = intercept[IllegalArgumentException](
      Dedup.bestOfCluster(clash, "doc_id", "score", clusters))
    assert(e.getMessage.contains("cluster_id"))
  }

  test("large-star/small-star clusters match propagation and converge in log rounds") {
    // the propagation test's fixtures, same expected output
    val pairs = Seq((1L, 2L), (2L, 4L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClustersLogRounds(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))

    // a 200-hop chain: min-label propagation needs ~200 rounds (its
    // default cap rightly refuses); the star algorithm finishes in ≤ 12
    val n = 200
    val chain = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val c = Dedup.duplicateClustersLogRounds(chain, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.size === n + 1 && c.values.toSet === Set(0L))
    assertThrows[IllegalArgumentException](
      Dedup.duplicateClusters(chain, maxIter = 12))

    // unordered/duplicate/self edges normalize away
    val messy = Seq((5L, 3L), (3L, 5L), (5L, 5L), (3L, 3L)).toDF("id_a", "id_b")
    val m = Dedup.duplicateClustersLogRounds(messy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(3L -> 3L, 5L -> 3L))
  }

  test("contamination finds planted n-gram leaks, counts distinct shared shingles") {
    val probes = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    // doc 1/2/4 share trigrams with the probe; doc 3/5 share none
    val out = Dedup.contaminationPairs(docs, probes, "doc_id", "text",
        shingleN = 3, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet === Set((1L, 100L), (2L, 100L), (4L, 100L)))
    // probe has 3 distinct trigrams, all inside docs 1/2/4
    assert(out((1L, 100L)) === 3L)
    // minShared prunes weak overlaps
    val strict = Dedup.contaminationPairs(docs, probes, "doc_id", "text",
        shingleN = 3, minShared = 4L).count()
    assert(strict === 0L)
  }

  test("minhash rejects non-divisible banding; maxDf prune preserves results") {
    // remainder hashes silently dropped / rows-per-band 0 collapses all
    // docs into one bucket — both are config errors, fail fast
    assertThrows[IllegalArgumentException](
      Dedup.minhashLsh(docs, "doc_id", "text", numHashes = 100, bands = 32))
    assertThrows[IllegalArgumentException](
      Dedup.minhashLsh(docs, "doc_id", "text", numHashes = 128, bands = 200))
    // a cap above every df must not change results (and the hot set it
    // broadcasts is the SMALL side — review finding)
    val without = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val withCap = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.3,
        maxDf = Some(1000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(without === withCap && without.nonEmpty)
  }

  test("shingle hashes skip null tokens instead of NPEing the task") {
    val withNulls = Seq((1L, Seq("a", null, "b", "c"))).toDF("id", "toks")
      .select(col("id"),
        graft.functions.ShingleHashes.of(col("toks"), 2, "t").as("h"))
    val clean = Seq((1L, Seq("a", "b", "c"))).toDF("id", "toks")
      .select(col("id"),
        graft.functions.ShingleHashes.of(col("toks"), 2, "t").as("h"))
    assert(withNulls.head().getSeq[Long](1) === clean.head().getSeq[Long](1))
  }

  test("MinHashSig kernel equals the min-over-exploded-affine formulation") {
    import graft.functions.{Hashing, MinHashSig, ShingleHashes}
    val k = 16
    val base = docs
      .select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("id"), ShingleHashes.of(col("ts"), 2, "mh").as("hsh"))
    val kernel = base.select(col("id"), MinHashSig.of(col("hsh"), k).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ex = base.select(col("id"), explode(col("hsh")).as("h"))
      .select(col("id"), col("h").bitwiseAND(lit(0xFFFFFFFFL)).as("x"))
    val aggs = (0 until k).map(i => min(Hashing.affine(col("x"), i)).as(s"m$i"))
    val viaAgg = ex.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_)).toSeq).toMap
    assert(kernel === viaAgg)
    // empty-hash-set inputs are dropped, matching the agg path's no-rows
    val empty = Seq((1L, Seq.empty[Long])).toDF("id", "hsh")
    assert(Dedup.minhashLsh(docs.limit(0), "doc_id", "text").count() === 0L)
    assert(empty.filter(size(col("hsh")) > 0).count() === 0L)
  }

  test("dupPassages finds cross-doc shared windows, skips unique docs") {
    val shared = "alpha beta gamma delta epsilon zeta" // one 6-token window
    val fix = Seq(
      (1L, s"$shared and then unique tail one two three"),
      (2L, s"different head words here $shared"),
      (3L, "entirely unrelated document with its own words only")
    ).toDF("doc_id", "text")
    val out = Dedup.dupPassages(fix, "doc_id", "text", windowN = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(1L, 2L))
    // both docs contain the shared window exactly once
    assert(out(1L)._2 === 1L && out(2L)._2 === 1L)
    // doc 1 has 13 tokens -> 8 windows; doc 2 has 10 tokens -> 5 windows
    assert(out(1L) === ((8L, 1L, 0.125)))
    assert(out(2L) === ((5L, 1L, 0.2)))
    // identical docs are 100% duplicated passages
    val twins = Seq((1L, "one two three four five six seven"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val t = Dedup.dupPassages(twins, "doc_id", "text", windowN = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(t === Map(1L -> 1.0, 2L -> 1.0))
  }

  test("prefix-filtered ngram Jaccard join equals the brute inverted-index join") {
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = normalize(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5))
    val viaPrefix = normalize(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 2, 0.5))
    assert(brute.nonEmpty) // fixture actually contains near-dup pairs
    assert(viaPrefix === brute) // prefix filtering is lossless at J >= t
    // a tighter threshold shrinks prefixes AND results, still in lockstep
    val brute8 = normalize(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.8))
    val prefix8 = normalize(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 2, 0.8))
    assert(prefix8 === brute8)
  }

  test("ZipfCorpus: grouped near-dups over a power-law vocabulary, deterministic") {
    val ids = (0L until 100L).toDF("doc_id")
    val c = ZipfCorpus.corpus(ids, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c.size === 100)
    // deterministic: regeneration is bit-identical (all md5-derived)
    val c2 = ZipfCorpus.corpus(ids, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c2 === c)
    // group structure: docs seeded together are near-identical token-wise,
    // docs across groups are not
    def toks(id: Long) = c(id).split(" ").toSeq
    val sameGroup = toks(0).zip(toks(3)).count { case (a, b) => a == b }
    assert(sameGroup > 50, s"group-mates shared only $sameGroup/60 positions")
    val crossGroup = toks(0).zip(toks(7)).count { case (a, b) => a == b }
    assert(crossGroup < 15, s"cross-group docs shared $crossGroup/60 positions")
    // Zipf head: the hottest token id is hot (power-law, not uniform),
    // and the vocabulary still has a large tail
    val freq = c.values.flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.size)
    val total = freq.values.sum.toDouble
    val top = freq.values.max / total
    assert(top > 0.03 && top < 0.25, s"head token frequency $top outside Zipf band")
    assert(freq.size > 500, s"vocabulary collapsed to ${freq.size} distinct tokens")
    // the regime consequence: prefix filtering finds the same pairs (the
    // sf0.01 gate re-proves this against DuckDB's regenerated corpus)
    val corpus = ZipfCorpus.corpus(ids, "doc_id")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = normalize(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 2, 0.5))
    val pref = normalize(Dedup.ngramJaccardPairsPrefix(corpus, "doc_id", "text", 2, 0.5))
    assert(brute.nonEmpty && pref === brute)
  }

  test("BandBuckets kernel equals the slice-join-md5 formulation") {
    import graft.functions.{BandBuckets, Hashing, MinHashSig, ShingleHashes}
    val bands = 8; val rows = 2
    val sigs = docs
      .select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("id"), ShingleHashes.of(col("ts"), 2, "mh").as("hsh"))
      .filter(size(col("hsh")) > 0)
      .select(col("id"), MinHashSig.of(col("hsh"), bands * rows).as("mh"))
    val kernel = sigs
      .select(col("id"), posexplode(BandBuckets.of(col("mh"), bands)).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaStrings = sigs.select(col("id"),
        posexplode(array((0 until bands).map { b =>
          Hashing.h64(array_join(slice(col("mh"), b * rows + 1, rows).cast("array<string>"), ","),
            s"band$b")
        }: _*)).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(kernel === viaStrings)
    assert(kernel.values.toSet.size > 1)
    // a signature that doesn't band evenly fails loudly, not by dropping hashes
    val bad = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "mh")
    val e = intercept[Exception](bad.select(BandBuckets.of(col("mh"), 2)).collect())
    assert(e.getMessage != null)
  }

  test("SimHashSig kernel equals the interpreted per-bit-majority formulation") {
    import graft.functions.{Hashing, SimHashSig}
    val base = docs
      .select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("id"), transform(col("ts"), t => Hashing.h64(t, "sh")).as("hx"))
    val kernel = base.select(col("id"), SimHashSig.of(col("hx")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val interp = base.select(col("id"), Dedup.simhashFromHashes(col("hx")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === interp)
    assert(kernel.values.toSet.size > 1) // signatures actually vary
    // edge cases pinned: empty array → 0 (no votes win), null element → a
    // −1 vote per bit (the interpreted otherwise(-1) branch)
    val edge = Seq((1L, Seq.empty[java.lang.Long]), (2L, Seq[java.lang.Long](null, 3L)))
      .toDF("id", "hx")
    val ek = edge.select(col("id"), SimHashSig.of(col("hx")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ei = edge.select(col("id"), Dedup.simhashFromHashes(col("hx")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ek === ei)
    assert(ek(1L) === 0L)
  }

  test("MinHashSig rejects wrong input types at analysis; empty array yields null") {
    import graft.functions.MinHashSig
    val strs = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    assertThrows[org.apache.spark.sql.AnalysisException](
      strs.select(MinHashSig.of(col("toks"), 4)).collect())
    val empty = Seq((1L, Seq.empty[Long]), (2L, Seq(7L))).toDF("id", "hsh")
      .select(col("id"), MinHashSig.of(col("hsh"), 4).as("mh"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(empty(1L).isEmpty) // not a [MaxValue x k] sentinel bucket magnet
    assert(empty(2L).isDefined)
  }

  test("shingles handles short docs (single shingle) and empty text") {
    val out = Seq((1L, "one"), (2L, "")).toDF("id", "text")
      .select(col("id"), TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("id"), Dedup.shinglesFromTokens(col("ts"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[String]]("sh")).toMap
    assert(out(1L) === Seq("one"))
    assert(out(2L) === Seq(""))
  }

  test("editDistancePairs: length-bucket blocking is lossless vs brute force") {
    // lengths straddling bucket boundaries (width maxDist+1 = 3): pairs
    // whose lengths differ by up to 3 land in ADJACENT buckets and must
    // still be found via the (b-1, b, b+1) probes
    val rows = Seq(
      (1L, "spark engine"),        // len 12
      (2L, "spark enginee"),       // len 13, dist 1, cross-bucket (4 vs 4)... varied
      (3L, "spark engineeee"),     // len 15, dist 3 from 1
      (4L, "flink engine"),        // len 12, dist 2 from 1
      (5L, "completely different") // no partner
    ).toDF("id", "k")
    val blocked = Dedup.editDistancePairs(rows, "id", "k", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = rows.alias("a").crossJoin(rows.alias("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.k"), col("b.k")))
      .filter(col("dist") <= 3)
      .select(col("a.id"), col("b.id"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked === brute, s"blocking must lose nothing: $blocked vs $brute")
    assert(brute.nonEmpty && brute.exists { case (a, b, _) => (a, b) == (1L, 3L) },
      "a cross-bucket pair (len 12 vs 15) must be present to make the test non-vacuous")
  }

  test("semanticDedup keeps the min-id representative of each semantic cluster") {
    // exact-copy duplicates: identical vectors assign to the SAME cell
    // whatever the trained codebook (same assignment expression), and
    // cosine(v, v) = 1 passes any eps — so the expected output is exact
    // regardless of how Lloyd splits the two directions across cells
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, -1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        numClusters = 2, eps = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set((1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 3L, false), (5L, 5L, true)))
  }

  test("appendNovel: content-idempotent incremental dedup; corpus scan reads digest only") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("digest", org.apache.spark.sql.types.StringType)))
    val t = graft.delta.DeltaTable.forPath(spark, tmpDir("incr-dedup")).create(schema)
    // batch 1: one in-batch duplicate pair (3 copies id 1/2/9 -> min id 1)
    val b1 = Seq((1L, "same"), (2L, "same"), (9L, "same"), (5L, "only-b1")).toDF("id", "text")
    assert(Dedup.appendNovel(t, b1, "id", "text") >= 0)
    assert(t.toDF.select("id").as[Long].collect().toSet === Set(1L, 5L))
    // batch 2: cross-batch duplicate loses to batch 1's row even though
    // its id is smaller; genuinely new text appends
    val b2 = Seq((0L, "same"), (7L, "new-in-b2")).toDF("id", "text")
    assert(Dedup.appendNovel(t, b2, "id", "text") >= 0)
    assert(t.toDF.select("id").as[Long].collect().toSet === Set(1L, 5L, 7L))
    // replays of either batch are no-ops — no version committed
    val v = t.snapshot.version
    assert(Dedup.appendNovel(t, b1, "id", "text") === -1L)
    assert(Dedup.appendNovel(t, b2, "id", "text") === -1L)
    assert(graft.delta.DeltaTable.forPath(spark, t.path).snapshot.version === v)
    // the anti-join's corpus side must read ONLY the digest column
    val p = Dedup.novelAgainst(t, b2, "id", "text")
      .queryExecution.executedPlan.toString
    val corpusScans = p.linesIterator.filter(l =>
      l.contains("FileScan parquet") && l.contains("incr-dedup")).toSeq
    assert(corpusScans.nonEmpty, p)
    assert(corpusScans.forall(_.contains("ReadSchema: struct<digest:string>")),
      "corpus anti-join must prune to the digest column:\n" + p)
  }

  test("appendNovelSerialized: concurrent same-digest writers never duplicate") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("digest", org.apache.spark.sql.types.StringType)))
    val t = graft.delta.DeltaTable.forPath(spark, tmpDir("incr-ser")).create(schema)
    // two writers, heavily overlapping content: texts s0..s9 shared, plus
    // a private text each — the blind-append race appendNovel documents
    // would let both commit the shared digests
    val shared = (0 until 10).map(i => s"s$i")
    val batchA = (shared :+ "only-a").zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val batchB = (shared :+ "only-b").zipWithIndex.map { case (s, i) => (100L + i, s) }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val fa = Future(Dedup.appendNovelSerialized(t, batchA.toDF("id", "text"), "id", "text"))
    val fb = Future(Dedup.appendNovelSerialized(t, batchB.toDF("id", "text"), "id", "text"))
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    val rows = t.toDF.select("digest", "text").collect()
    assert(rows.map(_.getString(0)).distinct.length === rows.length,
      "serialized writers must never land the same digest twice")
    assert(rows.map(_.getString(1)).toSet === (shared.toSet + "only-a" + "only-b"),
      "both writers' private rows and every shared text exactly once")
    // replay of either batch is still a content-idempotent no-op
    assert(Dedup.appendNovelSerialized(t, batchA.toDF("id", "text"), "id", "text") === -1L)
  }

  test("appendNovelNear: near-dups drop against batch AND stored corpus; replay idempotent") {
    import spark.implicits._
    def mkCorpus(p: String) = graft.delta.DeltaTable.forPath(spark, tmpDir(p)).create(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("sig",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))))
    def mkBands(p: String) = graft.delta.DeltaTable.forPath(spark, tmpDir(p)).create(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))),
      partitionColumns = Seq("band"))
    val corpus = mkCorpus("near-corpus")
    val bandsT = mkBands("near-bands")
    val doc = "the quick brown fox jumps over the lazy dog and runs far away home"
    val nearDoc = doc.replace("runs", "walks") // high-overlap near-dup
    val other = "completely different content about spark catalyst optimizer internals"
    // batch 1: doc + its near-dup (chain-kill larger id) + a distinct doc
    val b1 = Seq((1L, doc), (2L, nearDoc), (3L, other)).toDF("id", "text")
    assert(Dedup.appendNovelNear(corpus, bandsT, b1, "id", "text") >= 0)
    assert(corpus.toDF.select("id").as[Long].collect().toSet === Set(1L, 3L))
    assert(bandsT.toDF.select("id").as[Long].collect().toSet === Set(1L, 3L))
    // batch 2: near-dup of a CORPUS doc drops; exact replay of a corpus
    // doc drops (jaccard 1); genuinely new text survives
    val b2 = Seq((10L, doc.replace("lazy", "sleepy")), (11L, other),
      (12L, "fresh new totally unrelated sentence about roaring bitmaps")).toDF("id", "text")
    assert(Dedup.appendNovelNear(corpus, bandsT, b2, "id", "text") >= 0)
    assert(corpus.toDF.select("id").as[Long].collect().toSet === Set(1L, 3L, 12L))
    // full replays are content-idempotent no-ops
    assert(Dedup.appendNovelNear(corpus, bandsT, b1, "id", "text") === -1L)
    assert(Dedup.appendNovelNear(corpus, bandsT, b2, "id", "text") === -1L)
    // empty docs: ShingleHashes emits the [""] shingle, so the first
    // empty doc is novel and a second one near-dups it at Jaccard 1 —
    // the dedup semantics you want for blank documents
    val b3 = Seq((20L, "")).toDF("id", "text")
    assert(Dedup.appendNovelNear(corpus, bandsT, b3, "id", "text") >= 0)
    assert(corpus.toDF.count() === 4L)
    assert(Dedup.appendNovelNear(corpus, bandsT,
      Seq((21L, "")).toDF("id", "text"), "id", "text") === -1L)
    // the bands table is partitioned by band: the stored-bucket join can
    // prune partitions when a batch only probes some bands
    assert(bandsT.partitionColumns === Seq("band"))
  }

  test("ngramContainmentPairs finds subset docs Jaccard misses; matches set math") {
    val corpus = Seq(
      // doc 11's entire shingle set sits inside doc 10 (a quoted block):
      // containment 1.0 while Jaccard is far below any useful threshold
      (10L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 b1 b2 b3 b4 b5 b6 b7 b8 b9 c1 c2 c3 c4"),
      (11L, "a1 a2 a3 a4"),
      (12L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (13L, "q1 q2 q3")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(corpus, "doc_id", "text",
        shingleN = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((10L, 11L, 1.0)))
    // the Jaccard join at the same threshold finds nothing here
    assert(Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      shingleN = 2, threshold = 0.8).isEmpty)

    // exhaustive set-math equivalence on the shared fixture corpus
    val base = docs.select(col("doc_id").as("id"),
        array_distinct(Dedup.shingles(col("text"), 2)).as("sh"))
    val expect = base.alias("a").crossJoin(base.alias("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          least(size(col("a.sh")), size(col("b.sh"))).cast("double"), 6).as("c"))
      .filter(col("c") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
        shingleN = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("removeDupSpans cuts cross-doc and within-doc repeated windows, keeps the rest") {
    // docs 1 and 2 share the 4-token span "alpha beta gamma delta" at
    // different offsets; doc 3 repeats a span INTERNALLY; doc 4 is clean;
    // doc 5 is shorter than the window and must survive untouched.
    val corpus = Seq(
      (1L, "alpha beta gamma delta unique1 tail1 end1"),
      (2L, "head2 alpha beta gamma delta tail2 end2"),
      (3L, "x1 rep rep rep rep rep x2 rep rep rep rep rep x3"),
      (4L, "totally fresh words nothing shared here at all"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(corpus, "doc_id", "text", windowN = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"))))
      .toMap

    // doc 1: windows starting at 0 ("alpha beta gamma delta") duplicated
    // in doc 2 -> tokens 0..3 removed
    assert(out(1L)._1 === "unique1 tail1 end1")
    assert(out(1L)._2 === 7L && out(1L)._3 === 4L)
    // doc 2: the shared window starts at 1 -> tokens 1..4 removed
    assert(out(2L)._1 === "head2 tail2 end2")
    // doc 3: "rep rep rep rep" repeats within the doc (starts 1,2 and
    // 7,8 share the hash; windows containing x2 appear once each) —
    // covered tokens are 1..5 and 7..11
    assert(out(3L)._1 === "x1 x2 x3")
    assert(out(3L)._3 === 10L)
    // doc 4 untouched, doc 5 shorter than the window
    assert(out(4L)._1 === "totally fresh words nothing shared here at all")
    assert(out(4L)._3 === 0L)
    assert(out(5L) === (("tiny doc", 2L, 0L)))
  }

  test("removeDupSpans matches a brute-force reference on the fixture corpus") {
    val n = 3
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val tok = rows.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val wins = tok.toSeq.flatMap { case (id, ts) =>
      (0 to ts.length - n).map(p => (id, p, ts.slice(p, p + n).mkString(" "))) }
    val dupKeys = wins.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expect = tok.map { case (id, ts) =>
      val starts = wins.filter(w => w._1 == id && dupKeys(w._3)).map(_._2).toSet
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !starts.exists(s => s <= i && i <= s + n - 1) => t }
      id -> ((kept.mkString(" "), ts.length.toLong, (ts.length - kept.length).toLong))
    }
    val got = Dedup.removeDupSpans(docs, "doc_id", "text", windowN = n)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"))))
      .toMap
    assert(got === expect)
    assert(expect.values.exists(_._3 > 0L)) // non-vacuous: docs 1/2/4 overlap
  }
}
