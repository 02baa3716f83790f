package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant checks for the deterministic sampling/split/packing family:
  * decisions are pure functions of (key, salt), splits partition the
  * corpus, uniformK is exact, packing preserves token accounting, and
  * decontamination removes exactly the fingerprint matches.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 400L)
    .map(i => (i, s"doc number $i with some shared words", if (i % 4 == 0) "a" else "b"))
    .toDF("doc_id", "text", "grp")

  test("bernoulli: deterministic, stable across runs, near the target rate") {
    val s1 = Sampling.bernoulli(docs, "doc_id", 0.25, "s").select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.bernoulli(docs, "doc_id", 0.25, "s").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    assert(s1.nonEmpty && s1.size < 400)
    assert(math.abs(s1.size / 400.0 - 0.25) < 0.1) // 4σ ≈ 0.087
    // a different salt draws a different (deterministic) sample
    val s3 = Sampling.bernoulli(docs, "doc_id", 0.25, "t").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s3 !== s1)
  }

  test("bernoulli: growing the corpus never flips an existing decision") {
    val small = Sampling.bernoulli(docs.filter(col("doc_id") <= 200), "doc_id", 0.25, "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = Sampling.bernoulli(docs, "doc_id", 0.25, "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(full.filter(_ <= 200L) === small)
  }

  test("stratified: per-stratum fractions apply; fraction 0 and 1 are exact") {
    val out = Sampling.stratified(docs, "grp", "doc_id",
      Map("a" -> 1.0, "b" -> 0.0), defaultFraction = 0.5, salt = "s")
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === (1L to 400L).filter(_ % 4 == 0).toSet) // all of a, none of b
  }

  test("assignSplit: every row gets exactly one label, ratios are sane") {
    val out = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
    assert(out.count() === 400)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 400)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // membership is disjoint by construction (single label column); check
    // determinism of the assignment
    val again = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
    assert(out.select("doc_id", "split").collect().toSet ===
      again.select("doc_id", "split").collect().toSet)
  }

  test("leakageSafeSplit: cluster members share a split; singletons ≡ assignSplit") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // ids 1..60 clustered into reps {1, 2, 3}; 61..400 unclustered
    val clusters = (1L to 60L).map(i => (i, i % 3 + 1L)).toDF("id", "cluster_id")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", clusters, splits, "s")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 400)
    // the leakage invariant: every member of a cluster got ITS REP's label
    val plain = Sampling.assignSplit(docs, "doc_id", splits, "s")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 60L).foreach(i => assert(out(i) === plain(i % 3 + 1L),
      s"doc $i must inherit rep ${i % 3 + 1}'s split"))
    // fixture sanity: the clustering actually CHANGED at least one
    // assignment vs the per-row split (the invariant above isn't
    // vacuously green)
    assert((1L to 60L).exists(i => out(i) !== plain(i)))
    // unclustered docs are singletons: byte-identical to assignSplit
    (61L to 400L).foreach(i => assert(out(i) === plain(i)))
    // dup-free corpus (empty cluster frame) degenerates to assignSplit
    val none = Sampling.leakageSafeSplit(docs, "doc_id",
        Seq.empty[(Long, Long)].toDF("id", "cluster_id"), splits, "s")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(none === plain)
    // a df that already holds 'cluster_id' (or the output column) would
    // collide with the joined reps frame and the final drop would eat
    // the caller's column — refuse loudly instead
    val e = intercept[IllegalArgumentException](Sampling.leakageSafeSplit(
      docs.withColumn("cluster_id", lit(0L)), "doc_id", clusters, splits, "s"))
    assert(e.getMessage.contains("cluster_id"))
    val e2 = intercept[IllegalArgumentException](Sampling.leakageSafeSplit(
      docs.withColumn("split", lit("x")), "doc_id", clusters, splits, "s"))
    assert(e2.getMessage.contains("split"))
  }

  test("uniformK: exactly min(k, group size) per group, deterministic") {
    val out = Sampling.uniformK(docs, "grp", "doc_id", k = 7, salt = "s")
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 7L, "b" -> 7L))
    val tiny = Sampling.uniformK(docs.filter(col("doc_id") <= 3), "grp", "doc_id", 7, "s")
    assert(tiny.count() === 3) // groups smaller than k keep everything
  }

  test("domainBudget: fraction-1 domains keep everything; undersampling hits the rate") {
    // weight 1 per row: budget 100 on group a (|a|=100) keeps all of a;
    // group b (|b|=300) is sampled at ~1/3
    val out = Sampling.domainBudget(docs, "grp", "doc_id", lit(1L), budget = 100L, salt = "s")
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") === 100L)
    assert(math.abs(counts("b") - 100L) < 30) // Bernoulli at f=1/3, 4σ ≈ 33
  }

  test("packChunks: token accounting is exact and chunks are contiguous") {
    val out = Sampling.packChunks(docs, "grp", "doc_id",
      TextAnalysis.tokenCount(col("text")), contextLen = 64, salt = "s").cache()
    // per shard: start_tok of the hash-order concatenation covers
    // [0, total) with no gaps or overlaps
    out.select("shard", "n_tokens", "start_tok").collect()
      .groupBy(_.getString(0)).foreach { case (_, rows) =>
        val sorted = rows.map(r => (r.getLong(2), r.getLong(1))).sortBy(_._1)
        assert(sorted.head._1 === 0L)
        sorted.sliding(2).foreach {
          case Array((s1, n1), (s2, _)) => assert(s1 + n1 === s2)
          case _ =>
        }
      }
    // chunk ids follow from start_tok by integer division
    out.collect().foreach { r =>
      val (n, start) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_tok"))
      assert(r.getAs[Long]("chunk_first") === start / 64)
      assert(r.getAs[Long]("chunk_last") === (start + math.max(n - 1, 0)) / 64)
    }
    out.unpersist(): Unit
  }

  test("decontaminate: removes exactly the probe fingerprint matches") {
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "beta alpha gamma gamma"), // same token SET as probe 11 → removed
      (4L, "unique text here")).toDF("doc_id", "text")
    val probes = Seq((11L, "gamma beta alpha"), (12L, "other probe words"))
      .toDF("doc_id", "text")
    val kept = Sampling.decontaminate(corpus, probes, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L))
  }

  test("decontaminateBloom: output identical to exact decontaminate at any sketch size") {
    val corpus = (1L to 200L).map(i => (i, s"document body number ${i % 37}"))
      .toDF("doc_id", "text")
    val probes = (0L to 36L by 3).map(i => (1000L + i, s"document body number $i"))
      .toDF("doc_id", "text")
    val exact = Sampling.decontaminate(corpus, probes, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty && exact.size < 200)
    // a deliberately tiny sketch maximizes false positives — the exact
    // verify join must erase them all
    for (expected <- Seq(1L, 64L, 1L << 20)) {
      val bloom = Sampling.decontaminateBloom(corpus, probes, "text", expected)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloom === exact, s"expectedProbes=$expected")
    }
    // empty probe set: everything is clean
    assert(Sampling.decontaminateBloom(corpus, probes.limit(0), "text").count() === 200L)
    // (the scan-stage plan shape is pinned in PlanSpec over parquet input —
    // a local-relation fixture constant-folds the might_contain filter away)
  }

  test("weightedBernoulli keeps by per-row probability; clamps bad scores") {
    val docs = (1L to 300L).map(i => (i, i.toDouble / 300.0)).toDF("doc_id", "p")
    val kept = Sampling.weightedBernoulli(docs, "doc_id", col("p"), "w")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < 300)
    // high-p rows survive far more often than low-p rows
    val lowKept = kept.count(_ <= 100)
    val highKept = kept.count(_ > 200)
    assert(highKept > lowKept)
    // p = 0 never keeps, p = 1 (and clamped > 1 / < 0) behave as constants
    val edge = Seq((1L, 0.0), (2L, 1.0), (3L, 7.0), (4L, -2.0), (5L, Double.NaN))
      .toDF("doc_id", "p")
    val ek = Sampling.weightedBernoulli(edge, "doc_id", col("p"), "w")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ek.contains(1L) && ek.contains(2L) && ek.contains(3L))
    assert(!ek.contains(4L) && !ek.contains(5L))
    // deterministic
    val again = Sampling.weightedBernoulli(docs, "doc_id", col("p"), "w")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept)
  }

  test("percentileGate keeps the per-domain top fraction with deterministic ties") {
    val docs = (1L to 100L).map(i => (i, if (i <= 50) "a" else "b", (i % 10).toDouble))
      .toDF("doc_id", "dom", "score")
    val kept = Sampling.percentileGate(docs, "dom", "doc_id", col("score"), 0.2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // ceil(0.2 * 50) = 10 per domain
    assert(kept.count(_._2 == "a") === 10)
    assert(kept.count(_._2 == "b") === 10)
    // kept scores dominate: nothing below score 8 survives (10 rows of 9s
    // and 8s per domain fill the quota exactly)
    assert(kept.forall(_._3 >= 8.0))
    // tiny domain always keeps its best row
    val tiny = Seq((1L, "t", 5.0), (2L, "t", 3.0)).toDF("doc_id", "dom", "score")
    val tk = Sampling.percentileGate(tiny, "dom", "doc_id", col("score"), 0.3)
      .collect().map(_.getLong(0)).toSeq
    assert(tk === Seq(1L))
    assertThrows[IllegalArgumentException](
      Sampling.percentileGate(docs, "dom", "doc_id", col("score"), 0.0))
    // reserved internal names must be refused, not clobbered
    assertThrows[IllegalArgumentException](
      Sampling.percentileGate(docs.withColumn("__m", lit(1)),
        "dom", "doc_id", col("score"), 0.5))
  }

  test("percentileGate keeps the null domain as its own group") {
    val docs = Seq(
      (1L, Some("a"), 9.0), (2L, Some("a"), 5.0), (3L, Some("a"), 1.0),
      (4L, None, 8.0), (5L, None, 4.0), (6L, None, 2.0))
      .toDF("doc_id", "dom", "score")
    val kept = Sampling.percentileGate(docs, "dom", "doc_id", col("score"), 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // ceil(0.4 * 3) = 2 per group — the null domain included, matching the
    // window form's null-as-a-group semantics
    assert(kept === Set(1L, 2L, 4L, 5L))
  }

  test("percentileGate: skewed domains match the rank definition; no window in the plan") {
    // one domain ≫ the others and ≫ shuffle partitions (4 in tests), with
    // heavy score ties so the coin tie-break decides the cut — the fixture
    // that exercises the full 6-level histogram refinement (partial tie
    // groups at the boundary force the coin passes to do real work)
    val docs = (1L to 5000L).map { i =>
      val dom = if (i <= 4500) "big" else if (i <= 4900) "mid" else "small"
      (i, dom, (i % 97).toDouble)
    }.toDF("doc_id", "dom", "score")
    val got = Sampling.percentileGate(docs, "dom", "doc_id", col("score"), 0.3)
    // the returned plan must be join+filter only: the whole point of the
    // distributed selection is that NO window (bounded or not) remains
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
    val gotSet = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("dom")
      .orderBy(col("score").desc, Sampling.coin(col("doc_id"), "pctl"), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("dom")
    val expected = docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rk") <= ceil(lit(0.3) * col("n").cast("double")).cast("long"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotSet === expected)
    // per-domain quota is exact
    val perDom = Sampling.percentileGate(docs, "dom", "doc_id", col("score"), 0.3)
      .groupBy("dom").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDom === Map("big" -> 1350L, "mid" -> 120L, "small" -> 30L))
  }

  test("percentileGate: value-derived cutoffs are partitioning-independent, no persist") {
    // the round-6 form coupled correctness to spark_partition_id stability
    // (persist + deterministic-input caveat); the value-derived form must
    // give bit-identical output under ANY partitioning of the same rows,
    // WITHOUT caching anything — cache eviction / recomputation of a
    // hostile source can shift partition ids, but not row values
    val docs = (1L to 2000L).map { i =>
      (i, if (i % 3 == 0) "x" else "y", (i % 41).toDouble, -i)
    }.toDF("doc_id", "dom", "score", "payload")
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val base = Sampling.percentileGate(docs, "dom", "doc_id", col("score"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(spark.sparkContext.getPersistentRDDs.size === cachedBefore,
      "percentileGate must not persist anything")
    for (parts <- Seq(1, 7, 32)) {
      val again = Sampling.percentileGate(docs.repartition(parts),
          "dom", "doc_id", col("score"), 0.25)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(again === base, s"cut shifted under repartition($parts)")
    }
    // negative scores exercise the signed top-chunk level of the
    // DoubleOrderBits refinement
    val neg = Sampling.percentileGate(
        docs.withColumn("score", -col("score") - 1.0),
        "dom", "doc_id", col("score"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wNeg = org.apache.spark.sql.expressions.Window.partitionBy("dom")
      .orderBy((-col("score") - 1.0).desc,
        Sampling.coin(col("doc_id"), "pctl"), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("dom")
    val negExpected = docs
      .withColumn("rk", row_number().over(wNeg).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rk") <= ceil(lit(0.25) * col("n").cast("double")).cast("long"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(neg === negExpected)
  }

  test("epochShuffle: exact permutation, epoch-seeded, partitioning-independent") {
    val docs = (0L until 500L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val e1 = Sampling.epochShuffle(docs, "id", "sh", epoch = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // a PERMUTATION: every position 0..n-1 exactly once
    assert(e1.values.toSeq.sorted === (0L until 500L))
    // epoch seeding: a different epoch is a different order...
    val e2 = Sampling.epochShuffle(docs, "id", "sh", epoch = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(e2.values.toSeq.sorted === (0L until 500L))
    assert(e1 !== e2, "epochs must permute differently")
    // ...but the SAME epoch is bit-identical however the input is
    // partitioned (replayable training order — the whole point)
    for (parts <- Seq(1, 7, 32)) {
      val again = Sampling.epochShuffle(docs.repartition(parts), "id", "sh", epoch = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(again === e1, s"order differs under repartition($parts)")
    }
    // reserved/output names are refused, not clobbered
    assertThrows[IllegalArgumentException](
      Sampling.epochShuffle(docs.withColumn("pos", lit(1)), "id", "sh", 1))
  }

  test("mixtureResample: copy counts follow weights, deterministic, zero drops") {
    val docs = (1L to 400L).map { i =>
      (i, if (i <= 100) "up" else if (i <= 200) "down" else if (i <= 300) "gone" else "rest")
    }.toDF("doc_id", "source")
    val out = Sampling.mixtureResample(docs, "source", "doc_id",
      Map("up" -> 2.5, "down" -> 0.25, "gone" -> 0.0), defaultWeight = 1.0, salt = "t")
    val byDoc = out.groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val upCounts = (1L to 100L).map(i => byDoc.getOrElse((i, "up"), 0L))
    assert(upCounts.forall(c => c == 2L || c == 3L)) // floor(2.5) + coin
    assert(upCounts.sum > 200 && upCounts.sum < 300) // ~250 expected
    val downCounts = (101L to 200L).map(i => byDoc.getOrElse((i, "down"), 0L))
    assert(downCounts.forall(c => c == 0L || c == 1L))
    assert(downCounts.sum > 5 && downCounts.sum < 60) // ~25 expected
    assert((201L to 300L).forall(i => !byDoc.contains((i, "gone"))))
    assert((301L to 400L).forall(i => byDoc((i, "rest")) == 1L))
    // epoch indexes are 0..reps-1 per doc
    val epochs = out.filter(col("doc_id") === 1L).select("epoch")
      .collect().map(_.getLong(0)).sorted
    assert(epochs === (0L until epochs.length.toLong).toArray)
    // deterministic: rerun is identical
    val again = Sampling.mixtureResample(docs, "source", "doc_id",
      Map("up" -> 2.5, "down" -> 0.25, "gone" -> 0.0), defaultWeight = 1.0, salt = "t")
      .groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again === byDoc)
    assertThrows[IllegalArgumentException](
      Sampling.mixtureResample(docs, "source", "doc_id", Map("up" -> -1.0), 1.0, "t"))
    // reserved/output names must be refused, not clobbered
    assertThrows[IllegalArgumentException](
      Sampling.mixtureResample(docs.withColumn("epoch", lit(1)),
        "source", "doc_id", Map.empty, 1.0, "t"))
  }

  test("dsirSelect ranks target-like pool docs first and matches an in-memory reference") {
    // target speaks "apple banana cherry"; pool docs range from pure
    // target-vocabulary to pure off-vocabulary
    val target = (1L to 20L).map(i => (i, "apple banana cherry apple banana", true))
    val pool = Seq(
      (101L, "apple banana cherry apple", false),       // most target-like
      (102L, "apple banana zebra quark", false),        // mixed
      (103L, "zebra quark xylophone gnome", false),     // off-vocab
      (104L, "apple apple apple apple", false),
      (105L, "", false)                                 // zero tokens: unrankable
    )
    val df = (target ++ pool).toDF("doc_id", "text", "is_t")
    val out = Sampling.dsirSelect(df, "doc_id", "text", col("is_t"),
      buckets = 64, k = 3)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 3)
    // ranking: pure-target-vocab docs above mixed above none; 105 never appears
    assert(got.map(_._1).take(2).toSet === Set(101L, 104L))
    assert(got.map(_._1).contains(102L))
    assert(!got.map(_._1).contains(103L) && !got.map(_._1).contains(105L))
    assert(got.map(_._2).sliding(2).forall { case Array(a, b) => a >= b })

    // in-memory reference: same buckets, same add-one models, lnWide
    val P = graft.functions.PortableMath
    val B = 64
    def toks(s: String) = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def bkt(t: String) = java.lang.Math.floorMod(
      graft.functions.Hashing.planTimeH64(s"dsir:$t"), B.toLong)
    val tTok = target.flatMap(r => toks(r._2)).map(bkt)
    val rTok = pool.flatMap(r => toks(r._2)).map(bkt)
    val ct: Map[Long, Long] = tTok.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cr: Map[Long, Long] = rTok.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val constQ = math.floor((P.lnWide(rTok.size + B) - P.lnWide(tTok.size + B)) * 1e9 + 0.5).toLong
    def deltaQ(b: Long) = math.floor(
      (P.lnWide(ct.getOrElse(b, 0L) + 1) - P.lnWide(cr.getOrElse(b, 0L) + 1)) * 1e9 + 0.5).toLong
    val expect = pool.filter(r => toks(r._2).nonEmpty).map { r =>
      r._1 -> toks(r._2).map(t => deltaQ(bkt(t)) + constQ).sum
    }.sortBy(p => (-p._2, p._1)).take(3)
    assert(got.toSeq === expect)

    // partitioning independence: scores are exact integers
    val rep = Sampling.dsirSelect(df.repartition(13), "doc_id", "text",
      col("is_t"), buckets = 64, k = 3).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rep.toSeq === got.toSeq)
  }

  test("temperatureResample: small domains keep a larger FRACTION; deterministic") {
    import org.apache.spark.sql.functions.{length => slen}
    // big domain 10x the token mass of the small one
    val corpus = ((1L to 900L).map(i => (i, "w " * 10, "big")) ++
      (1001L to 1100L).map(i => (i, "w " * 10, "small")))
      .toDF("doc_id", "text", "source")
    val tokenCount = graft.ops.TextAnalysis.tokenCount(col("text"))
    val kept = Sampling.temperatureResample(corpus, "source", "doc_id",
        tokenCount, budget = 3000L, salt = "t")
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracBig = kept.getOrElse("big", 0L).toDouble / 900.0
    val fracSmall = kept.getOrElse("small", 0L).toDouble / 100.0
    // α = ½: rate ratio small/big = sqrt(10) ≈ 3.16 — well separated
    assert(fracSmall > fracBig * 2.0,
      s"temperature must boost the small domain: small=$fracSmall big=$fracBig")
    // deterministic + partitioning independent
    val a = Sampling.temperatureResample(corpus.repartition(1), "source", "doc_id",
      tokenCount, 3000L, "t").select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureResample(corpus.repartition(7, col("doc_id")), "source",
      "doc_id", tokenCount, 3000L, "t").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
    // a zero-token domain keeps nothing (NaN rate compares false)
    val z = corpus.unionByName(Seq((2000L, "", "empty")).toDF("doc_id", "text", "source"))
    assert(Sampling.temperatureResample(z, "source", "doc_id", tokenCount, 3000L, "t")
      .filter(col("source") === "empty").count() === 0L)
  }
}
