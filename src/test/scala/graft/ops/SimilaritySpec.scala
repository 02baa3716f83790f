package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, round}
import graft.SparkSpec

/** k-means IVF codebook training: on a corpus with planted direction
  * clusters whose ids are grouped (so the first-N stand-in codebook is
  * degenerate — every seed from one cluster), the trained codebook must
  * recover the clusters, lift recall to ~1, and be deterministic.
  * (ivfTopK's search plumbing itself is oracle-gated as sim_topk_ivf.) */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private val perCluster = 30
  // three orthogonal direction clusters; jitter is deterministic arithmetic
  private def vec(cluster: Int, i: Int): Array[Float] =
    Array.tabulate(dims) { d =>
      val base = if (d == 2 * cluster || d == 2 * cluster + 1) 1.0f else 0.0f
      base + ((i * 37 + d * 13) % 7 - 3) * 0.1f
    }

  // ids grouped by cluster: 0-29 cluster 0, 30-59 cluster 1, 60-89 cluster 2
  private lazy val corpus: DataFrame = (0 until 3 * perCluster)
    .map(id => (id.toLong, vec(id / perCluster, id).toSeq))
    .toDF("id", "v")

  // two probes per cluster, offset jitter so they're no corpus member
  private lazy val queries: DataFrame = (0 until 6)
    .map(q => ((1000 + q).toLong, vec(q % 3, 500 + q).toSeq))
    .toDF("id", "v")

  private def resultPairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("trained centroids recover planted clusters and beat the first-N codebook") {
    val truth = resultPairs(
      Similarity.bruteForceTopK(corpus, "id", "v", queries, "id", "v", k = 5))

    def recall(found: Set[(Long, Long)]): Double =
      (truth & found).size.toDouble / truth.size

    val firstN = recall(resultPairs(Similarity.ivfTopK(
      corpus, "id", "v", queries, "id", "v", k = 5, numCentroids = 3, nprobe = 1)))

    val trained = Similarity.trainIvfCentroids(corpus, "id", "v", numCentroids = 3)
    val trainedRecall = recall(resultPairs(Similarity.ivfTopK(
      corpus, "id", "v", queries, "id", "v", k = 5, centroids = trained, nprobe = 1)))

    // degenerate seeds (all from cluster 0) scatter each cluster's members
    // across cells; Lloyd iterations must separate the three directions
    assert(trainedRecall >= 0.99, s"trained recall $trainedRecall")
    assert(trainedRecall > firstN,
      s"training must improve on the first-N stand-in ($firstN)")

    // each trained centroid points at one distinct planted direction
    val domDims = trained.map(c => c.zipWithIndex.maxBy(_._1.abs)._2 / 2).toSet
    assert(domDims === Set(0, 1, 2), s"centroids $trained")
  }

  test("training is BIT-identical across runs and repartitionings") {
    val a = Similarity.trainIvfCentroids(corpus, "id", "v", numCentroids = 3, iters = 3)
    // seeding is md5-ordered AND the Lloyd mean is exact integer-scaled
    // sums (round-6 fix): the codebook must be bit-identical however the
    // corpus is partitioned, not merely within fp tolerance
    for (parts <- Seq(1, 7, 32)) {
      val b = Similarity.trainIvfCentroids(corpus.repartition(parts), "id", "v",
        numCentroids = 3, iters = 3)
      assert(a === b, s"codebook differs under repartition($parts)")
    }
    // empty-cell guard: k larger than distinct directions still yields k
    val wide = Similarity.trainIvfCentroids(corpus, "id", "v", numCentroids = 10, iters = 2)
    assert(wide.length === 10)
  }

  test("IVF cell-partitioned layout: probes read only nprobe cells' files, same results") {
    val trained = Similarity.trainIvfCentroids(corpus, "id", "v", numCentroids = 3, iters = 3)
    val path = tmpDir("ivf-layout")
    val table = Similarity.writeIvfAssigned(corpus, "id", "v", trained, path)

    // every live file belongs to exactly one cell=<id> partition
    val files = table.snapshot.files
    assert(files.nonEmpty)
    assert(files.forall(_.partitionValues.contains("cell")))
    val cellsOnDisk = files.flatMap(_.partitionValues.get("cell")).toSet
    assert(cellsOnDisk.size === 3, s"expected 3 cell partitions, got $cellsOnDisk")

    // a 1-cell probe must read only that cell's files: ≤ nprobe/numCentroids
    // of the table (the claim ivfTopK's scaladoc makes)
    val prunedAll = table.scanInFiles("cell", Seq(0L, 1L, 2L))
    assert(prunedAll.map(_.path).toSet === files.map(_.path).toSet)
    for (cell <- Seq(0L, 1L, 2L)) {
      val pruned = table.scanInFiles("cell", Seq(cell))
      assert(pruned.nonEmpty && pruned.size <= files.size / 3,
        s"cell $cell read ${pruned.size} of ${files.size} files")
      assert(pruned.forall(_.partitionValues.get("cell").contains(cell.toString)))
    }

    // and the pruned probe returns exactly what the unpartitioned path does
    val viaDelta = Similarity.ivfTopKDelta(spark, path, "id", "v",
      queries, "id", "v", k = 5, trained, nprobe = 2)
    val viaDirect = Similarity.ivfTopK(corpus, "id", "v",
      queries, "id", "v", k = 5, trained, nprobe = 2)
    assert(resultPairs(viaDelta) === resultPairs(viaDirect))
    assert(resultPairs(viaDelta).nonEmpty)
  }

  test("IVF-PQ: trained codebooks are bit-identical across partitionings; refine recovers exact top-k") {
    val cellCents = Similarity.trainIvfCentroids(corpus, "id", "v", numCentroids = 3, iters = 3)
    val a = Similarity.trainPqCodebooks(corpus, "id", "v", cellCents,
      numSubspaces = 2, ksub = 4, iters = 3)
    assert(a.length === 2 && a.forall(_.length === 4))
    // same exact-integer-mean + md5-seed contract as the cell codebook:
    // bit-identical however the corpus is partitioned
    for (parts <- Seq(1, 7, 32)) {
      val b = Similarity.trainPqCodebooks(corpus.repartition(parts), "id", "v",
        cellCents, numSubspaces = 2, ksub = 4, iters = 3)
      assert(a === b, s"PQ codebook differs under repartition($parts)")
    }
    // with a shortlist covering every candidate, the ADC ordering cannot
    // lose anything: the refined output must EQUAL the exact IVF ranking
    val pq = Similarity.ivfPqTopK(corpus, "id", "v", queries, "id", "v",
      k = 5, cellCents, nprobe = 2, a, shortlist = 3 * perCluster)
    val ivf = Similarity.ivfTopK(corpus, "id", "v", queries, "id", "v",
      k = 5, cellCents, nprobe = 2)
    assert(resultPairs(pq) === resultPairs(ivf))
    assert(resultPairs(pq).nonEmpty)
    // with a TIGHT shortlist the ADC ordering is load-bearing: an 8-deep
    // shortlist of ~60 candidates must still find nearly all of the true
    // top-5 (4-codeword subspaces can blur in-cluster rank-5 ties, so the
    // pin is a recall floor, not exact equality — exactness at scale is
    // the sim_topk_ivfpq hash gate's job, with its calibrated shortlist)
    val tight = Similarity.ivfPqTopK(corpus, "id", "v", queries, "id", "v",
      k = 5, cellCents, nprobe = 2, a, shortlist = 8)
    val truth = resultPairs(ivf)
    val recall = (resultPairs(tight) & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"tight-shortlist recall $recall")
  }

  test("range search: brute matches an in-plan ground truth; IVF-pruned is a subset with full in-cell recall") {
    val exact = Similarity.rangeSearch(corpus, "id", "v", queries, "id", "v", minCos = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // ground truth via the cosine column directly (no broadcast/range path)
    val truth = corpus.alias("c").crossJoin(queries.alias("q"))
      .select(col("q.id").as("qid"), col("c.id").as("nid"),
        round(Similarity.cosine(col("q.v"), col("c.v")), 6).as("cos"))
      .filter(col("cos") >= 0.5 && col("qid") =!= col("nid"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(exact === truth)
    assert(exact.nonEmpty) // planted clusters guarantee in-radius members

    // IVF: subset of exact, and every match in a probed cell is found —
    // with nprobe = numCentroids it degenerates to the exact result
    val pruned = Similarity.ivfRangeSearch(corpus, "id", "v", queries, "id", "v",
      minCos = 0.5, numCentroids = 3, nprobe = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pruned.keySet.subsetOf(exact.keySet))
    assert(pruned.forall { case (k, v) => exact(k) === v })
    val full = Similarity.ivfRangeSearch(corpus, "id", "v", queries, "id", "v",
      minCos = 0.5, numCentroids = 3, nprobe = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(full === exact)
  }

  test("JL projection preserves planted-cluster cosine structure at 1/4 the dims") {
    val proj = Similarity.jlProject(corpus, "id", "v", outDims = 4, dims = dims)
    val rows = proj.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.values.forall(_.length === 4))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // same planted cluster stays similar, different clusters stay apart
    val perCluster = rows.keys.max.toInt / 3 + 1
    val (a1, a2) = (rows(0L), rows(1L))              // cluster 0
    val c1 = rows(perCluster.toLong)                 // cluster 1
    assert(cos(a1, a2) > 0.5, s"intra-cluster cosine collapsed: ${cos(a1, a2)}")
    assert(cos(a1, c1) < cos(a1, a2), "inter-cluster not separated after projection")
    // deterministic across partitionings
    val again = Similarity.jlProject(corpus.repartition(7), "id", "v", 4, dims)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.keys === again.keys)
    rows.foreach { case (k, v) => assert(v.toSeq === again(k).toSeq) }
  }

  test("int8 quantization bounds dequantization error; zero vector is safe") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Seq(100.0f, -50.0f, 0.0f, 1.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "v")
    val out = Similarity.quantizeInt8(vecs, "vec_id", "v")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    // codes clamp to [-127, 127] and the max-|x| element hits ±127 exactly
    assert(out(1L)._2.max === 63 || out(1L)._2.contains(-127))
    assert(out(2L)._2.contains(127) && out(2L)._2.forall(q => q >= -127 && q <= 127))
    // zero vector: scale 0, all-zero codes, no Inf/NaN
    assert(out(3L) === ((0.0, Seq(0, 0, 0, 0))))
    // dequantization error is at most half a step (1 / (2·scale))
    for ((id, (scale, qs)) <- out if scale > 0) {
      val orig = vecs.filter(org.apache.spark.sql.functions.col("vec_id") === id)
        .head().getSeq[Float](1)
      qs.zip(orig).foreach { case (q, x) =>
        assert(math.abs(q / scale - x) <= 0.5 / scale + 1e-9, s"id=$id q=$q x=$x")
      }
    }
  }

  test("ivfTopKFiltered: neighbors satisfy the predicate; trivial predicate degenerates to ivfTopK") {
    val k = 4
    // predicate: even ids only
    val filtered = Similarity.ivfTopKFiltered(corpus, "id", "v",
      col("id") % 2 === 0, queries, "id", "v", k, numCentroids = 8, nprobe = 8)
    val rows = filtered.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 % 2 == 0), "a filtered search must never return a non-matching row")
    // all k slots fill with matching rows (pre-filter, not post-filter)
    val perQuery = rows.groupBy(_._1).values
    assert(perQuery.forall(_.length == k))
    assert(perQuery.forall(_.map(_._3).sorted.toSeq == (1L to k)))
    // an always-true predicate is exactly the unfiltered search
    val trivial = Similarity.ivfTopKFiltered(corpus, "id", "v",
      col("id") >= 0, queries, "id", "v", k, numCentroids = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val unfiltered = Similarity.ivfTopK(corpus, "id", "v",
      queries, "id", "v", k, numCentroids = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(trivial === unfiltered)
  }

  test("kCenterSelect: greedy farthest-point invariants on a planted grid") {
    import spark.implicits._
    // four tight clusters at the corners of a square + noise points near
    // the origin cluster: the first four picks must hit all four corners
    val pts = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0.01f, 0f)), (2L, Seq(0f, 0.01f)),
      (10L, Seq(10f, 0f)), (11L, Seq(10f, 0.01f)),
      (20L, Seq(0f, 10f)), (21L, Seq(0.01f, 10f)),
      (30L, Seq(10f, 10f)), (31L, Seq(10f, 9.99f)))
    val df = pts.toDF("id", "v")
    val sel = Similarity.kCenterSelect(df, "id", "v", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(sel.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(sel.head._2 === 0L, "seed = lowest id")
    assert(sel.map(_._2 / 10).toSet === Set(0L, 1L, 2L, 3L),
      s"first four picks must cover the four corners, got ${sel.toSeq}")
    // selection radii are non-increasing (the greedy k-center invariant)
    val radii = sel.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b })
  }

  test("kCenterSelect: k past the corpus size exhausts cleanly; ids distinct") {
    import spark.implicits._
    val df = Seq((5L, Seq(1f, 0f)), (6L, Seq(0f, 1f)), (7L, Seq(1f, 1f)))
      .toDF("id", "v")
    val sel = Similarity.kCenterSelect(df, "id", "v", k = 10).collect()
    assert(sel.length === 3)
    assert(sel.map(_.getLong(1)).toSet === Set(5L, 6L, 7L))
  }

  test("kCenterSelect: per-round checkpoint state is (id, dmin) — no vector column") {
    import spark.implicits._
    // round I/O must be independent of vector width: the state that gets
    // re-materialized each round may carry only the 16-byte (id, dmin)
    // pair; vectors live solely in the once-checkpointed base frame
    val df = (0L until 40L).map(i => (i, Seq((i % 7).toFloat, (i % 5).toFloat,
      (i % 3).toFloat))).toDF("id", "v")
    var probed = 0
    val sel = Similarity.kCenterSelect(df, "id", "v", k = 5,
      stateProbe = st => {
        probed += 1
        assert(st.schema.fieldNames.toSeq === Seq("id", "dmin"),
          s"round state must be (id, dmin), got ${st.schema.fieldNames.toSeq}")
        assert(!st.schema.fieldNames.contains("qv"))
      }).collect()
    assert(sel.length === 5)
    assert(probed >= 4, "probe must observe each round's checkpointed state")
  }
}
