package graft.ops

import org.apache.spark.sql.DataFrame
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

  test("training is deterministic across runs and repartitionings") {
    val a = Similarity.trainIvfCentroids(corpus, "id", "v", numCentroids = 3, iters = 3)
    val b = Similarity.trainIvfCentroids(corpus.repartition(7), "id", "v",
      numCentroids = 3, iters = 3)
    // seeding is md5-ordered (partitioning-independent); means are fp
    // aggregations whose partial order may vary, so compare to a tolerance
    assert(a.length === 3 && b.length === 3)
    a.zip(b).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-4f) }
    }
    // empty-cell guard: k larger than distinct directions still yields k
    val wide = Similarity.trainIvfCentroids(corpus, "id", "v", numCentroids = 10, iters = 2)
    assert(wide.length === 10)
  }
}
