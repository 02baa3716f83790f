package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: stage-level timing of Dedup.semanticDedup to attribute
  * its bench cost. Round-9 findings: the Lloyd iteration's posexplode
  * re-evaluated the sibling k-cosine assignment per generated row
  * (fixed — split selects), and the propagation loop's separate
  * convergence join doubled its per-iteration job count (fixed — the
  * changed flag rides the label aggregation). */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("sem-probe", Some("local[32]"))
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.Tables.embeddings(spark, sfDir)
    (1 to 2).foreach { round =>
      println(s"[probe] ---- round $round ----")
      val cents = time("trainIvfCentroids") {
        graft.ops.Similarity.trainIvfCentroids(emb, "vec_id", "embedding", 8, 2)
      }
      val edges = graft.ops.Dedup.semanticPairs(emb, "vec_id", "embedding",
        cents, lit(1.0) - lit(0.7))
      println(s"[probe] edges = ${time("semanticPairs.count")(edges.count())}")
      time("duplicateClusters (build+run)") {
        graft.ops.Dedup.duplicateClusters(edges).count()
      }
      time("full semanticDedup") {
        graft.ops.Dedup.semanticDedup(emb, "vec_id", "embedding", 8, 0.7, 2).count()
      }
    }
    spark.stop()
  }
}
