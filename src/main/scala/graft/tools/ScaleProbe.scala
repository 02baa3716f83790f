package graft.tools

import org.apache.spark.sql.functions._

/** Round-20 scaling artifact (dev-only; VERDICT item 6). The r19
  * scaling block showed NO headline query runs faster on 32 cores than
  * on 8 at sf0.1 — at a ~17 MB fixture, per-job fixed overhead and
  * 32-way shuffle partitioning dominate, so the bench cannot exhibit
  * parallel speedup at its own scale. This probe measures the same
  * operator kernels at a corpus size where compute dominates: a
  * deterministic MULT× replica of the sf documents table (doc_ids
  * remapped by copy index; written to scratch parquet once per run,
  * untimed), timed via `queryExecution.toRdd.count()` min-of-3 — the
  * bench's own methodology.
  *
  * Pair-enumeration operators (simhash/minhash/jaccard) are
  * deliberately absent: replicating a corpus makes every doc an exact
  * near-dup of its copies, so pair counts would grow quadratically in
  * MULT and the probe would measure the blow-up, not scaling.
  *
  * Usage: ScaleProbe <sfDir> [mult]   (core count from SPARK_GRAFT_CPUS)
  * Prints one JSON line {"cores":N,"mult":M,"rows":R,"queries":{...}};
  * run it at two core counts and compare — the scaling table in
  * OPTIMIZATION_r20.md was produced exactly this way.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-scaleprobe", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    val scaled = (0 until mult).map(i =>
        docs.select((col("doc_id") + lit(i * maxId)).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    val dir = graft.Scratch.dir(s"graft-scaleprobe-x$mult")
    scaled.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val rows = corpus.count()

    import graft.ops.TextAnalysis
    import graft.ops.TextAnalysis.tokens
    // small deterministic training fixture — the kernel under test is
    // the encode, not the training; the vocab just has to be non-trivial
    val counts: Seq[(String, Long)] = Seq(
      "the" -> 900L, "and" -> 700L, "data" -> 500L, "spark" -> 400L,
      "query" -> 350L, "scale" -> 300L, "table" -> 250L, "join" -> 200L,
      "shuffle" -> 150L, "kernel" -> 120L, "text" -> 100L, "token" -> 90L,
      "parquet" -> 80L, "column" -> 70L, "filter" -> 60L, "window" -> 50L)
    val vocab = TextAnalysis.trainWordPieceFromCounts(counts, 16)
    val bm25Terms = Seq("the", "data", "spark", "query", "scale")

    def timed(df: => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }.min

    val queries = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      // scan-stage kernel floor queries (the r19/20 floor family)
      "wordpiece_encode" -> (() => corpus.select(col("doc_id"),
        graft.functions.WordPieceEncode.of(tokens(col("text")), vocab, 20).as("p"))
        .select(col("doc_id"), size(col("p")).cast("long").as("n"))),
      "quality" -> (() => corpus.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))),
      // shuffle paths: explode+aggregate and the bm25 scan+join shape
      "vocab_topk" -> (() => corpus
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(100)),
      "bm25" -> (() => TextAnalysis.bm25Scores(corpus, "doc_id", "text", bm25Terms)))

    val results = queries.map { case (name, build) =>
      spark.sparkContext.setJobDescription(s"scaleprobe:$name")
      name -> timed(build())
    }
    val qjson = results.map { case (n, s) => s""""$n":$s""" }.mkString(",")
    println(s"""{"cores":$cpus,"mult":$mult,"rows":$rows,"queries":{$qjson}}""")
    spark.stop()
  }
}
