package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Dev-only: stage-by-stage timing of the minhashLsh sub-plans to locate
  * where the bench seconds go. Not part of any gate. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("dedup-profile", 32)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      // NOTE: passing a pre-built val evaluates the SAME DataFrame each
      // iteration, so iterations 2+ of shuffle-bearing plans reuse the
      // first run's shuffle files (skipped stages) — for those, the FIRST
      // iteration is the honest cost; min is honest only for shuffle-free
      // plans. graft.Bench rebuilds the plan per iteration and has no
      // such artifact.
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s min=${ts.min}%.3f ${ts.map(t => f"$t%.3f").mkString("[", " ", "]")}")
    }

    val docs = Tables.documents(spark, sf)
    import graft.ops.Dedup
    import graft.functions.{Hashing, MinHashSig, ShingleHashes}

    val base = docs.select(col("doc_id").as("id"), graft.ops.TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("id"), ShingleHashes.of(col("ts"), 3, "mh").as("hsh"))
    time("tokens_only")(docs.select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("ts")))
    time("base=shingle_hashes")(base)
    time("exH_explode")(base.select(col("id"), size(col("hsh")).cast("long").as("sz"), explode(col("hsh")).as("h")))
    val withSig = base.filter(size(col("hsh")) > 0)
      .select(col("id"), MinHashSig.of(col("hsh"), 128).as("mh"))
    time("withSig=minhash_sig")(withSig)
    val bands = 32; val rows = 128 / bands
    val banded = withSig.select(col("id"),
      posexplode(array((0 until bands).map { b =>
        Hashing.h64(array_join(slice(col("mh"), b * rows + 1, rows).cast("array<string>"), ","), s"band$b")
      }: _*)).as(Seq("band", "bucket")))
    time("banded")(banded)
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("cand=self_join")(cand)
    time("full_minhashLsh")(Dedup.minhashLsh(docs, "doc_id", "text"))
    spark.stop()
  }
}
