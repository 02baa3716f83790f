package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.Hashing
import graft.ops.{Dedup, TextAnalysis}

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", 32)
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, d)
    time("warmup")(docs.count())
    val toks = docs.select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("ts"))
    time("tokens")(toks.count())
    time("tokens_explode")(toks.select(explode(col("ts"))).count())
    val base = toks.select(col("id"), Dedup.shinglesFromTokens(col("ts"), 2).as("sh"))
    time("shingles")(base.count())
    val ex = base.select(col("id"), explode(col("sh")).as("s"))
    time("sh_explode")(ex.count())
    time("sh_explode2")(ex.count())
    val exh = ex.select(col("id"), Hashing.h32(col("s"), "mh").as("x"))
    time("sh_explode_md5")(exh.count())
    val aggs = (0 until 128).map(i => min(Hashing.affine(col("x"), i)).as(s"mh$i"))
    val sigs = exh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    time("sigs")(sigs.count())
    time("sigs2")(sigs.count())
    sigs.explain("formatted")
    spark.stop()
  }
}
