package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch probe for round-19 optimization experiments. */
object Scratch19 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("scratch19", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docs = graft.Tables.documents(spark, sf)
    val docsR = docs.repartition(cpus.toInt)
    // warm
    graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", 3).queryExecution.toRdd.count()
    for (i <- 1 to 3) {
      time("simhash single-split")(
        graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", 3)
          .queryExecution.toRdd.count(): Unit)
      time("simhash rebalanced")(
        graft.ops.Dedup.simhashPairs(docsR, "doc_id", "text", 3)
          .queryExecution.toRdd.count(): Unit)
    }

    // pushdown probes: does a filter/projection cross a Repartition?
    val li = graft.Tables.lineitem(spark, sf).repartition(cpus.toInt)
    val q = li.where(col("l_quantity") > 45).select(col("l_orderkey"))
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println("PushedFilters line: " + plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString(" | "))
    println("ReadSchema line: " + plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString(" | "))
    spark.stop()
  }
}
