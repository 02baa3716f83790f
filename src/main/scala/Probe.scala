import graft._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("probe", Some("local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s   ($r)")
    }
    def run(df: org.apache.spark.sql.DataFrame): Long = df.queryExecution.toRdd.count()

    val d = queries.Registry.all("dedup_ngram_jaccard")
    // bench-identical: warm at sf0.001, measure fresh at sf0.1
    run(d.build(spark, "/root/testdata/sf0.001"))
    time("registry ngram (bench-identical)")(run(d.build(spark, "/root/testdata/sf0.1")))
    time("registry ngram #2")(run(d.build(spark, "/root/testdata/sf0.1")))
    println(d.build(spark, "/root/testdata/sf0.1").queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
