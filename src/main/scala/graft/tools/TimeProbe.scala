package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time arbitrary registry queries at a given SF dir. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = graft.GraftSession.builder("graft-probe", Some("local[32]"))
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names; _ <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.queries.Registry.all(n).build(spark, sfDir).queryExecution.toRdd.count(): Unit
      println(f"[probe] $n%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
