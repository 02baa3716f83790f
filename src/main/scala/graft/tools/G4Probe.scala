package graft.tools

/** Round-20 G4 mechanism probe (dev-only, never part of the bench):
  * the full bench reads heavy graph queries 1.5-2.3 s slower than the
  * same query benched alone (r19 G4 finding, diagnosed as page-cache
  * displacement — but the whole sf0.1 input is ~17 MB against 122 GB of
  * free RAM, so that hypothesis deserves a direct test). Candidate
  * mechanism: localCheckpoint blocks (MEMORY_AND_DISK) accumulate per
  * query × iteration and are never unpersisted, so late-alphabet graph
  * queries run against a polluted storage pool / block manager.
  *
  * Protocol: warmup exactly like Bench, measure graph_pagerank fresh,
  * run one full alphabetical iteration (the bench's interleave), measure
  * graph_pagerank again (inflated?), unpersist every lingering RDD +
  * System.gc(), measure a third time. If the third reading snaps back
  * to the fresh one, accumulation is the cause; if not, it is ambient.
  */
object G4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-g4probe", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = graft.queries.Registry.all
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      all(name).build(spark, sfDir).queryExecution.toRdd.count(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    def storage(): String = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum / (1L << 20)
      val disk = infos.map(_.diskSize).sum / (1L << 20)
      s"rdds=${infos.length} mem=${mem}MB disk=${disk}MB"
    }
    val names = all.filter(_._2.headline).keys.toSeq.sorted
    val warm = new java.io.File(sfDir).getParent + "/sf0.001"
    names.foreach(n => all(n).build(spark, warm).queryExecution.toRdd.count(): Unit)
    graft.ops.ZipfCorpus.table(spark, sfDir).queryExecution.toRdd.count(): Unit
    println(s"[g4] after warmup: ${storage()}")

    val fresh = (1 to 2).map(_ => run("graph_pagerank"))
    println(f"[g4] pagerank_fresh=${fresh.mkString(",")} ${storage()}")

    names.foreach { n =>
      val s = run(n)
      println(f"[g4] iter1 $n%-26s $s%.3f ${storage()}")
    }
    val inflated = (1 to 2).map(_ => run("graph_pagerank"))
    println(f"[g4] pagerank_inflated=${inflated.mkString(",")} ${storage()}")

    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    Thread.sleep(1000)
    println(s"[g4] after unpersist: ${storage()}")
    val cleaned = (1 to 2).map(_ => run("graph_pagerank"))
    println(f"[g4] pagerank_after_unpersist=${cleaned.mkString(",")} ${storage()}")
    spark.stop()
  }
}
