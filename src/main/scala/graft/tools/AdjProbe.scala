package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway profiling probe for the bucketed triangle-IVM fold (round
  * 19): times each phase of graft.ops.Graph.triangleDeltaBucketed
  * against the bench's sf graph so stage overhead vs data work is
  * visible. Not part of any gate. */
object AdjProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-adjprobe", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val REP = sys.env.getOrElse("ADJ_REP", "8").toInt
    val B = sys.env.getOrElse("ADJ_B", "2048").toInt
    // fixture shared with the Bench maintenance leg — one definition
    val regime = RegimeGraph(spark, sfDir, REP)
    val pre = regime.pairs.where(!regime.isChange).localCheckpoint()
    val ins = regime.pairs.where(regime.isChange).localCheckpoint()
    System.err.println(s"[probe] |pre|=${pre.count()} |ins|=${ins.count()}")
    val changes = ins.select(col("u").as("a"), col("v").as("b"))
      .withColumn("_change_type", lit("insert"))
    val degPre = graft.ops.Graph.pairDegrees(pre, "u", "v").localCheckpoint()
    val triPre = graft.ops.Graph.triangles(
      pre.select(col("u").as("src"), col("v").as("dst"))).localCheckpoint()
    val mirror = graft.ops.Graph.createAdjacencyMirror(
      graft.delta.DeltaTable.forPath(spark,
        graft.Scratch.dir("graft-adjprobe") + "/m"), numBuckets = B)
    t("seed") { graft.ops.Graph.seedAdjacencyMirror(mirror, pre) }
    // Delta-backed edge table: the steady state every leg reads in the
    // deployment scenario (maintained state lives in Delta, not RAM)
    val edgeT = graft.delta.DeltaTable.forPath(spark,
      graft.Scratch.dir("graft-adjprobe-e") + "/e")
      .create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("u",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
    t("seed_edges") { edgeT.append(pre) }
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // phase breakdown of the bucketed path
    locally {
      val netted = changes.select(
        least(col("a"), col("b")).cast("long").as("u"),
        greatest(col("a"), col("b")).cast("long").as("v"))
      val bkts = t("bkts_collect") {
        netted.select(pmod(col("u"), lit(B.toLong)).cast("int").as("k"))
          .unionAll(netted.select(pmod(col("v"), lit(B.toLong)).cast("int").as("k")))
          .distinct().collect().map(_.getInt(0)).toSeq
      }
      System.err.println(s"[probe] |bkts|=${bkts.size}")
      val files = t("scanInFiles") { mirror.scanInFiles("bkt", bkts) }
      System.err.println(s"[probe] pruned files=${files.size} of ${mirror.snapshot.files.size}")
      t("scanIn_read") { run(mirror.scanIn("bkt", bkts)) }
      t("scanIn_ckpt") { mirror.scanIn("bkt", bkts)
        .select(col("m"), col("x")).localCheckpoint() }
    }
    // warm
    (1 to 3).foreach { i =>
      System.err.println(s"--- iter $i ---")
      t("deg_fold") { run(graft.ops.Graph.applyDegreeDelta(degPre,
        graft.ops.Graph.degreeDelta(changes))) }
      t("tri_fold_bucketed") { run(graft.ops.Graph.applyTriangleDelta(triPre,
        graft.ops.Graph.triangleDeltaBucketed(mirror, changes))) }
      t("tri_fold_scan") { run(graft.ops.Graph.applyTriangleDelta(triPre,
        graft.ops.Graph.triangleDelta(edgeT.toDF, changes))) }
      t("recompute") {
        val post = edgeT.toDF.unionAll(ins)
        run(graft.ops.Graph.pairDegrees(post, "u", "v"))
        run(graft.ops.Graph.triangles(
          post.select(col("u").as("src"), col("v").as("dst"))))
      }
    }
    spark.stop()
  }
}
