package graft.tools

import org.apache.spark.sql.functions._

/** Round-20 phase breakdown of the maintenance leg's graph_recompute
  * (pairDegrees + triangles over the ×16 regime graph): times each
  * cumulative prefix of the triangles pipeline so the dominant phase is
  * measured, not guessed. Dev-only. */
object TriRecompProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-trirecomp", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[tri] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    val REP = sys.env.getOrElse("ADJ_REP", "16").toInt
    val regime = RegimeGraph(spark, sfDir, REP)
    val pre = regime.pairs.where(!regime.isChange).localCheckpoint()
    val ins = regime.pairs.where(regime.isChange).localCheckpoint()
    val edgeT = graft.delta.DeltaTable.forPath(spark,
      graft.Scratch.dir("graft-trirecomp") + "/e")
      .create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("u",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
    edgeT.append(pre)

    (1 to 3).foreach { i =>
      System.err.println(s"--- iter $i ---")
      val post = edgeT.toDF.unionAll(ins)
      val edges = post.select(col("u").as("src"), col("v").as("dst"))
      // phase 0: the raw union scan
      t("p0_scan") { run(post) }
      // phase 1: canonicalPairs (least/greatest + distinct)
      val und = edges.select(
          least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .where(col("u") =!= col("v")).distinct()
      t("p1_canonical") { run(und) }
      // phase 2: degrees
      val deg = und.select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      t("p2_degrees") { run(deg) }
      // phase 3: oriented frame incl. KeyedCheckpoint materialization
      val du = deg.select(col("node").as("u"), col("deg").as("du"))
      val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
      val lower = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val o = t("p3_orient_ckpt") {
        org.apache.spark.sql.graft.KeyedCheckpoint(
          und.join(du, "u").join(dv, "v")
            .select(when(lower, col("u")).otherwise(col("v")).as("s"),
              when(lower, col("v")).otherwise(col("u")).as("t"),
              when(lower, col("dv")).otherwise(col("du")).as("tdeg")), "s")
      }
      // phase 4: wedges + closing join + count
      val e1 = o.select(col("s"), col("t").as("b"), col("tdeg").as("bdeg"))
      val e2 = o.select(col("s"), col("t").as("c"), col("tdeg").as("cdeg"))
      val wedges = e1.join(e2, Seq("s"))
        .where(col("bdeg") < col("cdeg") ||
          (col("bdeg") === col("cdeg") && col("b") < col("c")))
        .select(col("s").as("a"), col("b"), col("c"))
      val tri = wedges.join(o.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
      t("p4_wedge_close") {
        run(tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("triangles")))
      }
      // reference: the full operator as the bench runs it
      t("full_recompute") {
        run(graft.ops.Graph.pairDegrees(post, "u", "v"))
        run(graft.ops.Graph.triangles(edges))
      }
      // V2: skip the defensive distinct (post IS canonical by construction)
      def trianglesOf(undIn: org.apache.spark.sql.DataFrame,
                      ckpt: String): Long = {
        val deg2 = undIn.select(col("u").as("node"))
          .unionAll(undIn.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val du2 = deg2.select(col("node").as("u"), col("deg").as("du"))
        val dv2 = deg2.select(col("node").as("v"), col("deg").as("dv"))
        val lower2 = col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v"))
        val oBase = undIn.join(du2, "u").join(dv2, "v")
          .select(when(lower2, col("u")).otherwise(col("v")).as("s"),
            when(lower2, col("v")).otherwise(col("u")).as("t"),
            when(lower2, col("dv")).otherwise(col("du")).as("tdeg"))
        val o2 = ckpt match {
          case "keyed" => org.apache.spark.sql.graft.KeyedCheckpoint(oBase, "s")
          case "plain" => oBase.localCheckpoint()
          case _ => oBase
        }
        val e1b = o2.select(col("s"), col("t").as("b"), col("tdeg").as("bdeg"))
        val e2b = o2.select(col("s"), col("t").as("c"), col("tdeg").as("cdeg"))
        val w2 = e1b.join(e2b, Seq("s"))
          .where(col("bdeg") < col("cdeg") ||
            (col("bdeg") === col("cdeg") && col("b") < col("c")))
          .select(col("s").as("a"), col("b"), col("c"))
        val tri2 = w2.join(o2.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
        run(tri2.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("triangles")))
      }
      t("v2_nodistinct_keyed") {
        run(graft.ops.Graph.pairDegrees(post, "u", "v"))
        trianglesOf(post, "keyed")
      }
      t("v3_nodistinct_plain") {
        run(graft.ops.Graph.pairDegrees(post, "u", "v"))
        trianglesOf(post, "plain")
      }
      t("v4_nodistinct_lazy") {
        run(graft.ops.Graph.pairDegrees(post, "u", "v"))
        trianglesOf(post, "lazy")
      }
      // V5: one checkpoint of the scanned pair set shared by both actions
      t("v5_shared_ckpt") {
        val p2c = post.localCheckpoint()
        run(graft.ops.Graph.pairDegrees(p2c, "u", "v"))
        trianglesOf(p2c, "keyed")
      }
      // V6 (what the bench ships since round 20): degrees aggregated
      // ONCE — the published degree frame feeds the triangle orientation
      t("v6_shared_degrees") {
        val deg6 = graft.ops.Graph.pairDegrees(post, "u", "v").localCheckpoint()
        run(deg6)
        run(graft.ops.Graph.trianglesCanonical(post, Some(deg6)))
      }
    }
    spark.stop()
  }
}
