package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for registered queries to per-query text
  * files — the optimization-round evidence trail (plans/rNN/<q>_before.txt /
  * _after.txt). Usage:
  *   PlanDump <sfDir> <outDir> <suffix> [nameRegex]
  * writes <outDir>/<query>_<suffix>.txt for every matching query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val only = args.drop(3).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-plandump", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val defs = graft.queries.Registry.all.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(r => n.matches(r)) }
    defs.foreach { case (name, d) =>
      try {
        val df = d.build(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] $name ok (${txt.count(_ == '\n')} lines)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
