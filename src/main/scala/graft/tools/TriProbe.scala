package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dev probe: formatted plan + timing of graph_triangles. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("tri-probe", 32)
    val df = graft.queries.Registry.all("graph_triangles").build(spark, dir)
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    val t0 = System.nanoTime()
    println("rows=" + df.queryExecution.toRdd.count())
    println(f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
