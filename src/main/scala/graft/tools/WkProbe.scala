package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dev probe: plan + codegen health of sample_weighted_k. */
object WkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local("wk-probe", 8)
    val df = graft.queries.Registry.all("sample_weighted_k").build(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // how large is each stage's sort/window input expression set?
    println(p.take(6000))
    spark.stop()
  }
}
