package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch probe for round-19 optimization experiments. */
object Scratch19 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("scratch19", Some("local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1L to 100000L).toDF("src").withColumn("dst", col("src") % 97)
    val part = df.repartition(8, col("src")).sortWithinPartitions("src")
    val cp = part.localCheckpoint()
    println("=== checkpointed logical plan ===")
    println(cp.queryExecution.optimizedPlan.treeString)
    println("=== physical partitioning of LogicalRDD ===")
    println(cp.queryExecution.executedPlan.outputPartitioning)
    println(cp.queryExecution.executedPlan.treeString)
    // does a keyed self-join over the checkpoint insert an exchange?
    val other = df.groupBy("src").agg(count(lit(1)).as("n"))
    val j = cp.join(other, "src")
    j.queryExecution.toRdd.count()
    println("=== join final plan ===")
    println(j.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
