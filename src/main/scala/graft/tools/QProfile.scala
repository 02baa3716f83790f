package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query profiler: runs one registered query N times (toRdd.count, the
  * bench's timed action) with a listener that attributes wall-clock to jobs
  * and stages — task counts, executor run/CPU time, shuffle bytes, input
  * bytes — so optimization targets the stage that actually costs, not the
  * one that looks expensive in the plan. Dev-only; never part of the bench.
  *
  * Usage: QProfile <sfDir> <queryName> [iters]
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-qprofile", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class StageRow(name: String, tasks: Int, wallMs: Long,
        runMs: Long, cpuMs: Long, inBytes: Long, shRead: Long, shWrite: Long)
    val stages = mutable.ArrayBuffer.empty[StageRow]
    val jobs = mutable.Map.empty[Int, Long]
    val jobRows = mutable.ArrayBuffer.empty[(Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs(e.jobId) = e.time
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.remove(e.jobId).foreach { t0 =>
          jobRows += ((e.jobId, e.time - t0, ""))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages += StageRow(
          si.name.takeWhile(_ != '\n').take(90),
          si.numTasks,
          (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.inputMetrics.bytesRead,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val d = graft.queries.Registry.all(qname)
    val dumpFinalPlan = sys.env.get("QPROFILE_FINAL_PLAN").contains("1")
    def run(): Double = {
      val t0 = System.nanoTime()
      val df = d.build(spark, sfDir)
      df.queryExecution.toRdd.count(): Unit
      val sec = (System.nanoTime() - t0) / 1e9
      if (dumpFinalPlan)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sec
    }
    // warmup on sf0.001 like the bench
    val warmDir = new java.io.File(sfDir).getParent + "/sf0.001"
    run _ // keep linter quiet
    try d.build(spark, warmDir).queryExecution.toRdd.count(): Unit
    catch { case e: Throwable => System.err.println(s"warmup failed: ${e.getMessage}") }

    (1 to iters).foreach { it =>
      stages.clear(); jobRows.clear()
      val sec = run()
      Thread.sleep(300) // let the listener bus drain
      println(f"=== $qname iter $it: $sec%.3f s, ${jobRows.size} jobs, ${stages.size} stages ===")
      println(f"  jobs (wall ms): ${jobRows.sortBy(_._1).map(_._2).mkString(" ")}")
      val byCost = stages.sortBy(-_.wallMs)
      byCost.take(25).foreach { s =>
        println(f"  stage wall=${s.wallMs}%6d ms tasks=${s.tasks}%4d run=${s.runMs}%7d cpu=${s.cpuMs}%7d " +
          f"in=${s.inBytes / 1024}%8d KiB shR=${s.shRead / 1024}%7d KiB shW=${s.shWrite / 1024}%7d KiB  ${s.name}")
      }
      val totalWall = stages.map(_.wallMs.max(0)).sum
      println(f"  sum(stage wall)=${totalWall} ms over ${stages.size} stages")
    }
    spark.stop()
  }
}
