package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry}

/** Manual end-to-end smoke: drives SparkEntry.entry (the flagship streaming
  * ingest → Delta log → read-back) exactly as the harness driver does, and
  * prints the ingested table + txn idempotence check. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-smoke", cores = 8)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] flagship rows: $n")
    df.orderBy(col("event_id")).show(5, truncate = false)
    println("[smoke] partitions: " + df.select("date").distinct().count())
    spark.stop()
    assert(n > 0, "flagship returned no rows")
  }
}
