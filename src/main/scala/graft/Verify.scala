package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Timestamp outputs go to parquet as TIMESTAMP_NTZ: Spark's TimestampType
    * (LTZ) writes isAdjustedToUTC=true → arrow timestamp[us, tz=UTC], while
    * the DuckDB oracle returns naive timestamp[us]; the driver's exact gate
    * compares arrow schemas, so the tz annotation alone turned 5 queries red
    * in round 3. Session tz is UTC, so the LTZ→NTZ cast is value-preserving. */
  private[graft] def ntz(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    df.schema.fields.collect { case f if f.dataType == TimestampType => f.name }
      .foldLeft(df)((d, c) => d.withColumn(c, d.col(c).cast("timestamp_ntz")))
  }

  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [onlyRegex] — the optional filter runs a subset
    // (dev iteration / re-adjudicating individual gate rows); oracle_sql
    // .json is filtered to match so scripts/check.py sees a closed set
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2).headOption)
    def selected(name: String): Boolean = only.forall(r => name.matches(r))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-verify", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // queries are independent; run a few concurrently (Spark schedules
    // concurrent jobs fine) to cut the driver's verify wall-clock
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val tasks = SparkEntry.queries.toSeq.filter(q => selected(q._1)).map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(q => selected(q._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // The DuckDB gate must NOT run while this JVM is still resident: the
    // Spark heap holds tens of GB and round 8 lost 3 gate rows to host
    // memory exhaustion. Exit hard — spark.stop() leaves non-daemon
    // threads (Derby, shuffle cleaners) that can keep the process alive.
    System.exit(0)
  }
}
