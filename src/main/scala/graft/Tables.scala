package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness test tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst's pushdown / pruning
  * applies: callers `.select`/`.filter` and the scan reads only what is
  * needed (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$sfDir/$table.parquet"))

  /** Minimum rows per task for the rebalance target: a task's fixed
    * scheduling cost only amortizes over some work, so tiny tables never
    * rebalance (region's 5 rows stay one partition) — derived from
    * per-task overhead, not from any particular machine's core count. */
  private val MinRowsPerTask = 128L

  /** OPT-IN scan-parallelism floor for queries dominated by a heavy
    * per-row scan-stage kernel. The harness fixtures are single-file,
    * SINGLE-ROW-GROUP parquet, so such kernels (simhash signatures, BPE/
    * WordPiece encodes, the gopher quality battery) would otherwise run
    * as ONE task regardless of core count — measured 1.7 s → 1.0 s on
    * simhashPairs at sf0.1 just by restoring parallelism. When a table's
    * effective split count (min of byte-range splits and row groups) is
    * below what the scheduler could use AND the row count amortizes the
    * extra tasks, insert one round-robin rebalance of the raw rows; at
    * production split counts the condition is false and the read stays a
    * plain scan (zero overhead). Filters and column pruning push through
    * the Repartition to the scan unchanged (probed: PushedFilters/
    * ReadSchema identical). NOT applied in `load` for every query: a
    * 31-query A/B at sf0.1 measured the blanket form LOSING 7.8 s —
    * cheap columnar scans (relational aggs) and explode-then-aggregate
    * shapes pay more in the extra exchange and per-task overhead than
    * the parallelism returns; only single-action heavy-kernel queries
    * opt in, each with its measured win recorded in OPTIMIZATION_r19.md.
    * Footer stats are read once per path and cached. */
  private val splitCache = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  private[graft] def adaptiveRebalance(spark: SparkSession, df: DataFrame,
                                       path: String): DataFrame = {
    val (effSplits, rows) = splitCache.computeIfAbsent(path, _ =>
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
        val files = (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
          else Seq(fs.getFileStatus(p)))
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        var splits = 0L; var nRows = 0L
        files.foreach { f =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
          try {
            val rgs = rd.getRowGroups.size().toLong
            nRows += rd.getRecordCount
            splits += math.min(rgs, (f.getLen + maxPB - 1) / maxPB)
          } finally rd.close()
        }
        (math.max(splits, 1L), nRows)
      } catch { // unreadable footer: leave the scan untouched
        case scala.util.control.NonFatal(_) => (Long.MaxValue, 0L)
      })
    val cores = spark.sparkContext.defaultParallelism.toLong
    val target = math.min(cores, math.max(1L, rows / MinRowsPerTask))
    // SPARK_GRAFT_SCAN_FLOOR=0 disables the floor (dev A/B comparisons)
    val enabled = sys.env.get("SPARK_GRAFT_SCAN_FLOOR").forall(_ != "0")
    if (enabled && effSplits < target) df.repartition(target.toInt) else df
  }

  /** The driver's generator has emitted timestamp columns three ways across
    * rounds: TIMESTAMP(NANOS) (no Spark type — read as long via
    * legacy.parquet.nanosAsLong), TIMESTAMP(MICROS, adjustedToUTC=true)
    * (TimestampType), and TIMESTAMP(MICROS, adjustedToUTC=false) — which
    * Spark 4 infers as TIMESTAMP_NTZ, breaking instant functions like
    * unix_millis. Canonicalize: NTZ wall-clock values are UTC instants
    * (session tz is UTC in GraftSession), so a cast to TimestampType is
    * value-preserving and restores the type every operator was built on.
    * DuckDB reads the same column as a naive timestamp, so oracle parity
    * is unchanged. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else {
      // the NTZ→LTZ cast interprets wall-clock values in the SESSION
      // timezone: value-preserving at UTC, silently shifting every
      // instant anywhere else — fail loudly instead of corrupting
      val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
      require(tz == "UTC",
        s"Tables.load canonicalizes TIMESTAMP_NTZ assuming a UTC session, " +
          s"but spark.sql.session.timeZone is '$tz' — the cast would shift " +
          "every instant. Build the session via GraftSession (sets UTC).")
      ntz.foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) — Spark 4 has no nanosecond
    * timestamp type, so it's read as a long (legacy.parquet.nanosAsLong,
    * set in GraftSession) and truncated to µs exactly like DuckDB/pyarrow
    * truncate ns → µs. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  /** [[documents]] behind the opt-in kernel-parallelism floor — for
    * queries whose cost is one heavy scan-stage kernel over the text. */
  def documentsKernelPar(s: SparkSession, d: String): DataFrame =
    adaptiveRebalance(s, documents(s, d), s"$d/documents.parquet")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
