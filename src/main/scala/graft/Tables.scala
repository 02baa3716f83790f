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
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
