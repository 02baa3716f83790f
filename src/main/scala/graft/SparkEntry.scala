package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries/oracles live in graft.queries.Registry, one entry per operator
  * from SURVEY.md §2 plus the beyond-reference pipeline operators.
  */
object SparkEntry {

  /** Flagship: the reference's canonical example (SURVEY §7.3) — ingest the
    * events stream as JSON messages through decode → transform → coercion,
    * producing a date-partitioned table; returns the ingested rows. */
  def entry(spark: SparkSession): DataFrame =
    graft.streaming.IngestPipeline.flagship(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.oracleSql
}
