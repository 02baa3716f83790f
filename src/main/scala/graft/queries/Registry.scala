package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark build function over a scale-factor dir and
  * (when SQL-expressible) the equivalent DuckDB oracle SQL over the same
  * parquet tables. `headline = true` marks queries timed by `graft.Bench`.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

trait QueryModule {
  def defs: Map[String, QueryDef]
}

/** Central inventory: every operator claimed in SURVEY.md §2 (plus the
  * beyond-reference pipeline ops) surfaces here so the driver's DuckDB gate
  * exercises it.
  */
object Registry {
  def modules: Seq[QueryModule] =
    Seq(Analytics, ReferenceOps, DedupQueries, SimilarityQueries, TextQueries,
      MultimodalQueries, StreamingQueries, SamplingQueries, PipelineRecipe)

  def all: Map[String, QueryDef] = {
    val entries = modules.flatMap(_.defs)
    val dups = entries.groupBy(_._1).collect { case (n, es) if es.size > 1 => n }
    // a cross-module name collision would silently keep one definition and
    // drop the other's gate — fail loudly instead
    require(dups.isEmpty, s"duplicate query names across modules: $dups")
    entries.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.build }

  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
