package graft

import org.apache.spark.sql.SparkSession

import graft.cli.{IngestCli, IngestCliConfig}
import graft.streaming.{IngestPipeline, StatsdMetricsSink}

/** Daemon entry point: `ingest TOPIC TABLE_LOCATION [options]`, the
  * reference's one executable surface (/root/reference/src/main.rs:334-490)
  * on the Spark engine. Parse is delegated to [[graft.cli.IngestCli]]
  * (broker-free, unit-tested); this main only wires the session, metrics
  * sink, and streaming query, then blocks until termination.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val cfg =
      try IngestCli.parse(args.toSeq)
      catch {
        case IngestCli.CliError(msg) =>
          System.err.println(s"error: $msg\n\n${IngestCli.usage}")
          sys.exit(2)
      }
    val spark = GraftSession.builder(s"kafka-delta-ingest-${cfg.appId}").getOrCreate()
    val query = start(spark, cfg)
    query.awaitTermination()
  }

  /** Build the ingest query from a parsed CLI config (separated from main
    * for tests and embedding). */
  def start(spark: SparkSession, cfg: IngestCliConfig) = {
    val sink = cfg.statsdEndpoint.map { ep =>
      val (host, port) = IngestCli.parseStatsdEndpoint(ep)
      new StatsdMetricsSink(host, port)
    }
    val opts = cfg.toIngestOptions.copy(metricsSink = sink)
    IngestPipeline.startFromKafka(spark, cfg.toKafkaConfig, cfg.tableLocation, opts)
  }
}
