package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka source wiring (reference S1/S3/S4/S5, /root/reference/src/main.rs:334-490,
  * src/offsets.rs:36-102) as a `readStream.format("kafka")` option builder —
  * fully assembled and unit-testable without a broker.
  *
  * Offset semantics map:
  *  - S3 (resume from stored offsets): the reference stores per-partition
  *    offsets as Delta `txn` actions; here the Structured Streaming
  *    checkpoint owns offset tracking and ALWAYS wins over
  *    `startingOffsets` — identical precedence to the reference, where
  *    stored offsets win over `--seek_offsets`.
  *  - S4 (`--seek_offsets "0:10,1:12"`): becomes the `startingOffsets`
  *    JSON; the given offset is the first one read, matching the
  *    reference's seek semantics. Applied only when no checkpoint exists —
  *    use a fresh checkpoint dir (reference: fresh app_id) to re-seek.
  *  - S5 (`--end_at_last_offsets`): `Trigger.AvailableNow` in
  *    [[IngestPipeline.start]] (set via [[IngestOptions.endAtLastOffsets]]).
  *  - B2 (`--max_messages_per_batch`): `maxOffsetsPerTrigger` (per-batch
  *    row cap at the source, the Spark-native flush-trigger lever).
  */
final case class KafkaSourceConfig(
    topic: String,
    bootstrapServers: String,
    consumerGroupId: String = "kafka_delta_ingest",
    /** "earliest" | "latest" — reference --auto_offset_reset, applied when
      * neither checkpoint nor seekOffsets pin a position. */
    autoOffsetReset: String = "earliest",
    /** partition → first offset to read (reference --seek_offsets). */
    seekOffsets: Option[Map[Int, Long]] = None,
    maxMessagesPerBatch: Option[Long] = None,
    /** reference --kafka_setting key=value passthroughs (kafka.* prefixed). */
    additionalSettings: Map[String, String] = Map.empty) {

  require(autoOffsetReset == "earliest" || autoOffsetReset == "latest",
    s"unknown auto_offset_reset $autoOffsetReset") // mirrors main.rs:103-106

  /** The `startingOffsets` option: explicit seek JSON when given, else the
    * auto.offset.reset policy. Kafka-source JSON shape:
    * {"topic":{"0":23,"1":-2}} (-2 = earliest for unlisted behavior). */
  def startingOffsets: String = seekOffsets match {
    case Some(m) =>
      val parts = m.toSeq.sortBy(_._1)
        .map { case (p, o) => s""""$p": $o""" }.mkString(", ")
      s"""{"$topic": {$parts}}"""
    case None => autoOffsetReset
  }

  /** Full option map for `spark.readStream.format("kafka")`. */
  def options: Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "kafka.group.id" -> consumerGroupId,
      // the reference never auto-commits to Kafka (offsets live in Delta /
      // the checkpoint); Spark's source does the same by design
      "failOnDataLoss" -> "false")
    val cap = maxMessagesPerBatch.map(n => "maxOffsetsPerTrigger" -> n.toString)
    base ++ cap ++ additionalSettings.map { case (k, v) =>
      (if (k.startsWith("kafka.")) k else s"kafka.$k") -> v
    }
  }

  /** Streaming DataFrame in the shape PipelineStages expects (value +
    * Kafka meta columns). Requires a reachable broker at runtime. */
  def load(spark: SparkSession): DataFrame =
    options.foldLeft(spark.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
}

object KafkaSourceConfig {
  /** Parse the reference's `--seek_offsets` format: "0:10,1:12"
    * (src/main.rs:321-330). */
  def parseSeekOffsets(s: String): Map[Int, Long] =
    s.split(',').iterator.filter(_.nonEmpty).map { kv =>
      val Array(p, o) = kv.split(':')
      p.trim.toInt -> o.trim.toLong
    }.toMap
}
