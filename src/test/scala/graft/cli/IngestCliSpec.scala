package graft.cli

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MessageFormat

/** The reference CLI contract (main.rs:334-510): argument names, defaults,
  * env fallbacks, repeatable transforms, format resolution, and the
  * seek-offset semantics ("first ingested message is seek + 1"). */
class IngestCliSpec extends AnyFunSuite {

  private val noEnv = Map.empty[String, String]
  private def parse(args: String*) = IngestCli.parse(args, noEnv)

  test("minimal invocation applies reference defaults") {
    val c = parse("ingest", "web_requests", "/tmp/t")
    assert(c.topic === "web_requests")
    assert(c.tableLocation === "/tmp/t")
    assert(c.kafkaBrokers === "localhost:9092")
    assert(c.consumerGroup === "kafka_delta_ingest")
    assert(c.appId === "kafka_delta_ingest")
    assert(c.autoOffsetReset === "earliest")
    assert(c.allowedLatencySec === 300L)
    assert(c.maxMessagesPerBatch === 5000L)
    assert(c.minBytesPerFile === 134217728L)
    assert(c.format === MessageFormat.Json)
    assert(!c.endAtLastOffsets && !c.writeCheckpoints)
  }

  test("missing positionals fail with a clear error") {
    assertThrows[IngestCli.CliError](parse("ingest"))
    assertThrows[IngestCli.CliError](parse("ingest", "topic_only"))
    assertThrows[IngestCli.CliError](parse("notasubcommand", "t", "l"))
    assertThrows[IngestCli.CliError](parse("ingest", "t", "l", "extra"))
    assertThrows[IngestCli.CliError](parse("ingest", "t", "l", "--nope"))
  }

  test("env fallbacks supply positionals and options (CLI wins)") {
    val env = Map("KAFKA_TOPIC" -> "envtopic", "TABLE_LOCATION" -> "/env/table",
      "KAFKA_BROKERS" -> "broker:9093", "APP_ID" -> "envapp",
      "MAX_MESSAGES_PER_BATCH" -> "77", "ENDS_AT_LATEST_OFFSETS" -> "true",
      "TRANSFORMS" -> "a: x\nb: kafka.offset")
    val c = IngestCli.parse(Seq("ingest"), env)
    assert(c.topic === "envtopic" && c.tableLocation === "/env/table")
    assert(c.kafkaBrokers === "broker:9093" && c.appId === "envapp")
    assert(c.maxMessagesPerBatch === 77L && c.endAtLastOffsets)
    assert(c.transforms === Seq("a" -> "x", "b" -> "kafka.offset"))
    val cli = IngestCli.parse(Seq("ingest", "clitopic", "/cli/table",
      "-a", "cliapp", "-t", "only: this"), env)
    assert(cli.topic === "clitopic" && cli.appId === "cliapp")
    assert(cli.transforms === Seq("only" -> "this"))
  }

  test("repeatable transforms split at the first colon (reference example)") {
    val c = parse("ingest", "t", "l",
      "-t", "modified_date: substr(modified,`0`,`10`)",
      "-t", "kafka_offset: kafka.offset")
    assert(c.transforms === Seq(
      "modified_date" -> "substr(modified,`0`,`10`)",
      "kafka_offset" -> "kafka.offset"))
    // each -t takes exactly one value; a bare trailing value is a stray
    // positional, not a second transform
    assertThrows[IngestCli.CliError](parse("ingest", "t", "l",
      "-t", "a: x", "b: y"))
  }

  test("transform and kafka_setting syntax errors match the reference wording") {
    val e1 = intercept[IngestCli.CliError](parse("ingest", "t", "l", "-t", "no_colon"))
    assert(e1.message.contains("colon delimited"))
    val e2 = intercept[IngestCli.CliError](parse("ingest", "t", "l", "-K", "noequals"))
    assert(e2.message.contains("'='"))
    val ok = parse("ingest", "t", "l", "-K", "security.protocol=SSL",
      "-K", "ssl.key.location=kafka.key")
    assert(ok.kafkaSettings === Map(
      "security.protocol" -> "SSL", "ssl.key.location" -> "kafka.key"))
  }

  test("seek offsets accept the reference JSON form and seek PAST the offset") {
    val c = parse("ingest", "t", "l", "--seek_offsets", """{"0":10, "2":12, "1":13}""")
    assert(c.seekOffsets === Some(Map(0 -> 10L, 1 -> 13L, 2 -> 12L)))
    // first ingested message is seek+1 → Spark's inclusive startingOffsets
    val k = c.toKafkaConfig
    assert(k.seekOffsets === Some(Map(0 -> 11L, 1 -> 14L, 2 -> 13L)))
    assert(k.numPartitions === Some(3))
    assert(k.startingOffsets === """{"t": {"0": 11, "1": 14, "2": 13}}""")
    assertThrows[IngestCli.CliError](
      parse("ingest", "t", "l", "--seek_offsets", "not json"))
    // Jackson's asLong() coerces garbage to 0 — that must be an error,
    // not a silent re-ingest from the beginning of the topic
    assertThrows[IngestCli.CliError](
      parse("ingest", "t", "l", "--seek_offsets", """{"0":"123a"}"""))
    assertThrows[IngestCli.CliError](
      parse("ingest", "t", "l", "--seek_offsets", """{"0":1.5}"""))
    assertThrows[IngestCli.CliError](
      parse("ingest", "t", "l", "--seek_offsets", "{}"))
    assertThrows[IngestCli.CliError](
      parse("ingest", "t", "l", "--seek_offsets", """{"0":5}""",
        "--topic_partitions", "foo"))
    assertThrows[IngestCli.CliError](
      parse("ingest", "t", "l", "-s", "host:notaport"))
    assert(parse("ingest", "t", "l", "-s", "statsd.local:8125")
      .statsdEndpoint === Some("statsd.local:8125"))
  }

  test("--topic_partitions widens the seek JSON with earliest fills") {
    val c = parse("ingest", "t", "l", "--seek_offsets", """{"1":5}""",
      "--topic_partitions", "3")
    assert(c.toKafkaConfig.startingOffsets === """{"t": {"0": -2, "1": 6, "2": -2}}""")
  }

  test("format resolution mirrors to_schema_source") {
    // --json: empty or non-http → plain JSON; http → registry wire format
    assert(parse("ingest", "t", "l", "--json", "").format === MessageFormat.Json)
    assert(parse("ingest", "t", "l", "--json", "test").format === MessageFormat.Json)
    assert(parse("ingest", "t", "l", "--json", "http://localhost:8081").format
      === MessageFormat.JsonRegistry)
    // --avro: empty → container; file → reader schema; missing file → error
    assert(parse("ingest", "t", "l", "--avro", "").format
      === MessageFormat.AvroContainer(None))
    val avsc = Files.createTempFile("ingestcli", ".avsc")
    Files.writeString(avsc, """{"type":"record","name":"r","fields":[]}""")
    assert(parse("ingest", "t", "l", "--avro", avsc.toString).format
      === MessageFormat.AvroContainer(Some(Files.readString(avsc))))
    val nf = intercept[IngestCli.CliError](
      parse("ingest", "t", "l", "--avro", "/no/such.avsc"))
    assert(nf.message.contains("File not found"))
    // registry URL for avro → live schema-registry source at that URL
    parse("ingest", "t", "l", "--avro", "http://localhost:8081").format match {
      case MessageFormat.AvroRegistry(src: graft.serialization.HttpSchemaSource) =>
        assert(src.registryUrl === "http://localhost:8081")
      case other => fail(s"expected a live AvroRegistry format, got $other")
    }
    // --soe-avro: directory of schemas
    val dir = Files.createTempDirectory("ingestcli-soe")
    Files.writeString(dir.resolve("a.avsc"), "{}")
    Files.writeString(dir.resolve("b.avsc"), "{}")
    assert(parse("ingest", "t", "l", "--soe-avro", dir.toString).format
      === MessageFormat.AvroSoe(Seq("{}", "{}")))
    // mutual exclusion
    assertThrows[IngestCli.CliError](
      parse("ingest", "t", "l", "--json", "", "--avro", ""))
  }

  test("gzip composes with plain JSON only") {
    assert(parse("ingest", "t", "l", "--decompress_gzip").format
      === MessageFormat.JsonGzip)
    assertThrows[IngestCli.CliError](
      parse("ingest", "t", "l", "--avro", "", "--decompress_gzip"))
  }

  test("config maps onto IngestOptions with Spark checkpoint defaults") {
    val c = parse("ingest", "t", "/tables/web", "-l", "60", "-m", "1000",
      "-b", "1048576", "--dlq_table_location", "/tables/dlq",
      "--dlq_transform", "date: substr(ts, `0`, `10`)", "-e", "-c")
    val o = c.toIngestOptions
    assert(o.allowedLatency === java.time.Duration.ofSeconds(60))
    assert(o.maxMessagesPerBatch === 1000L)
    assert(o.minBytesPerFile === Some(1048576L))
    assert(o.dlqTablePath === Some("/tables/dlq"))
    assert(o.dlqTransforms === Seq("date" -> "substr(ts, `0`, `10`)"))
    assert(o.endAtLastOffsets)
    assert(o.checkpointLocation === Some("/tables/web/_graft_checkpoint"))
    val custom = parse("ingest", "t", "l", "--checkpoint_location", "/ckpt")
    assert(custom.toIngestOptions.checkpointLocation === Some("/ckpt"))
  }
}
