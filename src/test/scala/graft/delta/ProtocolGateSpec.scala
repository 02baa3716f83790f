package graft.delta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PROTOCOL.md conformance gate: a table whose protocol requires
  * features this engine does not implement must refuse — reading past
  * an unknown reader feature returns wrong rows, writing past an
  * unknown writer feature breaks the invariants that feature maintains.
  * A foreign table with unknown WRITER-only features stays readable. */
class ProtocolGateSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-author a minimal foreign log with the given protocol line. */
  private def foreignTable(prefix: String, protocolJson: String): String = {
    val dir = tmpDir(prefix)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val meta = """{"metaData":{"id":"f-1","format":{"provider":"parquet","options":{}},""" +
      """"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}",""" +
      """"partitionColumns":[],"configuration":{}}}"""
    Files.write(Paths.get(dir, "_delta_log", "%020d.json".format(0L)),
      (protocolJson + "\n" + meta + "\n").getBytes(StandardCharsets.UTF_8))
    dir
  }

  test("unknown READER features refuse reads and writes loudly") {
    val dir = foreignTable("proto-r",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","futureMagicV9"],""" +
        """"writerFeatures":["deletionVectors","futureMagicV9"]}}""")
    val t = DeltaTable.forPath(spark, dir)
    val er = intercept[IllegalArgumentException](t.toDF.collect())
    assert(er.getMessage.contains("futureMagicV9") &&
      er.getMessage.contains("refusing to read"))
    val ew = intercept[IllegalArgumentException](t.append(Seq(1L).toDF("id")))
    assert(ew.getMessage.contains("futureMagicV9"))
  }

  test("unknown WRITER-only features stay readable but refuse writes") {
    val dir = foreignTable("proto-w",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["appendOnly","icebergCompatV2"]}}""")
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.count() === 0L) // empty but readable
    val e = intercept[IllegalArgumentException](t.append(Seq(1L).toDF("id")))
    assert(e.getMessage.contains("icebergCompatV2") &&
      e.getMessage.contains("refusing to write"))
    // a DML that matches nothing never commits — no write, no gate; the
    // quiet -1 contract holds even on a foreign table
    assert(t.delete(col("id") > 0L) === -1L)
  }

  test("future version floors refuse; every feature this engine writes passes its own gate") {
    val dirV = foreignTable("proto-v",
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":8}}""")
    val ev = intercept[IllegalArgumentException](
      DeltaTable.forPath(spark, dirV).toDF.collect())
    assert(ev.getMessage.contains("reader version 4"))
    // self-consistency: a table using this engine's full feature surface
    // (DV + mapping + CDF + row tracking + ICT + v2 checkpoints) keeps
    // reading and writing through the gate
    val dir = tmpDir("proto-self")
    val df = (0L until 8L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      configuration = Map(
        DeltaTable.DvConfigKey -> "true",
        DeltaTable.ColumnMappingModeKey -> "name",
        "delta.enableChangeDataFeed" -> "true",
        DeltaTable.IctConfigKey -> "true"))
    t.append(df)
    t.deleteWithDv(col("id") === 3L)
    assert(t.toDF.count() === 7L)
  }
}
