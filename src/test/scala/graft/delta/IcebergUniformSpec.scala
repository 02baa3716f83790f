package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Structural pins for the UniForm-style Iceberg metadata mirror
  * ([[IcebergUniform]]). No Iceberg reader exists in this sandbox
  * (documented in IcebergUniform's scaladoc), so these specs walk the
  * exact chain a reader walks — version-hint → vN.metadata.json →
  * manifest-list avro → manifest avro — and pin that the current
  * snapshot lists EXACTLY the live Delta files (paths, record counts,
  * sizes) through append / DELETE / OPTIMIZE lifecycles. */
class IcebergUniformSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("grp", StringType)))

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"n$i", s"g${i % 2}")).toDF("id", "name", "grp")

  private def liveSet(t: DeltaTable): Set[(String, Long, Long)] = {
    val root = new Path(t.path)
    t.snapshot.files.map { a =>
      val n = Actions.mapper.readTree(a.stats.getOrElse("{}"))
        .path("numRecords").asLong(0L)
      (new Path(root, a.path).toString, n, a.size)
    }.toSet
  }

  private def metaJson(t: DeltaTable): com.fasterxml.jackson.databind.JsonNode = {
    val fs = new Path(t.path).getFileSystem(spark.sessionState.newHadoopConf())
    val hintP = new Path(t.path, "metadata/version-hint.text")
    val in = fs.open(hintP)
    val hint = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
    val mp = new Path(t.path, s"metadata/v$hint.metadata.json")
    val in2 = fs.open(mp)
    try Actions.mapper.readTree(scala.io.Source.fromInputStream(in2).mkString)
    finally in2.close()
  }

  test("sync mirrors live files through append / DELETE / OPTIMIZE; idempotent per version") {
    val t = DeltaTable.forPath(spark, tmpDir("ice-uniform")).create(schema)
    t.append(df(0 until 10))
    t.append(df(10 until 20))
    val p1 = IcebergUniform.sync(t)
    assert(p1.endsWith("v1.metadata.json"))
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t),
      "Iceberg snapshot must list exactly the live Delta files")
    val md1 = metaJson(t)
    assert(md1.path("format-version").asInt() === 2)
    assert(md1.path("current-snapshot-id").asLong() === t.snapshot.version)
    assert(md1.path("snapshots").size() === 1)
    assert(md1.path("metadata-log").size() === 0)
    // schema fields carry assigned ids + Iceberg type names
    val fields = md1.path("schemas").get(0).path("fields")
    assert(fields.size() === 3)
    assert(fields.get(0).path("id").asInt() === 1)
    assert(fields.get(0).path("type").asText() === "long")
    assert(fields.get(1).path("type").asText() === "string")

    // same Delta version → no new metadata (idempotent)
    assert(IcebergUniform.sync(t) === p1)
    assert(metaJson(t).path("snapshots").size() === 1)

    // a DELETE rewrites files; the next sync must track the new live set
    assert(t.delete(col("id") % 3 === 0) > 0L)
    val p2 = IcebergUniform.sync(t)
    assert(p2.endsWith("v2.metadata.json"))
    assert(p2 !== p1)
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t))
    val md2 = metaJson(t)
    assert(md2.path("snapshots").size() === 2)
    assert(md2.path("snapshot-log").size() === 2)
    assert(md2.path("metadata-log").size() === 1)
    assert(md2.path("metadata-log").get(0).path("metadata-file").asText() === p1)
    assert(md2.path("table-uuid").asText() === md1.path("table-uuid").asText(),
      "table-uuid must be stable across syncs")
    // snapshot ids/sequence numbers are the (monotone) Delta versions
    assert(md2.path("last-sequence-number").asLong() === t.snapshot.version)

    // OPTIMIZE (compact) rewrites again
    t.compact()
    IcebergUniform.sync(t)
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t))
    assert(metaJson(t).path("snapshots").size() === 3)
    // record counts round-trip: total rows over the manifest equal the table
    assert(IcebergUniform.currentFiles(t).map(_._2).sum === t.toDF.count())
  }

  test("partitioned table: identity spec + typed partition values in the manifest") {
    val t = DeltaTable.forPath(spark, tmpDir("ice-part")).create(schema, Seq("grp"))
    t.append(df(0 until 12))
    IcebergUniform.sync(t)
    val md = metaJson(t)
    val spec = md.path("partition-specs").get(0)
    assert(spec.path("fields").size() === 1)
    assert(spec.path("fields").get(0).path("transform").asText() === "identity")
    assert(spec.path("fields").get(0).path("name").asText() === "grp")
    // source-id points at the grp field's assigned id
    val grpId = {
      var id = -1
      md.path("schemas").get(0).path("fields").forEach(f =>
        if (f.path("name").asText() == "grp") id = f.path("id").asInt())
      id
    }
    assert(spec.path("fields").get(0).path("source-id").asInt() === grpId)
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t))
  }

  test("refuses deletion-vector tables loudly (a mirror would resurrect deleted rows)") {
    val t = DeltaTable.forPath(spark, tmpDir("ice-dv")).create(schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t.append(df(0 until 10))
    assert(t.deleteWithDv(col("id") === 3L) > 0L)
    assert(t.snapshot.files.exists(_.deletionVector.nonEmpty),
      "precondition: the delete must have produced a DV")
    val e = intercept[IllegalArgumentException](IcebergUniform.sync(t))
    assert(e.getMessage.contains("deletion vectors"))
  }
}
