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

  test("unchanged schema: schema-id and field-ids STABLE across syncs; a real change evolves") {
    val t = DeltaTable.forPath(spark, tmpDir("ice-stable")).create(schema, Seq("grp"))
    t.append(df(0 until 6))
    IcebergUniform.sync(t)
    val md1 = metaJson(t)
    def ids(md: com.fasterxml.jackson.databind.JsonNode): Seq[(String, Int)] = {
      val b = Seq.newBuilder[(String, Int)]
      var cur: com.fasterxml.jackson.databind.JsonNode = null
      md.path("schemas").forEach(s =>
        if (s.path("schema-id").asInt() == md.path("current-schema-id").asInt())
          cur = s)
      cur.path("fields").forEach(f =>
        b += ((f.path("name").asText(), f.path("id").asInt())))
      b.result()
    }
    // second sync at a DIFFERENT Delta version, same schema: the prior
    // schema node must be reused verbatim — same schema-id, same
    // field-ids, same last-column-id, schemas array does NOT grow, and
    // partition-spec 0's source-id still points at the same field
    t.append(df(6 until 12))
    IcebergUniform.sync(t)
    val md2 = metaJson(t)
    assert(md2.path("current-schema-id").asInt() ===
      md1.path("current-schema-id").asInt())
    assert(ids(md2) === ids(md1), "field-ids must be stable for an unchanged schema")
    assert(md2.path("last-column-id").asInt() === md1.path("last-column-id").asInt())
    assert(md2.path("schemas").size() === 1, "no duplicate schema minted")
    assert(md2.path("partition-specs").get(0).path("fields").get(0)
      .path("source-id").asInt() ===
      md1.path("partition-specs").get(0).path("fields").get(0)
        .path("source-id").asInt())
    // parent linkage records the chain
    var parent = -1L
    md2.path("snapshots").forEach(s =>
      if (s.path("snapshot-id").asLong() == md2.path("current-snapshot-id").asLong())
        parent = s.path("parent-snapshot-id").asLong(-1L))
    assert(parent === md1.path("current-snapshot-id").asLong())

    // name-mapping fallback: names → the SAME assigned field-ids (the
    // data files carry no embedded ids, so this property is how a
    // spec-compliant reader resolves columns at all)
    val nm = Actions.mapper.readTree(
      md2.path("properties").path("schema.name-mapping.default").asText())
    val nmIds = {
      val b = Seq.newBuilder[(String, Int)]
      nm.forEach(e =>
        b += ((e.path("names").get(0).asText(), e.path("field-id").asInt())))
      b.result()
    }
    assert(nmIds === ids(md2))

    // a REAL schema change (widened by mergeSchema) mints a fresh
    // schema-id with ids above the prior last-column-id
    t.append(df(12 until 14).withColumn("extra", lit(1L)), mergeSchema = true)
    IcebergUniform.sync(t)
    val md3 = metaJson(t)
    assert(md3.path("current-schema-id").asInt() ===
      md1.path("current-schema-id").asInt() + 1)
    assert(md3.path("schemas").size() === 2)
    assert(md3.path("last-column-id").asInt() > md1.path("last-column-id").asInt())
    assert(ids(md3).map(_._1).contains("extra"))
    assert(ids(md3).forall(_._2 > md1.path("last-column-id").asInt()),
      "changed schema assigns fresh ids above the prior last-column-id")
  }

  test("manifest + manifest-list avro carry the reader-required key metadata") {
    val t = DeltaTable.forPath(spark, tmpDir("ice-avrometa")).create(schema, Seq("grp"))
    t.append(df(0 until 8))
    IcebergUniform.sync(t)
    val md = metaJson(t)
    var listPath: String = null
    md.path("snapshots").forEach(s =>
      if (s.path("snapshot-id").asLong() == md.path("current-snapshot-id").asLong())
        listPath = s.path("manifest-list").asText())
    def metaOf(p: String): Map[String, String] = {
      val r = new org.apache.avro.file.DataFileReader(
        new java.io.File(new java.net.URI(
          if (p.startsWith("file:")) p else "file://" + p).getPath),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try {
        import scala.jdk.CollectionConverters._
        r.getMetaKeys.asScala.filterNot(_.startsWith("avro."))
          .map(k => k -> r.getMetaString(k)).toMap
      } finally r.close()
    }
    val listMeta = metaOf(listPath)
    assert(listMeta("format-version") === "2")
    assert(listMeta("snapshot-id") === md.path("current-snapshot-id").asLong().toString)
    assert(listMeta("parent-snapshot-id") === "null")
    assert(listMeta.contains("sequence-number"))
    val manifestPath = {
      val r = new org.apache.avro.file.DataFileReader(
        new java.io.File(new java.net.URI(
          if (listPath.startsWith("file:")) listPath
          else "file://" + listPath).getPath),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try r.next().get("manifest_path").toString finally r.close()
    }
    val mMeta = metaOf(manifestPath)
    assert(mMeta("format-version") === "2" && mMeta("content") === "data")
    assert(mMeta("partition-spec-id") === "0")
    // the embedded schema and spec parse and agree with the metadata.json
    val emSchema = Actions.mapper.readTree(mMeta("schema"))
    assert(emSchema.path("schema-id").asInt() ===
      md.path("current-schema-id").asInt())
    val emSpec = Actions.mapper.readTree(mMeta("partition-spec"))
    assert(emSpec.get(0).path("name").asText() === "grp")
    assert(emSpec.get(0).path("field-id").asInt() === 1000)
  }

  test("a torn/unparsable version hint recovers from the listing: lineage continues") {
    val t = DeltaTable.forPath(spark, tmpDir("ice-torn")).create(schema)
    t.append(df(0 until 6))
    IcebergUniform.sync(t)
    val uuid0 = metaJson(t).path("table-uuid").asText()
    // simulate a torn hint (pre-atomic-rename crash or external scribble)
    val fs = new Path(t.path).getFileSystem(spark.sessionState.newHadoopConf())
    val hintP = new Path(t.path, "metadata/version-hint.text")
    val out = fs.create(hintP, true)
    try out.write("not-a-number".getBytes("UTF-8")) finally out.close()
    t.append(df(6 until 9))
    IcebergUniform.sync(t) // must not throw — recovers via the listing
    assert(metaJson(t).path("table-uuid").asText() === uuid0,
      "an unparsable hint must recover the lineage, not restart it")
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t),
      "post-recovery snapshot must list exactly the live files")
  }

  test("UniForm auto-sync: every commit advances the mirror; UNSET stops it; refusal matrix") {
    val t = DeltaTable.forPath(spark, tmpDir("ice-uniform-auto")).create(schema,
      configuration = Map(
        DeltaTable.IcebergCompatV1Key -> "true",
        DeltaTable.UniversalFormatKey -> "iceberg"))
    assert(t.snapshot.protocol.exists(
        _.writerFeatures.exists(_.contains("icebergCompatV1"))),
      "CREATE with compat must enumerate the writer feature")
    // the post-commit hook mirrors WITHOUT any manual sync() call
    t.append(df(0 until 10))
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t),
      "append must auto-advance the mirror")
    assert(t.delete(col("id") % 3 === 0) > 0L)
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t),
      "delete must auto-advance the mirror")
    assert(metaJson(t).path("current-snapshot-id").asLong() === t.snapshot.version)

    // compat may not drop out from under the mirror; dropping the
    // mirror itself stops syncing (protocol keeps the feature)
    val eU = intercept[IllegalArgumentException](
      t.unsetProperties(Seq(DeltaTable.IcebergCompatV1Key)))
    assert(eU.getMessage.contains("unset the"))
    t.unsetProperties(Seq(DeltaTable.UniversalFormatKey))
    val hintBefore = metaJson(t).path("current-snapshot-id").asLong()
    t.append(df(20 until 25))
    assert(metaJson(t).path("current-snapshot-id").asLong() === hintBefore,
      "after UNSET the mirror must stop advancing")
    assert(t.snapshot.protocol.exists(
        _.writerFeatures.exists(_.contains("icebergCompatV1"))),
      "protocol never downgrades")
    // re-enabling needs only the formats key (compat feature persists in
    // config? no — config was kept; re-SET and the hook resumes)
    t.setProperties(Map(DeltaTable.UniversalFormatKey -> "iceberg"))
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t),
      "re-enabling SET must resync in its own post-commit")

    // refusal matrix
    val e1 = intercept[IllegalArgumentException](
      DeltaTable.forPath(spark, tmpDir("ice-u-nocompat")).create(schema,
        configuration = Map(DeltaTable.UniversalFormatKey -> "iceberg")))
    assert(e1.getMessage.contains("enableIcebergCompatV1"))
    val e2 = intercept[IllegalArgumentException](
      DeltaTable.forPath(spark, tmpDir("ice-u-dv")).create(schema,
        configuration = Map(
          DeltaTable.UniversalFormatKey -> "iceberg",
          DeltaTable.IcebergCompatV1Key -> "true",
          DeltaTable.DvConfigKey -> "true")))
    assert(e2.getMessage.contains("deletion vectors"))
    val e3 = intercept[IllegalArgumentException](
      DeltaTable.forPath(spark, tmpDir("ice-u-cm")).create(schema,
        configuration = Map(
          DeltaTable.UniversalFormatKey -> "iceberg",
          DeltaTable.IcebergCompatV1Key -> "true",
          DeltaTable.ColumnMappingModeKey -> "name")))
    assert(e3.getMessage.contains("column-mapped"))
    // enabling DV on a live UniForm table refuses (two-directional)
    val e4 = intercept[IllegalArgumentException](
      t.setProperties(Map(DeltaTable.DvConfigKey -> "true")))
    assert(e4.getMessage.contains("deletion vectors"))
    // a DV-enabled table refuses the mirror
    val dvT = DeltaTable.forPath(spark, tmpDir("ice-u-dvfirst")).create(schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    val e5 = intercept[IllegalArgumentException](
      dvT.setProperties(Map(
        DeltaTable.UniversalFormatKey -> "iceberg",
        DeltaTable.IcebergCompatV1Key -> "true")))
    assert(e5.getMessage.contains("deletion vectors"))
    // unknown format value refuses
    val e6 = intercept[IllegalArgumentException](
      t.setProperties(Map(DeltaTable.UniversalFormatKey -> "hudi")))
    assert(e6.getMessage.contains("only 'iceberg'"))
  }

  test("append-only syncs write INCREMENTAL manifests; deletes and the compaction bound rewrite") {
    def listRefs(t: DeltaTable): Seq[(String, Long)] = {
      val md = metaJson(t)
      var listPath: String = null
      md.path("snapshots").forEach(s =>
        if (s.path("snapshot-id").asLong() ===
            md.path("current-snapshot-id").asLong())
          listPath = s.path("manifest-list").asText())
      val r = new org.apache.avro.file.DataFileReader(
        new java.io.File(new java.net.URI(
          if (listPath.startsWith("file:")) listPath
          else "file://" + listPath).getPath),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try {
        val b = Seq.newBuilder[(String, Long)]
        while (r.hasNext) {
          val rec = r.next()
          b += ((rec.get("manifest_path").toString,
            rec.get("added_snapshot_id").asInstanceOf[Long]))
        }
        b.result()
      } finally r.close()
    }
    def curOp(t: DeltaTable): String = {
      val md = metaJson(t)
      var op: String = null
      md.path("snapshots").forEach(s =>
        if (s.path("snapshot-id").asLong() ===
            md.path("current-snapshot-id").asLong())
          op = s.path("summary").path("operation").asText())
      op
    }
    spark.conf.set("graft.uniform.maxManifests", "4")
    try {
      val t = DeltaTable.forPath(spark, tmpDir("ice-incr")).create(schema,
        configuration = Map(
          DeltaTable.IcebergCompatV1Key -> "true",
          DeltaTable.UniversalFormatKey -> "iceberg"))
      val refs0 = listRefs(t) // the CREATE sync: empty full-state manifest
      assert(refs0.size === 1)
      t.append(df(0 until 6))
      val refs1 = listRefs(t)
      assert(refs1.size === 2 && refs1.head === refs0.head,
        "an append must carry the prior manifest forward verbatim")
      assert(curOp(t) === "append")
      assert(IcebergUniform.currentFiles(t).toSet === liveSet(t))
      t.append(df(6 until 12))
      val refs2 = listRefs(t)
      assert(refs2.size === 3 && refs2.take(2) === refs1,
        "each append-only sync adds exactly one manifest")
      assert(IcebergUniform.currentFiles(t).toSet === liveSet(t),
        "the union of carried + new manifests must equal the live set")
      // the compaction bound: the 4th manifest would exceed
      // maxManifests=4 after this append... not yet — one more append
      // reaches the bound and the NEXT rewrites full-state
      t.append(df(12 until 18))
      assert(listRefs(t).size === 4)
      t.append(df(18 until 24))
      val refsC = listRefs(t)
      assert(refsC.size === 1, "reaching maxManifests must compact to one")
      assert(curOp(t) === "overwrite")
      assert(IcebergUniform.currentFiles(t).toSet === liveSet(t))
      // a DELETE is not append-only: full-state rewrite
      t.append(df(24 until 30))
      assert(listRefs(t).size === 2)
      assert(t.delete(col("id") % 2 === 0) > 0L)
      val refsD = listRefs(t)
      assert(refsD.size === 1, "a delete must rewrite the full state")
      assert(curOp(t) === "overwrite")
      assert(IcebergUniform.currentFiles(t).toSet === liveSet(t),
        "deleted files must vanish from the mirrored snapshot")
    } finally spark.conf.unset("graft.uniform.maxManifests")
  }

  test("compat invariants hold WITHOUT the mirror; hint loss recovers from the listing") {
    // the protocol's icebergCompatV1 writer feature is the promise an
    // external engine trusts — a compat-flagged table must hold the
    // invariants even while the mirror itself is off (enabling DVs here
    // would let a later UniForm enable resurrect deleted rows)
    val e1 = intercept[IllegalArgumentException](
      DeltaTable.forPath(spark, tmpDir("ice-c-dv")).create(schema,
        configuration = Map(
          DeltaTable.IcebergCompatV1Key -> "true",
          DeltaTable.DvConfigKey -> "true")))
    assert(e1.getMessage.contains("deletion vectors"))
    val c = DeltaTable.forPath(spark, tmpDir("ice-c-only")).create(schema,
      configuration = Map(DeltaTable.IcebergCompatV1Key -> "true"))
    assert(c.snapshot.protocol.exists(
      _.writerFeatures.exists(_.contains("icebergCompatV1"))))
    val e2 = intercept[IllegalArgumentException](
      c.setProperties(Map(DeltaTable.DvConfigKey -> "true")))
    assert(e2.getMessage.contains("deletion vectors"))
    c.append(df(0 until 5))
    assert(!new java.io.File(c.path, "metadata").exists(),
      "compat alone must not write the mirror")

    // hint loss: the delete-then-rename hint write has an absent-file
    // window, and a crash there loses the hint outright — both recover
    // from the vN.metadata.json listing instead of restarting the
    // lineage under a fresh table-uuid
    val t = DeltaTable.forPath(spark, tmpDir("ice-hint")).create(schema,
      configuration = Map(
        DeltaTable.IcebergCompatV1Key -> "true",
        DeltaTable.UniversalFormatKey -> "iceberg"))
    t.append(df(0 until 8))
    val uuid0 = metaJson(t).path("table-uuid").asText()
    val mv0 = metaJson(t).path("__graft-metadata-version").asLong()
    assert(new java.io.File(new java.io.File(t.path, "metadata"),
      "version-hint.text").delete(), "fixture: simulate the hint window")
    assert(IcebergUniform.currentFiles(t).toSet === liveSet(t),
      "a reader in the hint window must recover from the listing")
    t.append(df(10 until 15))
    assert(metaJson(t).path("table-uuid").asText() === uuid0,
      "the post-commit sync must CONTINUE the lineage, not restart it")
    assert(metaJson(t).path("__graft-metadata-version").asLong() === mv0 + 1)
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
