package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Symlink-format manifests (`GENERATE symlink_format_manifest` + the
  * `delta.compatibility.symlinkFormatManifest.enabled` auto-maintenance
  * property): the manifest tree must always name exactly the LIVE data
  * files — external symlink readers have no delta log, so a stale line
  * resurrects deleted rows and a missing one drops live ones. */
class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(table: String, dir: String = ""): Path =
    new Path(table + "/" + DeltaTable.ManifestDirName +
      (if (dir.isEmpty) "" else "/" + dir) + "/manifest")

  private def manifestLines(table: String, dir: String = ""): Seq[String] = {
    val p = manifestPath(table, dir)
    val in = fsOf(table).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def liveUris(t: DeltaTable): Set[String] = {
    val fs = fsOf(t.path)
    t.snapshot.files.map(f =>
      fs.makeQualified(new Path(t.path, f.path)).toString).toSet
  }

  test("unpartitioned: generate lists exactly the live files; regen tracks DML") {
    val t = DeltaTable.forPath(spark, tmpDir("man-flat"))
      .create(Seq((0L, "x")).toDF("id", "v").schema)
    t.append((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(2))
    t.append((100L until 150L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val written = t.generateManifest()
    assert(written === Seq(DeltaTable.ManifestDirName + "/manifest"))
    assert(manifestLines(t.path).toSet === liveUris(t))
    // every manifest line is a readable parquet file with the table's rows
    val viaManifest = spark.read.parquet(manifestLines(t.path): _*)
    assert(viaManifest.count() === 150L)
    // a rewrite DML invalidates the old lines; regeneration re-syncs
    assert(t.delete(col("id") < 100L) > 0L)
    t.generateManifest()
    assert(manifestLines(t.path).toSet === liveUris(t))
    assert(spark.read.parquet(manifestLines(t.path): _*).count() === 50L)
  }

  test("partitioned: one manifest per live partition; emptied partitions sweep") {
    val t = DeltaTable.forPath(spark, tmpDir("man-part")).create(
      Seq((0L, 0L)).toDF("id", "p").schema, partitionColumns = Seq("p"))
    t.append((0L until 90L).map(i => (i, i % 3)).toDF("id", "p"))
    t.generateManifest()
    (0L until 3L).foreach { part =>
      val lines = manifestLines(t.path, s"p=$part")
      assert(lines.nonEmpty)
      assert(spark.read.parquet(lines: _*).count() === 30L,
        s"partition p=$part manifest must list exactly its 30 rows")
    }
    // drop a whole partition → its manifest dir must disappear on regen
    assert(t.delete(col("p") === 2L) > 0L)
    t.generateManifest()
    assert(!fsOf(t.path).exists(manifestPath(t.path, "p=2")))
    assert(spark.read.parquet(manifestLines(t.path, "p=0"): _*).count() === 30L)
  }

  test("auto-maintenance: enabling the property generates; commits update touched partitions only") {
    val t = DeltaTable.forPath(spark, tmpDir("man-auto")).create(
      Seq((0L, 0L)).toDF("id", "p").schema, partitionColumns = Seq("p"))
    t.append((0L until 40L).map(i => (i, i % 2)).toDF("id", "p"))
    // the enabling ALTER runs the first full generation via the hook
    t.setProperties(Map(DeltaTable.SymlinkManifestKey -> "true"))
    assert(manifestLines(t.path, "p=0").nonEmpty)
    val p1Before = manifestLines(t.path, "p=1")
    // an append into p=0 rewrites p=0's manifest and leaves p=1's alone
    t.append((100L until 120L).map(i => (i, 0L)).toDF("id", "p"))
    assert(spark.read.parquet(manifestLines(t.path, "p=0"): _*).count() === 40L)
    assert(manifestLines(t.path, "p=1") === p1Before)
    // the synced manifest equals the live set with no explicit GENERATE
    assert((manifestLines(t.path, "p=0") ++ manifestLines(t.path, "p=1")).toSet
      === liveUris(t))
    // DML that empties a partition deletes its manifest through the hook
    assert(t.delete(col("p") === 1L) > 0L)
    assert(!fsOf(t.path).exists(manifestPath(t.path, "p=1")))
    // OPTIMIZE rewrites ride the same hook: manifest follows the compaction
    val v = t.compact(minBytes = 512L * 1024 * 1024)
    if (v > 0L)
      assert(manifestLines(t.path, "p=0").toSet === liveUris(t))
  }

  test("streaming sink composition: manifests track each micro-batch commit") {
    import spark.implicits._
    val t = DeltaTable.forPath(spark, tmpDir("man-stream")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.SymlinkManifestKey -> "true"))
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = src.toDF().toDF("id", "v").writeStream.format("graft-delta")
      .option("path", t.path)
      .option("checkpointLocation", tmpDir("man-stream-ck"))
      .start()
    try {
      src.addData((0L until 20L).map(i => (i, s"v$i")))
      q.processAllAvailable()
      assert(manifestLines(t.path).toSet === liveUris(DeltaTable.forPath(spark, t.path)),
        "the sink's first micro-batch must land in the manifest via the hook")
      src.addData((20L until 30L).map(i => (i, s"v$i")))
      q.processAllAvailable()
      val t2 = DeltaTable.forPath(spark, t.path)
      assert(manifestLines(t.path).toSet === liveUris(t2))
      assert(spark.read.parquet(manifestLines(t.path): _*).count() === 30L)
    } finally q.stop()
  }

  test("deletion vectors and column mapping refuse manifests, both directions") {
    val dv = DeltaTable.forPath(spark, tmpDir("man-dv")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    dv.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    val e1 = intercept[IllegalArgumentException](dv.generateManifest())
    assert(e1.getMessage.contains("deletion-vector"))
    intercept[IllegalArgumentException](
      dv.setProperties(Map(DeltaTable.SymlinkManifestKey -> "true")))

    val man = DeltaTable.forPath(spark, tmpDir("man-excl")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.SymlinkManifestKey -> "true"))
    man.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    intercept[IllegalArgumentException](
      man.setProperties(Map(DeltaTable.DvConfigKey -> "true")))

    val cm = DeltaTable.forPath(spark, tmpDir("man-cm")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.ColumnMappingModeKey -> "name"))
    cm.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    val e2 = intercept[IllegalArgumentException](cm.generateManifest())
    assert(e2.getMessage.contains("column mapping"))
    // and the incompatible combination refuses at CREATE
    intercept[IllegalArgumentException](
      DeltaTable.forPath(spark, tmpDir("man-bad")).create(
        Seq((0L, "x")).toDF("id", "v").schema,
        configuration = Map(DeltaTable.SymlinkManifestKey -> "true",
          DeltaTable.DvConfigKey -> "true")))
  }

  test("SQL: GENERATE symlink_format_manifest FOR TABLE") {
    val t = DeltaTable.forPath(spark, tmpDir("man-sql"))
      .create(Seq((0L, "x")).toDF("id", "v").schema)
    t.append((0L until 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    val rows = spark.sql(
      s"GENERATE symlink_format_manifest FOR TABLE '${t.path}'").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq(DeltaTable.ManifestDirName + "/manifest"))
    assert(manifestLines(t.path).toSet === liveUris(t))
    val bad = intercept[Exception](
      spark.sql(s"GENERATE incremental FOR TABLE '${t.path}'").collect())
    assert(bad.getMessage.contains("unsupported GENERATE mode"))
    // VACUUM must never collect manifest files
    t.vacuum(retentionMs = 0L)
    assert(manifestLines(t.path).nonEmpty)
  }
}
