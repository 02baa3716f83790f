package graft.delta

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Clustered tables (Delta writer feature `clusteredTable`): clustering
  * columns declared ONCE at create in the `delta.clustering` domain (by
  * physical name), incremental layout maintenance via
  * [[DeltaTable.optimizeClustered]] — no caller ever re-states the keys. */
class ClusteredTableSpec extends SparkSpec {
  import spark.implicits._

  test("create(clusterBy) records the domain + feature; optimize narrows file ranges") {
    val dir = tmpDir("clus")
    val df = (0L until 4000L).map(i => (i % 64, (i * 37) % 64, s"r$i"))
      .toDF("x", "y", "payload")
    val t = DeltaTable.forPath(spark, dir).create(df.schema, clusterBy = Seq("x", "y"))
    val p = t.snapshot.protocol.get
    assert(p.minWriterVersion === 7)
    assert(p.writerFeatures.get.contains("clusteredTable"))
    assert(p.writerFeatures.get.contains("domainMetadata"))
    assert(t.clusteringColumns === Seq("x", "y"))
    // four interleaved appends: every file spans nearly the whole x range
    (0 until 4).foreach(b => t.append(df.filter(col("x") % 4 === b)))
    val before = t.scanFiles(Seq(DataSkipping.ColPred("x", "=", 3L))).size
    assert(t.optimizeClustered(numFiles = 8) > 0L)
    val after = t.scanFiles(Seq(DataSkipping.ColPred("x", "=", 3L))).size
    assert(t.snapshot.files.size === 8)
    assert(after < before || after < t.snapshot.files.size,
      s"clustering must make point lookups prune files (before=$before after=$after)")
    // content unchanged
    assert(t.toDF.count() === 4000L)
    assert(t.toDF.agg(sum(col("x"))).head().getLong(0) ===
      (0L until 4000L).map(_ % 64).sum)
  }

  test("clusterBy survives RENAME on a mapped table (physical names in the domain)") {
    val dir = tmpDir("clus-map")
    val df = (0L until 100L).map(i => (i, i % 7)).toDF("a", "b")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      configuration = Map(DeltaTable.ColumnMappingModeKey -> "name"),
      clusterBy = Seq("a", "b"))
    t.append(df)
    t.renameColumn("a", "alpha")
    assert(t.clusteringColumns === Seq("alpha", "b"),
      "the domain stores physical names, so a rename must re-resolve logically")
    t.append((100L until 200L).map(i => (i, i % 7)).toDF("alpha", "b"))
    assert(t.optimizeClustered(numFiles = 2) > 0L)
    assert(t.toDF.count() === 200L)
  }

  test("clustered + row tracking: optimizeClustered preserves row identity") {
    val dir = tmpDir("clus-rt")
    val df = (0L until 500L).map(i => ((i * 131) % 97, i)).toDF("k", "seq")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      configuration = Map(DeltaTable.RowTrackingConfigKey -> "true"),
      clusterBy = Seq("k", "seq"))
    (0 until 2).foreach(b => t.append(df.filter(col("seq") % 2 === b)))
    val before = t.toDFWithRowIds.select(col("seq"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t.optimizeClustered(numFiles = 4) > 0L)
    val after = t.toDFWithRowIds.select(col("seq"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before)
  }

  test("single clustering column degrades to a plain range sort") {
    val dir = tmpDir("clus-one")
    val df = (0L until 1000L).map(i => ((i * 7919) % 1000, i)).toDF("k", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema, clusterBy = Seq("k"))
    t.append(df)
    assert(t.optimizeClustered(numFiles = 5) > 0L)
    val files = t.scanFiles(Seq(DataSkipping.ColPred("k", "<=", 100L)))
    assert(files.size === 1, "a range-sorted layout answers a range probe from one file")
  }

  test("wide-domain and string clustering columns normalize into the curve window") {
    // epoch-microsecond longs and string categories: the curve kernels
    // mask to a 16-bit window, so RAW inputs would cluster on the low
    // bits of the timestamp (noise) and on NULL for strings (cast
    // fails) — normalization min-max scales both into the window
    val dir = tmpDir("clus-wide")
    val base = 1700000000000000L // ~2023 in epoch µs: far above any window
    val rows = (0 until 4096).map { i =>
      (base + (i % 64) * 3600L * 1000000L, f"cat-${(i * 7) % 16}%02d", i.toLong)
    }
    val df = rows.toDF("ts", "cat", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema, clusterBy = Seq("ts", "cat"))
    // interleaved appends: before the rewrite every file spans both dims
    (0 until 4).foreach(b => t.append(df.filter(col("v") % 4 === b).coalesce(1)))
    val nAll = t.snapshot.files.size
    assert(t.scanFiles(Seq(DataSkipping.ColPred("cat", "=", "cat-03"))).size === nAll)
    assert(t.optimizeClustered(numFiles = 16) > 0L)
    val after = DeltaTable.forPath(spark, dir)
    val n = after.snapshot.files.size
    val byCat = after.scanFiles(Seq(DataSkipping.ColPred("cat", "=", "cat-03"))).size
    val byTs = after.scanFiles(Seq(
      DataSkipping.ColPred("ts", "<=", base + 7L * 3600L * 1000000L))).size
    assert(byCat < n, s"string dimension must prune after clustering ($byCat of $n)")
    assert(byTs < n, s"wide-domain dimension must prune after clustering ($byTs of $n)")
    // content exact through the rewrite
    assert(after.toDF.count() === 4096L)
    assert(after.toDF.agg(sum(col("v"))).head().getLong(0) === (0 until 4096).map(_.toLong).sum)
  }

  test("DATE clustering columns: stats-derived bounds parse this engine's epoch-day stats") {
    val dir = tmpDir("clus-date")
    val rows = (0 until 1024).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + i % 32)),
        (i * 13 % 32).toLong)
    }
    val df = rows.toDF("day", "k")
    val t = DeltaTable.forPath(spark, dir).create(df.schema, clusterBy = Seq("day", "k"))
    (0 until 4).foreach(b => t.append(df.filter(col("k") % 4 === b).coalesce(1)))
    assert(t.optimizeClustered(numFiles = 8) > 0L)
    val after = DeltaTable.forPath(spark, dir)
    val n = after.snapshot.files.size
    val oneDay = after.scanFiles(Seq(DataSkipping.ColPred("day", "=",
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19007L))))).size
    assert(oneDay < n, s"date dimension must prune after clustering ($oneDay of $n)")
    assert(after.toDF.count() === 1024L)
  }

  test("incremental maintenance: final ZCubes are skipped, appends re-cluster alone") {
    val dir = tmpDir("clus-incr")
    val df1 = (0L until 2000L).map(i => (i % 64, (i * 37) % 64)).toDF("x", "y")
    val t = DeltaTable.forPath(spark, dir).create(df1.schema, clusterBy = Seq("x", "y"))
    // minCubeSize=1 byte: ANY cube is final — the spec-scale stand-in for
    // "a 100 GB cube on a 100 TB table"
    t.setProperties(Map(DeltaTable.MinCubeSizeKey -> "1"))
    (0 until 2).foreach(b => t.append(df1.filter(col("x") % 2 === b)))
    assert(t.optimizeClustered(numFiles = 4) > 0L)
    val cube1 = t.snapshot.files.map(_.path).toSet
    assert(t.snapshot.files.forall(_.tags.exists(tg =>
      tg.contains(DeltaTable.ZCubeIdTag) &&
        tg.get(DeltaTable.ZCubeCurveTag).contains("hilbert"))),
      "every OPTIMIZE output must carry its ZCube identity")
    // nothing new since the cube finalized: a re-run is a no-op, never a
    // table rewrite
    assert(t.optimizeClustered(numFiles = 4) === -1L)
    // two fresh appends: only THEY are rewritten; the final cube survives
    val df2 = (0L until 1000L).map(i => ((i * 13) % 64, (i * 41) % 64)).toDF("x", "y")
    t.append(df2.coalesce(1))
    t.append(df2.coalesce(1))
    assert(t.optimizeClustered(numFiles = 2) > 0L)
    val after = t.snapshot.files
    assert(cube1.subsetOf(after.map(_.path).toSet),
      "files of a final cube must never be rewritten by incremental maintenance")
    val cubeIds = after.flatMap(_.tags.flatMap(_.get(DeltaTable.ZCubeIdTag))).distinct
    assert(cubeIds.size === 2, "the append batch forms its own new cube")
    assert(t.toDF.count() === 4000L)
  }

  test("ZCube tags survive JSON commits, checkpoints, and log truncation") {
    val dir = tmpDir("clus-tags-ck")
    val df = (0L until 500L).map(i => (i % 32, i % 17)).toDF("x", "y")
    val t = DeltaTable.forPath(spark, dir).create(df.schema, clusterBy = Seq("x", "y"))
    t.setProperties(Map(DeltaTable.MinCubeSizeKey -> "1"))
    t.append(df)
    t.append(df)
    assert(t.optimizeClustered(numFiles = 2) > 0L)
    val v = t.snapshot.version
    t.log.checkpointAt(v)
    // force replay THROUGH the checkpoint: the commit JSONs below it go away
    t.log.cleanupMetadata(v)
    val fresh = DeltaTable.forPath(spark, dir)
    val tags = fresh.snapshot.files.flatMap(_.tags)
    assert(tags.nonEmpty && tags.forall(_.contains(DeltaTable.ZCubeIdTag)),
      "checkpoint replay must preserve add.tags")
    // and the preserved tags still gate: re-maintenance stays a no-op
    assert(fresh.optimizeClustered(numFiles = 2) === -1L)
  }
}
