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

  test("non-ASCII string keys cluster in true lexicographic order (codepoint slots)") {
    // adversarial fixture for the old 8x8-bit ascii() prefix: CJK
    // codepoints bleed into the previous position's weight, so these
    // 'a*' and 'b*' keys INTERLEAVE in old-ordinal space (a,b,a,b,...)
    // even though lexicographically all 'a*' < all 'b*'. A layout sorted
    // by the broken ordinal gives every file a lex range spanning both
    // groups -> equality predicates match nearly every file. The
    // codepoint-slot ordinal sorts lexicographically -> tight files.
    val keys = (0 until 16).flatMap { i =>
      Seq(s"a${(20000 + 2 * i).toChar}", s"b${(19745 + 2 * i).toChar}")
    }
    val dir = tmpDir("clus-nonascii")
    val rows = (0 until 4096).map(i => (keys(i % 32), keys(i % 32), i.toLong))
    val df = rows.toDF("s", "s2", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    (0 until 4).foreach(b => t.append(df.filter(col("v") % 4 === b).coalesce(1)))
    // zorder on (s, s2) with s2 = s: the interleave of x with itself is
    // monotone in x, so the layout IS the ordinal's sort order — pruning
    // equivalence to a sorted layout is exact
    assert(t.optimizeZOrder(Seq("s", "s2"), 8, None) > 0L)
    val after = DeltaTable.forPath(spark, dir)
    val n = after.snapshot.files.size
    assert(n >= 4, s"need a multi-file layout to measure pruning, got $n")
    val hits = keys.map(k =>
      after.scanFiles(Seq(DataSkipping.ColPred("s", "=", k))).size)
    // sorted layout: 32 equal-frequency keys over >=4 files -> an
    // equality hits 1 file (2 at a boundary). The broken ordinal gives
    // ~n for most keys.
    assert(hits.forall(_ <= 2),
      s"equality must prune to a sorted-layout-tight file set, got ${keys.zip(hits)}")
    assert(after.toDF.count() === 4096L)
    assert(after.toDF.filter(col("s") === keys.head).count() === 128L)
  }

  test("string curve ordinal equals its reference form under BMP fuzz (order-exact)") {
    // the kernel's contract: sum of the first three codepoints, each
    // clamped to 2^17-1, at weights 2^34/2^17/2^0 — exact in a double
    // and monotone w.r.t. string order for BMP text (clamping is
    // monotone). Pin the Spark expression to an independent Scala
    // reference over adversarial mixed-script strings.
    def expected(s: String): Double = {
      val cps = s.codePoints().toArray.take(3)
      (0 until 3).map { i =>
        val cp = if (i < cps.length) math.min(cps(i), 131071) else 0
        cp.toDouble * math.pow(2.0, 17 * (2 - i))
      }.sum
    }
    val rnd = new scala.util.Random(42)
    def randChar(): Char = rnd.nextInt(4) match {
      case 0 => (32 + rnd.nextInt(95)).toChar
      case 1 => (0xA0 + rnd.nextInt(0x60)).toChar
      case 2 => (0x4E00 + rnd.nextInt(0x100)).toChar
      case _ =>
        var c = rnd.nextInt(0xFFFF)
        while (c >= 0xD800 && c <= 0xDFFF) c = rnd.nextInt(0xFFFF)
        c.toChar
    }
    val strs = ((0 until 2000).map(_ =>
      (0 until rnd.nextInt(7)).map(_ => randChar()).mkString) ++
      Seq("", "a", "a中", "b~", "中", "😀ab", "zz￿")).distinct
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val t = DeltaTable.forPath(spark, tmpDir("clus-ordfuzz")).create(
      StructType(Seq(StructField("s", StringType))))
    val ord = t.curveOrdinal(StructField("s", StringType))
    val got = strs.toDF("s").select(col("s"), ord.as("o")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    strs.filterNot(_.exists(Character.isHighSurrogate)).foreach { s =>
      assert(got(s) === expected(s), s"ordinal mismatch for '$s'")
    }
    // astral codepoints (surrogate pairs) still clamp monotonically:
    // every astral first-codepoint string sits at/above the BMP ceiling
    assert(got("😀ab") >= expected("￿"))
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

  test("RENAME of a clustering column keeps existing cubes valid (tags by physical name)") {
    val dir = tmpDir("clus-rename")
    val df = (0L until 1500L).map(i => (i % 64, (i * 37) % 64)).toDF("x", "y")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      clusterBy = Seq("x", "y"),
      configuration = Map(DeltaTable.ColumnMappingModeKey -> "name"))
    t.setProperties(Map(DeltaTable.MinCubeSizeKey -> "1"))
    t.append(df)
    t.append(df)
    assert(t.optimizeClustered(numFiles = 2) > 0L)
    val layout = t.snapshot.files.map(_.path).toSet
    // metadata-only rename of a clustering column: the domain stores
    // physical names (unchanged), and so do the cube tags
    t.renameColumn("x", "x2")
    val renamed = DeltaTable.forPath(spark, dir)
    assert(renamed.clusteringColumns === Seq("x2", "y"))
    assert(renamed.optimizeClustered(numFiles = 2) === -1L,
      "rename must not invalidate final cubes — incremental OPTIMIZE has nothing to do")
    assert(renamed.snapshot.files.map(_.path).toSet === layout,
      "layout must be untouched after a rename + maintenance no-op")
    assert(renamed.toDF.count() === 3000L)
  }
}
