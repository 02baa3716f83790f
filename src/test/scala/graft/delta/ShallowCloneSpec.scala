package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Shallow clone: zero-copy fork via absolute-path add references;
  * clone DML never touches the source; DVs ride as absolute "p"
  * descriptors. */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def df(ids: Range) = ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")

  private def parquetCount(dir: String): Int = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: Path): Int =
      if (!fs.exists(p)) 0
      else fs.listStatus(p).map { st =>
        if (st.isDirectory) {
          if (st.getPath.getName == "_delta_log") 0 else walk(st.getPath)
        } else if (st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.toString.contains("_delta_log")) 1
        else 0
      }.sum
    walk(new Path(dir))
  }

  test("clone copies zero data files; reads equal the source; DML isolates") {
    val src = DeltaTable.forPath(spark, tmpDir("clone-src")).create(schema)
    src.append(df(0 until 100))
    src.append(df(100 until 150))
    val cloneDir = tmpDir("clone-dst")
    val clone = src.shallowCloneTo(cloneDir + "/t")
    assert(parquetCount(cloneDir + "/t") === 0, "a SHALLOW clone must copy nothing")
    assert(clone.toDF.count() === 150L)
    assert(clone.toDF.orderBy("id").collect()(7).getString(1) === "v7")
    // stats rode along: log-only count answers without opening parquet
    assert(clone.statsSummary(Seq("id")).collect()(0).getLong(0) === 150L)
    // DML on the clone: local rewrite + log-level remove of the reference
    assert(clone.delete(col("id") < 50) > 0L)
    assert(clone.toDF.count() === 100L)
    assert(src.toDF.count() === 150L, "the source must never observe clone DML")
    // appends land locally
    clone.append(df(1000 until 1010))
    assert(clone.toDF.count() === 110L && src.toDF.count() === 150L)
    // re-clone refuses over an existing table
    assertThrows[IllegalArgumentException](src.shallowCloneTo(cloneDir + "/t"))
  }

  test("deletion vectors ride the clone as absolute descriptors") {
    val src = DeltaTable.forPath(spark, tmpDir("clone-dv-src")).create(schema, Nil,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    src.append(df(0 until 3000)) // big enough for a file-backed DV
    src.deleteWithDv(col("id") % 2 === 0)
    val clone = src.shallowCloneTo(tmpDir("clone-dv-dst") + "/t")
    val dv = clone.snapshot.files.flatMap(_.deletionVector)
    assert(dv.nonEmpty && dv.forall(d => d.storageType == "p" || d.storageType == "i"))
    assert(clone.toDF.count() === 1500L, "the clone subtracts the source's DV")
    assert(clone.toDF.filter(col("id") % 2 === 0).count() === 0L)
  }

  test("partitioned sources clone: partition columns resolve from the log") {
    val src = DeltaTable.forPath(spark, tmpDir("clone-part-src")).create(
      StructType(Seq(
        StructField("id", LongType),
        StructField("bucket", LongType),
        StructField("v", StringType))), Seq("bucket"))
    src.append((0 until 40).map(i => (i.toLong, (i % 4).toLong, s"v$i"))
      .toDF("id", "bucket", "v"))
    val cloneDir = tmpDir("clone-part-dst") + "/t"
    val clone = src.shallowCloneTo(cloneDir)
    assert(parquetCount(cloneDir) === 0)
    assert(clone.partitionColumns === Seq("bucket"))
    // partition column reads back TYPED from add.partitionValues (no
    // shared basePath exists for the absolute foreign references)
    assert(clone.toDF.count() === 40L)
    assert(clone.toDF.filter(col("bucket") === 2L).count() === 10L)
    assert(clone.toDF.orderBy("id").collect()(6).getLong(1) === 2L)
    // partition pruning still flows from the log's partitionValues
    val pruned = clone.scanFiles(Seq(DataSkipping.ColPred("bucket", "=", 1L)))
    assert(pruned.nonEmpty && pruned.size < clone.snapshot.files.size)
    // clone DML on one partition isolates from the source
    assert(clone.delete(col("bucket") === 0L) > 0L)
    assert(clone.toDF.count() === 30L && src.toDF.count() === 40L)
    // post-clone local appends mix with foreign files correctly
    clone.append(Seq((100L, 9L, "new")).toDF("id", "bucket", "v"))
    assert(clone.toDF.count() === 31L)
    assert(clone.toDF.filter(col("bucket") === 9L).count() === 1L)
  }

  test("clone at a historic version; SQL SHALLOW CLONE statement") {
    val src = DeltaTable.forPath(spark, tmpDir("clone-v-src")).create(schema)
    src.append(df(0 until 10))  // v1
    src.append(df(10 until 30)) // v2
    val old = src.shallowCloneTo(tmpDir("clone-v-dst") + "/t", version = 1L)
    assert(old.toDF.count() === 10L, "VERSION AS OF 1 clone sees only v1 rows")
    // SQL statement form, current version
    val dst2 = tmpDir("clone-v-sql") + "/t"
    val r = spark.sql(
      s"CREATE TABLE delta.`$dst2` SHALLOW CLONE delta.`${src.path}`").head()
    assert(r.getLong(2) === 2L)
    assert(DeltaTable.forPath(spark, dst2).toDF.count() === 30L)
    // SQL statement form, historic version
    val dst3 = tmpDir("clone-v-sql1") + "/t"
    spark.sql(
      s"CREATE TABLE delta.`$dst3` SHALLOW CLONE delta.`${src.path}` VERSION AS OF 1")
    assert(DeltaTable.forPath(spark, dst3).toDF.count() === 10L)
  }

  test("deep clone: full copy, source vacuum cannot break it, DVs re-store") {
    val src = DeltaTable.forPath(spark, tmpDir("dclone-src")).create(
      StructType(Seq(
        StructField("id", LongType),
        StructField("part", StringType),
        StructField("v", StringType))), Seq("part"),
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    src.append((0 until 3000).map(i => (i.toLong, s"p${i % 2}", s"v$i"))
      .toDF("id", "part", "v"))
    src.deleteWithDv(col("id") % 3 === 0) // file-backed DV rides the clone
    val cloneDir = tmpDir("dclone-dst") + "/t"
    val clone = src.deepCloneTo(cloneDir)
    assert(parquetCount(cloneDir) > 0, "a DEEP clone must copy the data files")
    assert(clone.toDF.count() === 2000L)
    assert(clone.toDF.filter(col("id") % 3 === 0).count() === 0L,
      "the source's deletion vectors must re-store into the clone")
    assert(clone.toDF.filter(col("part") === "p1").count() === 1000L,
      "partition layout must survive the copy")
    // stats rode verbatim: log-only LIVE count (numRecords minus DV
    // cardinality) without opening parquet
    assert(clone.statsSummary(Seq("id")).collect()(0).getLong(0) === 2000L)
    // SQL DEEP CLONE at a historic version (before the source's files
    // can be vacuumed away — historic clones read live bytes like any
    // time travel)
    val dst2 = tmpDir("dclone-sql") + "/t"
    spark.sql(s"CREATE TABLE delta.`$dst2` DEEP CLONE delta.`${src.path}` VERSION AS OF 1")
    assert(DeltaTable.forPath(spark, dst2).toDF.count() === 3000L)
    // TIMESTAMP AS OF resolves through the same versionAt rule as time
    // travel: an instant far in the future pins the latest version
    val dst3 = tmpDir("dclone-sqlts") + "/t"
    val future = java.time.Instant.ofEpochMilli(System.currentTimeMillis() + 3600000L)
    spark.sql(s"CREATE TABLE delta.`$dst3` SHALLOW CLONE delta.`${src.path}` " +
      s"TIMESTAMP AS OF '$future'")
    assert(DeltaTable.forPath(spark, dst3).toDF.count() === src.toDF.count())
    // independence: vacuum + DML on the source never reach the clone
    assert(src.delete(col("id") < 1000L) > 0L)
    src.vacuum(retentionMs = 0L)
    assert(clone.toDF.count() === 2000L, "the clone owns its bytes")
    // and clone DML never reaches the source
    assert(clone.delete(col("part") === "p0") > 0L)
    assert(src.toDF.count() === 1334L)
  }

  test("deep clone of a shallow clone materializes the absolute references") {
    val base = DeltaTable.forPath(spark, tmpDir("dclone-chain-base")).create(schema)
    base.append(df(0 until 50))
    val sh = base.shallowCloneTo(tmpDir("dclone-chain-sh") + "/t")
    val deepDir = tmpDir("dclone-chain-deep") + "/t"
    val deep = sh.deepCloneTo(deepDir)
    assert(parquetCount(deepDir) > 0)
    assert(deep.snapshot.files.forall(f => !new Path(f.path).isAbsolute),
      "a deep clone's references must all be local")
    assert(deep.toDF.count() === 50L)
    // the chain's origin can now disappear entirely
    base.delete(lit(true))
    base.vacuum(retentionMs = 0L)
    assert(deep.toDF.count() === 50L)
  }

  test("partitioned + column-mapped + DV source clones and reads logical") {
    val src = DeltaTable.forPath(spark, tmpDir("clone-pm-src")).create(
      StructType(Seq(
        StructField("id", LongType),
        StructField("part", StringType))), Seq("part"),
      configuration = Map(
        DeltaTable.ColumnMappingModeKey -> "name",
        DeltaTable.DvConfigKey -> "true"))
    src.append((0 until 30).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "part"))
    src.deleteWithDv(col("id") % 2 === 0)
    val clone = src.shallowCloneTo(tmpDir("clone-pm-dst") + "/t")
    assert(clone.toDF.columns.toSeq === Seq("id", "part"))
    assert(clone.toDF.count() === 15L, "clone subtracts the source DV")
    assert(clone.toDF.filter(col("part") === "p1").count() === 5L)
    assert(clone.toDF.filter(col("id") % 2 === 0).count() === 0L)
  }
}
