package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Version checksums (`<version>.crc`, delta-spark's VersionChecksum
  * sidecar): every commit summarizes the state it produced; replayed
  * snapshots must cross-check cleanly, and a disagreeing checksum must
  * fail loudly — that's the whole point. */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def crcPath(table: String, v: Long): Path =
    new Path(table, "_delta_log/%020d.crc".format(v))

  test("every commit writes a crc that matches the replayed state") {
    val t = DeltaTable.forPath(spark, tmpDir("crc-basic"))
      .create(Seq((0L, "x")).toDF("id", "v").schema)
    t.append((0L until 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(2))
    t.append((50L until 60L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val fs = fsOf(t.path)
    (0L to 2L).foreach(v => assert(fs.exists(crcPath(t.path, v)), s"crc for v$v"))
    t.log.validateChecksum(t.snapshot)
    // DML keeps the running summary honest (numFiles and bytes change)
    assert(t.delete(col("id") < 25L) > 0L)
    t.log.validateChecksum(t.snapshot)
    // historic versions validate against their own crc
    t.log.validateChecksum(t.log.snapshotAt(1L))
  }

  test("deletion-vector tallies ride the checksum") {
    val t = DeltaTable.forPath(spark, tmpDir("crc-dv")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t.append((0L until 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    assert(t.deleteWithDv(col("id") < 7L) > 0L)
    t.log.validateChecksum(t.snapshot)
    val in = fsOf(t.path).open(crcPath(t.path, t.snapshot.version))
    val crc = try Actions.mapper.readValue(in: java.io.InputStream, classOf[VersionChecksum])
    finally in.close()
    assert(crc.numDeletionVectorsOpt === Some(1L))
    assert(crc.numDeletedRecordsOpt === Some(7L))
  }

  test("a disagreeing checksum fails loudly; a missing one validates vacuously") {
    val t = DeltaTable.forPath(spark, tmpDir("crc-bad"))
      .create(Seq((0L, "x")).toDF("id", "v").schema)
    t.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    val fs = fsOf(t.path)
    val p = crcPath(t.path, t.snapshot.version)
    // corrupt: claim one more file than the log replays to
    val good = { val in = fs.open(p)
      try Actions.mapper.readValue(in: java.io.InputStream, classOf[VersionChecksum]) finally in.close() }
    val out = fs.create(p, true)
    try out.write(Actions.mapper.writeValueAsString(good.copy(numFiles = good.numFiles + 1))
      .getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException](t.log.validateChecksum(t.snapshot))
    assert(e.getMessage.contains("numFiles"))
    // gone entirely → vacuous pass (pre-feature logs, external writers)
    fs.delete(p, false)
    t.log.validateChecksum(t.snapshot)
  }

  test("cleanupMetadata retires crc files with their commit JSON") {
    val t = DeltaTable.forPath(spark, tmpDir("crc-gc"))
      .create(Seq((0L, "x")).toDF("id", "v").schema,
        configuration = Map(DeltaTable.CheckpointIntervalKey -> "5"))
    (0 until 10).foreach(i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    assert(t.log.cleanupMetadata(beforeVersion = 10L) > 0)
    val fs = fsOf(t.path)
    assert(!fs.exists(crcPath(t.path, 0L)), "crc below the cutoff must go")
    assert(fs.exists(crcPath(t.path, 10L)), "crc at the surviving tip stays")
    t.log.validateChecksum(DeltaTable.forPath(spark, t.path).snapshot)
  }
}
