package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Round-16 vacuum scale + safety contracts:
  *  - delete routing: bounded driver pool / toLocalIterator stream below
  *    [[DeltaTable.distributedStatsThreshold]], ONE Spark job above it —
  *    the driver never materializes an inventory-scale candidate list
  *  - inventory schema validation: modificationTime must be epoch-millis
  *    (a raw TimestampType cast yields SECONDS and would void retention)
  *  - VACUUM LITE retention keys off each path's NEWEST tombstone
  *    (delta-spark's rule) so a remove→RESTORE→remove path survives while
  *    its latest remove is inside retention. */
class VacuumScaleSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()

  private def garbageTable(prefix: String, files: Int): (DeltaTable, String) = {
    val dir = tmpDir(prefix)
    val df = (0L until 64L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    // each append lands one file; compact tombstones them all
    (0 until files).foreach(i =>
      t.append(df.filter(col("id") % files === i).coalesce(1)))
    t.compact(minBytes = Long.MaxValue)
    (t, dir)
  }

  private def inventoryOf(dir: String) = {
    val fs = new Path(dir).getFileSystem(hconf)
    fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(st => (st.getPath.toString, st.getLen, false, st.getModificationTime))
      .toSeq.toDF("path", "length", "isDir", "modificationTime")
  }

  test("walk + LITE vacuum deletes route to a Spark job past the threshold") {
    val saved = DeltaTable.distributedStatsThreshold
    try {
      DeltaTable.distributedStatsThreshold = 3
      val (t, _) = garbageTable("vac-route-walk", files = 5)
      assert(t.vacuumDryRun(retentionMs = -1000L).size === 5)
      assert(t.vacuum(retentionMs = -1000L) === 5)
      assert(DeltaTable.lastVacuumDeleteMode === "spark-job")
      assert(t.toDF.count() === 64L)
      // below the threshold: the routine driver pool
      DeltaTable.distributedStatsThreshold = 1000
      val (t2, _) = garbageTable("vac-route-walk-small", files = 2)
      assert(t2.vacuumLite(retentionMs = -1000L) === 2)
      assert(DeltaTable.lastVacuumDeleteMode === "driver-pool")
    } finally DeltaTable.distributedStatsThreshold = saved
  }

  test("inventory vacuum keeps candidates distributed: Spark-job deletes past the threshold, streamed below") {
    val saved = DeltaTable.distributedStatsThreshold
    try {
      DeltaTable.distributedStatsThreshold = 3
      val (t, dir) = garbageTable("vac-route-inv", files = 5)
      val inv = inventoryOf(dir)
      assert(t.vacuumUsingInventory(inv, retentionMs = -1000L, dryRun = true) === 5)
      assert(t.vacuumUsingInventory(inv, retentionMs = -1000L) === 5)
      assert(DeltaTable.lastVacuumDeleteMode === "spark-job")
      assert(t.toDF.count() === 64L)
      assert(t.vacuumDryRun(retentionMs = -1000L).isEmpty)
      // below the threshold: candidates STREAM via toLocalIterator
      DeltaTable.distributedStatsThreshold = 1000
      val (t2, dir2) = garbageTable("vac-route-inv-small", files = 2)
      assert(t2.vacuumUsingInventory(inventoryOf(dir2), retentionMs = -1000L) === 2)
      assert(DeltaTable.lastVacuumDeleteMode === "driver-stream")
      assert(t2.toDF.count() === 64L)
    } finally DeltaTable.distributedStatsThreshold = saved
  }

  test("inventory schema validates: timestamps convert to millis, junk types refuse") {
    val (t, dir) = garbageTable("vac-inv-schema", files = 2)
    val inv = inventoryOf(dir)
    // TimestampType converts via unix_millis — with a REAL retention the
    // fresh tombstones are inside the window, so nothing may delete. The
    // round-15 bug (cast("long") → epoch SECONDS, "older" by 1000×) would
    // delete both.
    val tsInv = inv.withColumn("modificationTime",
      timestamp_millis(col("modificationTime")))
    assert(tsInv.schema("modificationTime").dataType === TimestampType)
    assert(t.vacuumUsingInventory(tsInv, retentionMs = 24L * 3600 * 1000) === 0)
    assert(t.toDF.count() === 64L)
    // ...and converts correctly when past retention
    assert(t.vacuumUsingInventory(tsInv, retentionMs = -1000L) === 2)
    // junk modificationTime types refuse loudly
    val (t3, dir3) = garbageTable("vac-inv-schema-bad", files = 2)
    val bad = inventoryOf(dir3).withColumn("modificationTime",
      col("modificationTime").cast("string"))
    val e = intercept[IllegalArgumentException](
      t3.vacuumUsingInventory(bad, retentionMs = -1000L))
    assert(e.getMessage.contains("modificationTime"))
    // missing required columns refuse loudly
    val e2 = intercept[IllegalArgumentException](
      t3.vacuumUsingInventory(inventoryOf(dir3).drop("isDir"), retentionMs = -1000L))
    assert(e2.getMessage.contains("isDir"))
  }

  test("wide walk levels list via a Spark job; FSCK probes route likewise") {
    val saved = DeltaTable.distributedStatsThreshold
    try {
      DeltaTable.distributedStatsThreshold = 4
      // 8 partition dirs = one BFS level wider than the threshold
      val dir = tmpDir("vac-walk-dist")
      val df = (0L until 64L).map(i => (i, s"v$i", i % 8)).toDF("id", "v", "p")
      val t = DeltaTable.forPath(spark, dir).create(df.schema, Seq("p"))
      t.append(df.filter(col("id") < 32L))
      t.append(df.filter(col("id") >= 32L))
      t.compact(minBytes = Long.MaxValue) // 2 files/partition → 1
      val dry = t.vacuumDryRun(retentionMs = -1000L)
      assert(DeltaTable.lastWalkListMode === "spark-job")
      assert(dry.size === 16, s"two pre-compact files per partition: $dry")
      assert(t.vacuum(retentionMs = -1000L) === 16)
      assert(t.toDF.count() === 64L)
      // FSCK: 8 live files ≥ threshold → the existence probes run as a
      // Spark job, and only the dangling paths ship back
      assert(t.snapshot.files.size === 8)
      val fs = new Path(dir).getFileSystem(hconf)
      val victims = t.snapshot.files.map(_.path).sorted.take(2)
      victims.foreach(p => fs.delete(new Path(dir, p), false))
      val dangling = t.fsckRepair(dryRun = true)
      assert(DeltaTable.lastExistenceProbeMode === "spark-job")
      assert(dangling === victims)
      assert(t.fsckRepair() === victims)
      assert(t.toDF.count() === 48L)
    } finally DeltaTable.distributedStatsThreshold = saved
  }

  test("LITE retention keys off the NEWEST tombstone per path (remove-RESTORE-remove)") {
    val dir = tmpDir("vac-lite-newest")
    val df = (0L until 32L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    t.append(df.filter(col("id") < 16L).coalesce(1))  // v1: A
    t.append(df.filter(col("id") >= 16L).coalesce(1)) // v2: B
    val vTwoFiles = t.snapshot.version
    val ab = t.snapshot.files.map(_.path).toSet
    t.compact(minBytes = Long.MaxValue)               // v3: old tombstones for A,B
    t.restoreTo(vTwoFiles)                            // v4: A,B re-added, C tombstoned
    Thread.sleep(1500)
    t.compact(minBytes = Long.MaxValue)               // v5: FRESH tombstones for A,B
    // cutoff lands between the old tombstones and the fresh ones: under
    // the per-remove rule A,B would collect via their v3 tombstones even
    // though their v5 removes are inside retention — breaking readers
    // pinned to v1..v4. The newest-per-path rule keeps them; C (its only
    // tombstone is old) collects.
    val kept = t.vacuumLiteDryRun(retentionMs = 700L)
    assert(!kept.exists(ab), s"A/B must survive (newest remove in-window): $kept")
    assert(kept.size === 1, s"the restore-tombstoned compact output collects: $kept")
    assert(t.vacuumLite(retentionMs = 700L) === 1)
    assert(t.toDF(vTwoFiles).count() === 32L, "pinned readers keep their files")
    assert(t.toDF(t.snapshot.version - 1).count() === 32L)
    // once the fresh removes age past the cutoff, A and B collect too
    assert(t.vacuumLite(retentionMs = -1000L) === 2)
    assert(t.toDF.count() === 32L)
  }
}
