package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Log-compaction files (PROTOCOL.md `<from>.<to>.compacted.json`):
  * span aggregation semantics (per-path last action incl. tombstones,
  * last metadata, txns, domain metadata), replay substitution, and
  * metadata-cleanup aging. */
class LogCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("a compacted span replays to the identical state — even with the JSONs gone") {
    val dir = tmpDir("logcomp")
    val t = DeltaTable.forPath(spark, dir).create(
      Seq((0L, "s")).toDF("k", "v").schema,
      configuration = Map(DeltaTable.RowTrackingConfigKey -> "true"))
    (0 until 17).foreach(b =>
      t.append(Seq((b.toLong, s"b$b")).toDF("k", "v"),
        txnAppId = Some("app"), txnVersion = b.toLong))        // v1..v17
    assert(t.delete(col("k") % 5 === 1) > 0L)                  // v18
    t.append(Seq((100L, "z")).toDF("k", "v"))                  // v19
    val expected = t.log.snapshotAt(19L)
    // compact the tail past the v10 checkpoint
    assert(t.compactLog(11L, 18L) > 0)
    // compacting twice is a no-op write (idempotent)
    assert(t.compactLog(11L, 18L) > 0)
    // burn the individual commit JSONs of the span: replay MUST come
    // from the compacted file alone
    val fs = fsOf(dir)
    (11L to 18L).foreach(v => fs.delete(t.log.versionFile(v), false))
    val cold = DeltaTable.forPath(spark, dir)
    val replayed = cold.log.snapshotAt(19L)
    assert(replayed.files.toSet === expected.files.toSet,
      "per-path last actions (incl. the delete's removes) must substitute exactly")
    assert(replayed.txns === expected.txns)
    assert(replayed.domainMetadata === expected.domainMetadata,
      "the row-tracking high-water mark must ride the compacted span")
    assert(replayed.metadata.map(_.schemaString) === expected.metadata.map(_.schemaString))
    // and the live table still answers correctly through the span
    assert(cold.toDF.count() === expected.files.flatMap(_.stats)
      .map(s => Actions.mapper.readTree(s).path("numRecords").asLong(0L)).sum)
    // row ids stay unique and contiguous through compacted replay
    val ids = cold.toDFWithRowIds
      .select(col(DeltaTable.RowIdCol)).as[Long].collect()
    assert(ids.distinct.length === ids.length)
  }

  test("a domain removed inside the span stays removed after substitution") {
    val dir = tmpDir("logcomp-dom")
    val t = DeltaTable.forPath(spark, dir).create(Seq((0L, "s")).toDF("k", "v").schema)
    import Actions._
    t.log.commit(Seq(Action(domainMetadata = Some(DomainMetadata("custom.d", "{}"))),
      Action(commitInfo = Some(CommitInfo(1L, "SET DOMAIN")))))          // v1
    (0 until 10).foreach(b => t.append(Seq((b.toLong, "x")).toDF("k", "v"))) // v2..v11
    t.log.commit(Seq(Action(domainMetadata = Some(DomainMetadata("custom.d",
      removed = true))), Action(commitInfo = Some(CommitInfo(2L, "DROP DOMAIN"))))) // v12
    t.append(Seq((99L, "z")).toDF("k", "v"))                              // v13
    assert(t.compactLog(11L, 12L) > 0)
    val fs = fsOf(dir)
    // burn only the covered interior (cleanup never deletes the tip —
    // latestVersion() is derived from the commit listing)
    (11L to 12L).foreach(v => fs.delete(t.log.versionFile(v), false))
    val cold = DeltaTable.forPath(spark, dir)
    assert(!cold.snapshot.domainMetadata.contains("custom.d"),
      "the tombstone must ride the compacted span — the domain was live at v10")
    assert(cold.toDF.count() === 11L)
  }

  test("compactLog defaults to the span past the newest checkpoint") {
    val dir = tmpDir("logcomp-def")
    val t = DeltaTable.forPath(spark, dir).create(Seq((0L, "s")).toDF("k", "v").schema)
    (0 until 14).foreach(b => t.append(Seq((b.toLong, "x")).toDF("k", "v"))) // ck at v10
    assert(t.compactLog() > 0)
    val fs = fsOf(dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir,
      "_delta_log/" + f"${11L}%020d.${14L}%020d.compacted.json")),
      "the default span must start just past the v10 checkpoint")
  }

  test("compactLog() right after a checkpoint is a quiet no-op") {
    val dir = tmpDir("logcomp-tip")
    val t = DeltaTable.forPath(spark, dir).create(Seq((0L, "s")).toDF("k", "v").schema)
    (0 until 10).foreach(b => t.append(Seq((b.toLong, "x")).toDF("k", "v"))) // ck AT tip
    assert(t.compactLog() === -1, "nothing past the checkpoint -> no-op, not a crash")
  }

  test("user domain metadata: set/remove survive checkpoints and clones; delta.* refuses") {
    val dir = tmpDir("userdom")
    val t = DeltaTable.forPath(spark, dir).create(Seq((0L, "s")).toDF("k", "v").schema)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    assert(t.setDomainMetadata("myapp.retention", "{\"days\":30}") > 0L)
    assert(t.snapshot.protocol.get.writerFeatures.get.contains("domainMetadata"))
    assert(t.domainMetadata("myapp.retention").contains("30"))
    assertThrows[IllegalArgumentException](
      t.setDomainMetadata("delta.rowTracking", "{}"))
    // survives a checkpoint-seeded cold read
    (0 until 10).foreach(b => t.append(Seq((b.toLong, "x")).toDF("k", "v")))
    assert(DeltaTable.forPath(spark, dir)
      .domainMetadata("myapp.retention").contains("30"))
    // and a shallow clone
    val clone = t.shallowCloneTo(tmpDir("userdom-cl") + "/t")
    assert(clone.domainMetadata("myapp.retention").contains("30"))
    // removal tombstones; removing a missing domain is a quiet no-op
    assert(t.removeDomainMetadata("myapp.retention") > 0L)
    assert(!t.domainMetadata.contains("myapp.retention"))
    assert(t.removeDomainMetadata("myapp.retention") === -1L)
  }

  test("metadata cleanup ages a span out with its end version") {
    val dir = tmpDir("logcomp-clean")
    val t = DeltaTable.forPath(spark, dir).create(Seq((0L, "s")).toDF("k", "v").schema)
    (0 until 22).foreach(b => t.append(Seq((b.toLong, s"b$b")).toDF("k", "v")))
    t.compactLog(3L, 8L)
    val fs = fsOf(dir)
    val spanFile = new Path(dir, "_delta_log/" + f"${3L}%020d.${8L}%020d.compacted.json")
    assert(fs.exists(spanFile))
    assert(t.log.cleanupMetadata(20L) > 0)
    assert(!fs.exists(spanFile), "span end 8 < cutoff 20 must age out")
    // snapshots still reconstruct from the surviving checkpoint
    assert(DeltaTable.forPath(spark, dir).toDF.count() === 22L)
  }
}
