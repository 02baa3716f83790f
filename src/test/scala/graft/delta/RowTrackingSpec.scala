package graft.delta

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Row tracking (Delta PROTOCOL.md "Row Tracking" / writer features
  * `rowTracking` + `domainMetadata`): commit-time base-row-id blocks from
  * the `delta.rowTracking` domain's high-water mark, `_row_id` /
  * `_row_commit_version` on the read path, and preservation through
  * OPTIMIZE via materialized columns. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(dir: String, extraConf: Map[String, String] = Map.empty) = {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    DeltaTable.forPath(spark, dir).create(df.schema,
      configuration = Map(DeltaTable.RowTrackingConfigKey -> "true") ++ extraConf)
  }

  test("create raises protocol to writer 7 with rowTracking + domainMetadata") {
    val t = mkTable(tmpDir("rt-proto"))
    val p = t.snapshot.protocol.get
    assert(p.minWriterVersion === 7)
    assert(p.writerFeatures.get.contains("rowTracking"))
    assert(p.writerFeatures.get.contains("domainMetadata"))
    // PROTOCOL.md: readerFeatures only when minReaderVersion = 3 — a
    // writer-7-only table must not carry the list
    assert(p.minReaderVersion < 3)
    assert(p.readerFeatures.isEmpty,
      s"writer-7-only protocol must omit readerFeatures: $p")
  }

  test("remove actions preserve row-tracking fields (spec'd log format)") {
    val t = mkTable(tmpDir("rt-remove"))
    (0 until 3).foreach(b =>
      t.append((b * 10 until (b + 1) * 10).map(i => (i.toLong, s"x$i")).toDF("k", "v")))
    val liveIds = t.snapshot.files.map(f => f.path -> f.baseRowId).toMap
    assert(liveIds.values.forall(_.isDefined))
    assert(t.compact() > 0L)
    // the OPTIMIZE commit's removes must carry the removed adds' ids
    val removed = t.log.readVersion(t.snapshot.version).flatMap(_.remove)
    assert(removed.nonEmpty)
    removed.foreach { r =>
      assert(r.baseRowId === liveIds(r.path),
        s"remove for ${r.path} must copy the add's baseRowId")
      assert(r.defaultRowCommitVersion.isDefined)
    }
  }

  test("row ids: contiguous block per commit, unique across commits, version stamped") {
    val t = mkTable(tmpDir("rt-ids"))
    val v1 = t.append((0L until 100L).map(i => (i, s"x$i")).toDF("k", "v"))
    val v2 = t.append((100L until 250L).map(i => (i, s"x$i")).toDF("k", "v"))
    val rows = t.toDFWithRowIds
      .select(col(DeltaTable.RowIdCol), col(DeltaTable.RowCommitVersionCol), col("k"))
      .collect()
    assert(rows.length === 250)
    assert(rows.map(_.getLong(0)).toSet === (0L until 250L).toSet,
      "ids must cover 0..N-1 with no gaps across two commits")
    // every row of one commit carries that commit's version
    val byVersion = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(byVersion === Map(v1 -> 100, v2 -> 150))
    // the domain metadata advanced to the high-water mark
    assert(t.snapshot.domainMetadata(DeltaLog.RowTrackingDomain)
      .contains("\"rowIdHighWaterMark\":249"))
  }

  test("compaction preserves row identity via materialized columns") {
    val t = mkTable(tmpDir("rt-compact"))
    (0 until 4).foreach(b =>
      t.append((b * 50 until (b + 1) * 50).map(i => (i.toLong, s"x$i")).toDF("k", "v")))
    val before = t.toDFWithRowIds
      .select(col("k"), col(DeltaTable.RowIdCol).as("id"),
        col(DeltaTable.RowCommitVersionCol).as("rcv"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(t.compact() > 0L)
    assert(t.snapshot.files.size < 4, "compact must fold the small files")
    val after = t.toDFWithRowIds
      .select(col("k"), col(DeltaTable.RowIdCol).as("id"),
        col(DeltaTable.RowCommitVersionCol).as("rcv"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after === before,
      "every row must keep its (_row_id, _row_commit_version) across OPTIMIZE")
    // and a SECOND rewrite reads the materialized values back out of the
    // compacted files and carries them again
    t.append((200L until 230L).map(i => (i, s"x$i")).toDF("k", "v"))
    assert(t.compact() > 0L)
    val again = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    before.foreach { case (k, (id, _)) => assert(again(k) === id) }
    assert(again.values.toSeq.distinct.length === again.size)
  }

  test("DV delete keeps survivors' ids; fresh appends continue past the mark") {
    val t = mkTable(tmpDir("rt-dv"),
      Map(DeltaTable.DvConfigKey -> "true"))
    t.append((0L until 100L).map(i => (i, s"x$i")).toDF("k", "v"))
    val before = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t.deleteWithDv(col("k") % 3 === 0) > 0L)
    val after = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.keySet === before.keySet.filter(_ % 3 != 0))
    after.foreach { case (k, id) => assert(id === before(k)) }
    // new rows allocate ABOVE the deleted range — ids never recycle
    t.append(Seq((1000L, "z")).toDF("k", "v"))
    val z = t.toDFWithRowIds.filter(col("k") === 1000L)
      .select(col(DeltaTable.RowIdCol)).head().getLong(0)
    assert(z === 100L)
  }

  test("cold reopen and checkpoint replay carry the high-water mark") {
    val dir = tmpDir("rt-ck")
    val t = mkTable(dir)
    // cross the checkpoint interval (10) so the reopen seeds from parquet
    (0 until 11).foreach(b =>
      t.append(Seq((b.toLong, s"b$b")).toDF("k", "v")))
    val reopened = DeltaTable.forPath(spark, dir)
    assert(reopened.snapshot.domainMetadata(DeltaLog.RowTrackingDomain)
      .contains("\"rowIdHighWaterMark\":10"))
    reopened.append(Seq((99L, "z")).toDF("k", "v"))
    val ids = reopened.toDFWithRowIds.select(col(DeltaTable.RowIdCol))
      .collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 12L).toSet)
    // the checkpoint itself must round-trip baseRowId: files replayed
    // from the parquet seed still answer with their committed ids
    val fresh = DeltaTable.forPath(spark, dir)
    assert(fresh.toDFWithRowIds.select(col(DeltaTable.RowIdCol))
      .collect().map(_.getLong(0)).toSet === (0L until 12L).toSet)
  }

  test("DML preserves row identity: DELETE survivors, UPDATE rows, MERGE upserts") {
    val t = mkTable(tmpDir("rt-dml"))
    t.append((0L until 100L).map(i => (i, s"x$i")).toDF("k", "v"))
    val v0 = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // DELETE: survivors keep ids
    assert(t.delete(col("k") % 10 === 0) > 0L)
    val afterDel = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterDel === v0.filter { case (k, _) => k % 10 != 0 })
    // UPDATE: updated rows keep their id; their commit version advances
    // to the update's commit, untouched rows keep theirs
    val updV = t.update(col("k") % 7 === 1, Map("v" -> lit("upd")))
    assert(updV > 0L)
    val afterUpd = t.toDFWithRowIds
      .select(col("k"), col(DeltaTable.RowIdCol), col(DeltaTable.RowCommitVersionCol))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    afterUpd.foreach { case (k, (id, rcv)) =>
      assert(id === afterDel(k), s"UPDATE must not re-identify row k=$k")
      if (k % 7 == 1) assert(rcv === updV, s"updated row k=$k must carry the UPDATE's commit")
    }
    // MERGE: matched rows keep ids; inserts get FRESH ids past the mark
    val src = Seq((3L, "merged"), (1000L, "new")).toDF("k", "v")
    assert(t.merge(src, Seq("k")) > 0L)
    val afterMerge = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterMerge(3L) === afterDel(3L), "merge update must keep the row id")
    assert(afterMerge(1000L) >= 100L, "merge insert must allocate past the mark")
    assert(afterMerge.values.toSeq.distinct.length === afterMerge.size)
  }

  test("purgeDeletionVectors keeps survivors' ids while rewriting DV'd files") {
    val t = mkTable(tmpDir("rt-purge"), Map(DeltaTable.DvConfigKey -> "true"))
    t.append((0L until 60L).map(i => (i, s"x$i")).toDF("k", "v"))
    assert(t.deleteWithDv(col("k") % 4 === 0) > 0L)
    val before = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t.purgeDeletionVectors() > 0L)
    assert(t.snapshot.files.forall(_.deletionVector.isEmpty))
    val after = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before)
  }

  test("shallow clone carries the row-id high-water mark and domains") {
    val t = mkTable(tmpDir("rt-clone"))
    t.append((0L until 20L).map(i => (i, s"x$i")).toDF("k", "v"))
    val cloneDir = tmpDir("rt-clone-dst") + "/t"
    val clone = t.shallowCloneTo(cloneDir)
    assert(clone.snapshot.domainMetadata.contains(DeltaLog.RowTrackingDomain),
      "the clone must inherit the delta.rowTracking domain")
    clone.append((100L until 105L).map(i => (i, "c")).toDF("k", "v"))
    val ids = clone.toDFWithRowIds.select(col(DeltaTable.RowIdCol))
      .collect().map(_.getLong(0))
    assert(ids.length === 25)
    assert(ids.toSet === (0L until 25L).toSet,
      "the clone's first append must allocate PAST the cloned mark, not restart at 0")
  }

  test("two writers racing one table never mint overlapping ids") {
    val dir = tmpDir("rt-race")
    mkTable(dir)
    val a = DeltaTable.forPath(spark, dir)
    val b = DeltaTable.forPath(spark, dir)
    a.append((0L until 40L).map(i => (i, "a")).toDF("k", "v"))
    b.append((100L until 160L).map(i => (i, "b")).toDF("k", "v"))
    a.append((200L until 220L).map(i => (i, "a2")).toDF("k", "v"))
    val ids = DeltaTable.forPath(spark, dir).toDFWithRowIds
      .select(col(DeltaTable.RowIdCol)).collect().map(_.getLong(0))
    assert(ids.length === 120)
    assert(ids.toSet === (0L until 120L).toSet,
      "per-attempt re-stamping must re-allocate against the winner's mark")
  }
}
