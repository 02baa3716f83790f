package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Deletion vectors: the portable RoaringBitmapArray serialization, Z85
  * inline encoding, the DV file framing, and the merge-on-read table
  * semantics ([[DeltaTable.deleteWithDv]] / [[DeltaTable.purgeDeletionVectors]]).
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  // ---- bitmap serialization --------------------------------------------

  test("roaring round-trip: array containers, sparse keys") {
    val xs = Array(0L, 1L, 5L, 65535L, 65536L, 131072L, 1000000L)
    assert(DeletionVectors.deserialize(DeletionVectors.serialize(xs)).toSeq === xs.toSeq)
    assert(DeletionVectors.deserialize(DeletionVectors.serialize(Array.empty[Long])).isEmpty)
  }

  test("roaring round-trip: bitset container past 4096 values") {
    val xs = (0L until 5000L).map(_ * 2).toArray // 5000 values in container 0
    val bytes = DeletionVectors.serialize(xs)
    assert(DeletionVectors.deserialize(bytes).toSeq === xs.toSeq)
    // bitset containers are fixed 8 KiB — the serialization must be far
    // smaller than 2 bytes x values would suggest is the only option
    assert(bytes.length < 10000)
  }

  test("roaring round-trip: values past 2^32 span multiple bitmaps") {
    val xs = Array(3L, (1L << 32) + 7L, (3L << 32) + 1L) // bitmap 2 is empty
    assert(DeletionVectors.deserialize(DeletionVectors.serialize(xs)).toSeq === xs.toSeq)
  }

  test("roaring refuses unsorted input and foreign magics") {
    assertThrows[IllegalArgumentException](
      DeletionVectors.serialize(Array(5L, 3L)))
    assertThrows[IllegalArgumentException](
      DeletionVectors.deserialize(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
  }

  test("z85 round-trip and the reference test vector") {
    // the ZeroMQ spec's canonical vector
    val hello = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(DeletionVectors.z85Encode(hello) === "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq === hello.toSeq)
    val rnd = Array.tabulate(64)(i => (i * 37 + 11).toByte)
    assert(DeletionVectors.z85Decode(DeletionVectors.z85Encode(rnd)).toSeq === rnd.toSeq)
  }

  test("store: inline for small bitmaps, crc-checked file for large; both read back") {
    val dir = tmpDir("dv-store")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val small = Array(1L, 2L, 3L)
    val dSmall = DeletionVectors.store(fs, dir, small)
    assert(dSmall.storageType === "i" && dSmall.cardinality === 3L)
    assert(DeletionVectors.readPositions(fs, dir, dSmall).toSeq === small.toSeq)
    val big = (0L until 2000L).toArray // 2000*2B > inline cap
    val dBig = DeletionVectors.store(fs, dir, big)
    assert(dBig.storageType === "u" && dBig.cardinality === 2000L)
    assert(DeletionVectors.readPositions(fs, dir, dBig).toSeq === big.toSeq)
    // the "u" descriptor stores a z85 UUID (20 chars), NOT a file name —
    // conforming readers derive deletion_vector_<uuid>.bin from it
    assert(dBig.pathOrInlineDv.length === 20)
    val rel = DeletionVectors.relativeFileName(dBig.pathOrInlineDv)
    assert(rel.startsWith("deletion_vector_") && rel.endsWith(".bin"))
    assert(fs.exists(new Path(dir, rel)), "derived physical name must exist on disk")
    // corrupting one bitmap byte must fail the CRC, not return wrong rows
    val p = new Path(dir, rel)
    val bytes = org.apache.commons.io.IOUtils.toByteArray(fs.open(p))
    bytes(dBig.offset.get + 10) = (bytes(dBig.offset.get + 10) ^ 0xFF).toByte
    val out = fs.create(p, true); out.write(bytes); out.close()
    assertThrows[IllegalArgumentException](DeletionVectors.readPositions(fs, dir, dBig))
  }

  // ---- table semantics -------------------------------------------------

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def dvTable(extraConf: Map[String, String] = Map.empty): DeltaTable = {
    val t = DeltaTable.forPath(spark, tmpDir("dv-spec"))
    t.create(schema, Nil,
      configuration = Map(DeltaTable.DvConfigKey -> "true") ++ extraConf)
  }

  private def df(ids: Range) = ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("deleteWithDv deletes rows WITHOUT rewriting any data file") {
    val t = dvTable()
    t.append(df(0 until 100))
    t.append(df(100 until 200))
    val before = t.snapshot.files.map(_.path).toSet
    val v = t.deleteWithDv(col("id") % 10 === 0) // 20 rows across both files
    assert(v > 0)
    val after = t.snapshot.files
    assert(after.map(_.path).toSet === before, "data files must not be rewritten")
    assert(after.forall(_.deletionVector.isDefined))
    assert(after.map(_.deletionVector.get.cardinality).sum === 20L)
    assert(t.toDF.count() === 180L)
    assert(t.toDF.filter(col("id") % 10 === 0).count() === 0L)
    // a delete whose matches are all already deleted is a no-op
    assert(t.deleteWithDv(col("id") % 10 === 0) === -1L)
    // unrelated rows intact
    assert(t.toDF.filter(col("id") === 7L).count() === 1L)
  }

  test("deleteWithDv refuses without the table config") {
    val t = DeltaTable.forPath(spark, tmpDir("dv-off"))
    t.create(schema, Nil)
    t.append(df(0 until 5))
    assertThrows[IllegalArgumentException](t.deleteWithDv(col("id") === 1L))
  }

  test("second DV delete merges bitmaps; full-file deletion degrades to remove") {
    val t = dvTable()
    t.append(df(0 until 50).coalesce(1))   // file A (one part-file)
    t.append(df(50 until 60).coalesce(1))  // file B (10 rows, one part-file)
    assert(t.deleteWithDv(col("id") < 5) > 0)
    assert(t.deleteWithDv(col("id") >= 5 && col("id") < 8) > 0) // merges into A's DV
    val fileA = t.snapshot.files.find(_.deletionVector.isDefined).get
    assert(fileA.deletionVector.get.cardinality === 8L)
    assert(t.toDF.count() === 52L)
    // deleting ALL of file B's remaining rows must remove the file, not
    // carry a 100%-dead DV
    val before = t.snapshot.files.map(_.path).toSet
    assert(t.deleteWithDv(col("id") >= 50) > 0)
    val after = t.snapshot.files
    assert(after.size === before.size - 1)
    assert(t.toDF.count() === 42L)
  }

  test("NULL-predicate rows survive a DV delete (three-valued logic)") {
    val t = DeltaTable.forPath(spark, tmpDir("dv-null"))
    t.create(schema, Nil, configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t.append(Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("id", "v"))
    assert(t.deleteWithDv(col("v") =!= "a") > 0) // NULL row: predicate NULL
    assert(t.toDF.orderBy("id").select("id").as[Long].collect().toSeq === Seq(1L, 2L))
  }

  test("time travel and restore see through DV versions") {
    val t = dvTable()
    t.append(df(0 until 30))                    // v1
    val vDel = t.deleteWithDv(col("id") < 10)   // v2
    assert(t.toDF(1).count() === 30L, "pre-delete version must show all rows")
    assert(t.toDF(vDel).count() === 20L)
    t.restoreTo(1)                              // v3
    assert(t.toDF.count() === 30L, "restore resurrects the DV'd rows")
    assert(t.snapshot.files.forall(_.deletionVector.isEmpty))
  }

  test("purgeDeletionVectors materializes deletes; logical content unchanged") {
    val t = dvTable()
    t.append(df(0 until 100))
    t.deleteWithDv(col("id") >= 90)
    val logical = t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq
    val v = t.purgeDeletionVectors()
    assert(v > 0)
    assert(t.snapshot.files.forall(_.deletionVector.isEmpty))
    assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq === logical)
    // purge on a clean table is a no-op
    assert(t.purgeDeletionVectors() === -1L)
    // the old DV file (if any) is no longer referenced and vacuumable
    assert(t.vacuum(retentionMs = 0L) >= 1) // at least the pre-purge data file
  }

  test("copy-on-write DML on a DV'd table honors the logical view and clears DVs") {
    val t = dvTable()
    t.append(df(0 until 20))
    t.deleteWithDv(col("id") < 5)
    // update must not resurrect DV'd rows
    t.update(col("id") >= 5 && col("id") < 7, Map("v" -> lit("upd")))
    val rows = t.toDF.orderBy("id").collect()
    assert(rows.length === 15)
    assert(rows.take(2).map(_.getString(1)).toSeq === Seq("upd", "upd"))
    // the rewrite materialized the file: no DV left
    assert(t.snapshot.files.forall(_.deletionVector.isEmpty))
    // copy-on-write delete over a DV'd table composes too
    val t2 = dvTable()
    t2.append(df(0 until 20))
    t2.deleteWithDv(col("id") === 0L)
    assert(t2.delete(col("id") < 3) > 0) // removes 1, 2 (0 already gone)
    assert(t2.toDF.count() === 17L)
  }

  test("statsSummary: logical n_rows subtracts DVs; bounds go conservative then recover") {
    val t = dvTable()
    t.append(df(0 until 50))
    val s0 = t.statsSummary(Seq("id")).collect()(0)
    assert(s0.getLong(0) === 50L && s0.getLong(1) === 0L && s0.getLong(2) === 49L)
    t.deleteWithDv(col("id") === 49L)
    val s1 = t.statsSummary(Seq("id")).collect()(0)
    assert(s1.getLong(0) === 49L, "count stays exact under DVs")
    assert(s1.isNullAt(1) && s1.isNullAt(2),
      "a DV'd file's bounds are no longer exact attained values — null, not a lie")
    t.purgeDeletionVectors()
    val s2 = t.statsSummary(Seq("id")).collect()(0)
    assert(s2.getLong(0) === 49L && s2.getLong(1) === 0L && s2.getLong(2) === 48L)
  }

  test("CDF captures DV-deleted rows") {
    val t = DeltaTable.forPath(spark, tmpDir("dv-cdf"))
    t.create(schema, Nil, configuration = Map(
      DeltaTable.DvConfigKey -> "true", DeltaTable.CdfConfigKey -> "true"))
    t.append(df(0 until 10))                    // v1
    val v = t.deleteWithDv(col("id") >= 8)      // v2
    val ch = t.changes(v, v).orderBy("id").collect()
    assert(ch.map(_.getAs[String](DeltaTable.ChangeTypeCol)).toSeq === Seq("delete", "delete"))
    assert(ch.map(_.getLong(0)).toSeq === Seq(8L, 9L))
  }

  test("DV'd adds survive the parquet checkpoint round-trip") {
    val t = dvTable()
    t.append(df(0 until 40))              // v1
    t.deleteWithDv(col("id") < 4)         // v2
    (0 until 8).foreach(i => t.append(df((100 + i) to (100 + i)))) // → v10 checkpoint
    assert(new Path(t.path, "_delta_log/00000000000000000010.checkpoint.parquet")
      .getFileSystem(spark.sessionState.newHadoopConf())
      .exists(new Path(t.path, "_delta_log/00000000000000000010.checkpoint.parquet")))
    // a FRESH reader seeds from the checkpoint — the descriptor must ride it
    val t2 = DeltaTable.forPath(spark, t.path)
    assert(t2.snapshot.files.exists(_.deletionVector.isDefined))
    assert(t2.toDF.filter(col("id") < 4).count() === 0L)
    assert(t2.toDF.count() === 44L)
    // the checkpoint must carry the UPGRADED protocol, not re-stamp the
    // default — a reader seeding from it needs to know DVs are in play
    val p = t2.snapshot.protocol.get
    assert(p.minReaderVersion === 3 && p.minWriterVersion === 7)
    assert(p.readerFeatures.exists(_.contains("deletionVectors")))
  }

  test("partitioned tables: identical basenames across partition dirs don't cross-delete") {
    // one write job CAN reuse a part-file name across partition dirs
    // (dynamic-partition tasks) — the review-flagged collision. Since
    // round 14's per-partition compaction bins no longer produce it
    // naturally, the fixture forges the collision by renaming b's file
    // to a's basename (remove+add commit — legal, paths are opaque).
    // The DV row key must carry the partition dirs, or a delete in p=a
    // also suppresses the same positions in p=b.
    val t = DeltaTable.forPath(spark, tmpDir("dv-part"))
    t.create(StructType(Seq(
      StructField("id", LongType),
      StructField("p", StringType))),
      partitionColumns = Seq("p"),
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    // two separate appends: distinct job UUIDs guarantee the basenames
    // DIFFER, so the forged collision below is deterministic
    t.append((0L until 20L).map(i => (i, "a")).toDF("id", "p"))
    t.append((20L until 40L).map(i => (i, "b")).toDF("id", "p"))
    val snap0 = t.snapshot
    val fa = snap0.files.find(_.partitionValues.values.toSeq.contains("a")).get
    val fb = snap0.files.find(_.partitionValues.values.toSeq.contains("b")).get
    val fsys = new Path(t.path).getFileSystem(spark.sessionState.newHadoopConf())
    val newRel = s"p=b/${new Path(fa.path).getName}"
    locally {
      val in = fsys.open(new Path(t.path, fb.path))
      val out = fsys.create(new Path(t.path, newRel), false)
      try org.apache.commons.io.IOUtils.copy(in, out)
      finally { in.close(); out.close() }
      assert(fsys.delete(new Path(t.path, fb.path), false))
    }
    assert(fsys.exists(new Path(t.path, newRel)), s"dest $newRel missing after copy")
    t.log.commit(Seq(
      Actions.Action(remove = Some(Actions.RemoveFile(fb.path,
        Some(System.currentTimeMillis()), dataChange = false))),
      Actions.Action(add = Some(fb.copy(path = newRel, dataChange = false)))))
    val names = t.snapshot.files.map(f => new Path(f.path).getName)
    assert(names.distinct.size < names.size,
      s"fixture must produce colliding basenames, got $names")
    // delete rows 0..4 — they live ONLY in partition a
    assert(t.deleteWithDv(col("id") < 5) > 0L)
    assert(t.toDF.count() === 35L)
    assert(t.toDF.filter(col("p") === "b").count() === 20L,
      "partition b must be untouched by a's deletion vector")
    assert(t.toDF.filter(col("p") === "a").count() === 15L)
    // and the positions really did come from the right file
    assert(t.toDF.filter(col("id") < 5).count() === 0L)
  }

  test("a DV commit merges the protocol instead of clobbering declared features") {
    val t = DeltaTable.forPath(spark, tmpDir("dv-proto"))
    t.create(StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      configuration = Map(
        DeltaTable.DvConfigKey -> "true",
        DeltaTable.ColumnMappingModeKey -> "name"))
    t.append(df(0 until 10))
    t.deleteWithDv(col("id") === 1L)
    val p = t.snapshot.protocol.get
    assert(p.minReaderVersion === 3 && p.minWriterVersion === 7)
    assert(p.readerFeatures.get.contains("deletionVectors") &&
      p.readerFeatures.get.contains("columnMapping"),
      s"reader features must keep columnMapping: ${p.readerFeatures}")
    assert(p.writerFeatures.get.contains("columnMapping"))
    // the mapped read still works post-DV (physical names + DV anti-join)
    assert(t.toDF.count() === 9L)
    // a later constraint keeps (3,7) and EXTENDS the feature lists —
    // never resets to a hardcoded legacy protocol
    t.addCheckConstraint("pos_id", "id >= 0")
    val p2 = t.snapshot.protocol.get
    assert(p2.minReaderVersion === 3 && p2.minWriterVersion === 7)
    assert(p2.writerFeatures.get.contains("deletionVectors") &&
      p2.writerFeatures.get.contains("checkConstraints") &&
      p2.writerFeatures.get.contains("columnMapping"))
  }

  test("a DV-free table's read plan carries no DV machinery — the common case pays nothing") {
    val t = dvTable()
    t.append(df(0 until 20))
    val clean = t.toDF
    clean.collect()
    val p = clean.queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("__meta"),
      "reads of DV-free tables must not pay any DV cost:\n" + p)
    // and the moment a DV exists, the broadcast-bitmap membership FILTER
    // appears — never a join node (the old driver-exploded anti-join)
    t.deleteWithDv(col("id") === 0L)
    val dv = t.toDF
    dv.collect()
    val pDv = dv.queryExecution.executedPlan.toString
    assert(!pDv.contains("Join"),
      "DV subtraction must be a scan-stage filter, not a join:\n" + pDv)
    assert(pDv.contains("dv_deleted"), pDv)
  }

  test("z85 UUID descriptors round-trip through an optional prefix") {
    val uuid = java.util.UUID.randomUUID()
    val enc = DeletionVectors.encodeUuid(uuid)
    assert(enc.length === 20)
    assert(DeletionVectors.relativeFileName(enc) === s"deletion_vector_$uuid.bin")
    // a random directory prefix before the UUID is part of the path
    assert(DeletionVectors.relativeFileName(s"ab$enc") ===
      s"ab/deletion_vector_$uuid.bin")
  }

  test("deserialize tolerates out-of-order container data (offset-order independence)") {
    // hand-assemble one 32-bit bitmap whose two array containers are
    // stored in REVERSE physical order, inside a 2-bitmap array — the
    // second bitmap parses correctly only if the first repositions by
    // max(offset+len), not by last-read position
    import java.nio.{ByteBuffer, ByteOrder}
    def bitmap(containersReversed: Boolean): Array[Byte] = {
      // containers: key 0 -> [1, 3], key 1 -> [2]
      val n = 2
      val headerLen = 4 + 4 + 4 * n + 4 * n
      val buf = ByteBuffer.allocate(headerLen + 4 + 2).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(12346).putInt(n)
      buf.putShort(0.toShort).putShort(1.toShort) // key 0, card-1 = 1
      buf.putShort(1.toShort).putShort(0.toShort) // key 1, card-1 = 0
      if (containersReversed) {
        buf.putInt(headerLen + 2).putInt(headerLen) // key0 after key1
        buf.putShort(2.toShort)                     // key1 container
        buf.putShort(1.toShort).putShort(3.toShort) // key0 container
      } else {
        buf.putInt(headerLen).putInt(headerLen + 4)
        buf.putShort(1.toShort).putShort(3.toShort)
        buf.putShort(2.toShort)
      }
      buf.array()
    }
    def array(first: Array[Byte]): Array[Byte] = {
      val second = bitmap(containersReversed = false)
      val buf = ByteBuffer.allocate(12 + first.length + second.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(DeletionVectors.PortableMagic).putLong(2L)
      buf.put(first).put(second)
      buf.array()
    }
    val expected = Seq(1L, 3L, 65538L, (1L << 32) + 1L, (1L << 32) + 3L, (1L << 32) + 65538L)
    assert(DeletionVectors.deserialize(array(bitmap(false))).toSeq === expected)
    assert(DeletionVectors.deserialize(array(bitmap(true))).toSeq === expected,
      "out-of-order containers must not corrupt the following bitmap")
    // the serialized-form membership view agrees on both layouts
    Seq(true, false).foreach { rev =>
      val view = new BitmapView(array(bitmap(rev)))
      expected.foreach(v => assert(view.contains(v), s"rev=$rev v=$v"))
      Seq(0L, 2L, 65537L, (1L << 32), (2L << 32) + 1L).foreach(v =>
        assert(!view.contains(v), s"rev=$rev v=$v"))
    }
  }

  test("BitmapView membership agrees with deserialize across container shapes") {
    val xs = ((0L until 5000L).map(_ * 3) ++                 // bitset container
      Seq(70000L, 131071L, 131072L) ++                       // array containers
      Seq((1L << 32) + 5L, (2L << 32) + 65536L)).sorted.toArray
    val view = new BitmapView(DeletionVectors.serialize(xs))
    val set = xs.toSet
    xs.foreach(v => assert(view.contains(v)))
    (0L until 20000L).foreach(v => assert(view.contains(v) === set.contains(v)))
    assert(!view.contains((3L << 32)))
    assert(!view.contains(-1L))
  }

  test("a ~1M-row DV delete stays executor-side: no join, correct subtraction") {
    // the verdict-flagged shape: enough deleted positions that a
    // driver-exploded (file, pos) frame would be the bottleneck. The
    // collected footprint is the COMPRESSED bitmap (~150 KB for 1M
    // mostly-dense positions), and the scan applies it as a broadcast
    // membership filter inside the scan stage.
    val t = dvTable()
    val n = 1200000L
    t.append(spark.range(n).selectExpr("id", "cast(id as string) as v").coalesce(4))
    val v = t.deleteWithDv(col("id") % 6 =!= 0L) // deletes 1,000,000 rows
    assert(v > 0)
    assert(t.snapshot.files.map(_.deletionVector.map(_.cardinality).getOrElse(0L)).sum
      === 1000000L)
    val read = t.toDF
    assert(read.count() === 200000L)
    val plan = read.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "large DVs must not fall back to a join:\n" + plan)
    assert(read.agg(org.apache.spark.sql.functions.sum("id")).as[Long].head()
      === (0L until n by 6L).sum)
  }

  test("vacuum keeps referenced DV files, collects them after purge") {
    val t = dvTable()
    t.append(df(0 until 3000)) // big enough for a file-backed (non-inline) DV
    t.deleteWithDv(col("id") % 2 === 0)
    val fs = new Path(t.path).getFileSystem(spark.sessionState.newHadoopConf())
    val dvFiles = fs.listStatus(new Path(t.path))
      .map(_.getPath.getName).filter(_.startsWith("deletion_vector_"))
    assert(dvFiles.nonEmpty, "1500 deletions must exceed the inline cap")
    t.vacuum(retentionMs = 0L)
    assert(fs.listStatus(new Path(t.path))
      .map(_.getPath.getName).count(_.startsWith("deletion_vector_")) === dvFiles.length,
      "a referenced DV file must survive vacuum")
    assert(t.toDF.count() === 1500L, "post-vacuum reads still subtract the DV")
    t.purgeDeletionVectors()
    t.vacuum(retentionMs = 0L)
    assert(fs.listStatus(new Path(t.path))
      .map(_.getPath.getName).count(_.startsWith("deletion_vector_")) === 0,
      "an unreferenced DV file ages out")
  }

  test("updateWithDv: merge-on-read UPDATE — bitmaps + one new file, zero rewrites") {
    import spark.implicits._
    val dir = tmpDir("dv-upd")
    val df = (0L until 90L).map(i => (i, i * 10)).toDF("k", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true",
        DeltaTable.CdfConfigKey -> "true"))
    t.append(df)
    val before = t.snapshot.files.map(_.path).toSet
    val updV = t.updateWithDv(col("k") % 3 === 0L, Map("v" -> (col("v") + 1L)))
    assert(updV > 0L)
    val after = t.snapshot.files
    assert(before.subsetOf(after.map(_.path).toSet),
      "the original files survive with DV descriptors — no rewrite")
    assert(after.exists(f => before(f.path) && f.deletionVector.isDefined))
    assert(after.exists(f => !before(f.path)), "the transformed rows land in a new file")
    // content: every k%3 row took the update exactly once
    val rows = t.toDF.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size === 90)
    rows.foreach { case (k, v) =>
      assert(v === (if (k % 3 == 0) k * 10 + 1 else k * 10), s"k=$k v=$v") }
    // CDF carries pre/post images for exactly the matched rows
    val feed = t.changes(updV, updV)
    assert(feed.filter(col("_change_type") === "update_preimage").count() === 30L)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .filter(col("v") % 10 === 1L).count() === 30L)
    // repeat updates MERGE bitmaps
    assert(t.updateWithDv(col("k") % 5 === 0L, Map("v" -> (col("v") + 100L))) > 0L)
    assert(t.toDF.count() === 90L)
    // k=15 matched both passes: 150 +1 (first) +100 (second)
    assert(t.toDF.filter(col("k") === 15L).head().getLong(1) === 251L)
  }

  test("updateWithDv preserves row identity; full-file masks degrade to removes") {
    import spark.implicits._
    val dir = tmpDir("dv-upd-rt")
    val df = (0L until 40L).map(i => (i, s"x$i")).toDF("k", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true",
        DeltaTable.RowTrackingConfigKey -> "true"))
    t.append(df)
    val before = t.toDFWithRowIds
      .select(col("k"), col(DeltaTable.RowIdCol)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val updV = t.updateWithDv(col("k") % 4 === 1L, Map("v" -> lit("upd")))
    assert(updV > 0L)
    val after = t.toDFWithRowIds
      .select(col("k"), col(DeltaTable.RowIdCol), col(DeltaTable.RowCommitVersionCol))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    after.foreach { case (k, (id, rcv)) =>
      assert(id === before(k), s"merge-on-read update must not re-identify k=$k")
      if (k % 4 == 1) assert(rcv === updV)
    }
    // full-file mask: update EVERYTHING -> the old file becomes a plain
    // remove (no 100%-dead DV), content fully in the new file
    val t2dir = tmpDir("dv-upd-full")
    val t2 = DeltaTable.forPath(spark, t2dir).create(df.schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t2.append(Seq((1L, "a")).toDF("k", "v"))
    assert(t2.updateWithDv(lit(true), Map("v" -> lit("z"))) > 0L)
    assert(t2.snapshot.files.forall(_.deletionVector.isEmpty),
      "a fully-masked file must degrade to a plain remove")
    assert(t2.toDF.head().getString(1) === "z")
  }

  test("mergeWithDv: CDC-apply upsert — masks + one new file, row identity, inserts") {
    import spark.implicits._
    val dir = tmpDir("dv-merge")
    val df = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true",
        DeltaTable.RowTrackingConfigKey -> "true",
        DeltaTable.CdfConfigKey -> "true"))
    t.append(df)
    val idsBefore = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = t.snapshot.files.map(_.path).toSet
    val src = Seq((3L, "upd3"), (7L, "upd7"), (100L, "new100")).toDF("k", "v")
    val mv = t.mergeWithDv(src, Seq("k"))
    assert(mv > 0L)
    assert(before.subsetOf(t.snapshot.files.map(_.path).toSet),
      "DV merge must not rewrite any original file")
    val rows = t.toDF.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size === 51)
    assert(rows(3L) === "upd3" && rows(7L) === "upd7" && rows(100L) === "new100")
    assert(rows(5L) === "v5")
    // matched rows keep identity; the insert allocates past the mark
    val idsAfter = t.toDFWithRowIds.select(col("k"), col(DeltaTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idsAfter(3L) === idsBefore(3L) && idsAfter(7L) === idsBefore(7L))
    assert(idsAfter(100L) >= 50L)
    assert(idsAfter.values.toSeq.distinct.length === idsAfter.size)
    // CDF: 2 pre + 2 post + 1 insert
    val feed = t.changes(mv, mv)
    assert(feed.groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("update_preimage" -> 2L, "update_postimage" -> 2L, "insert" -> 1L))
    // insert-only outcome commits without masks
    val mv2 = t.mergeWithDv(Seq((200L, "n")).toDF("k", "v"), Seq("k"))
    assert(mv2 > 0L)
    assert(t.toDF.count() === 52L)
    // exactly-once: a replayed (appId, version) batch is a quiet no-op
    assert(t.mergeWithDv(Seq((300L, "x")).toDF("k", "v"), Seq("k"),
      txnAppId = Some("up"), txnVersion = 1L) > 0L)
    assert(t.mergeWithDv(Seq((300L, "y")).toDF("k", "v"), Seq("k"),
      txnAppId = Some("up"), txnVersion = 1L) === -1L)
    assert(t.toDF.filter(col("k") === 300L).head().getString(1) === "x")
  }

  test("merge sources resolve case-insensitively (no silent null-fill)") {
    import spark.implicits._
    val dir = tmpDir("dv-merge-case")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t.append(df)
    // source provides 'V' (different case): must UPDATE, never null-fill
    assert(t.mergeWithDv(Seq((1L, "upd")).toDF("k", "V"), Seq("k")) > 0L)
    assert(t.toDF.filter(col("k") === 1L).head().getString(1) === "upd")
    // same through the copy-on-write merge
    assert(t.merge(Seq((2L, "upd2")).toDF("K", "V"), Seq("k")) > 0L)
    assert(t.toDF.filter(col("k") === 2L).head().getString(1) === "upd2")
  }
}
