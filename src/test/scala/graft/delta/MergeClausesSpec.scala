package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.delta.DeltaTable._

/** The full MERGE clause surface ([[DeltaTable.mergeClauses]]):
  * conditional matched update/delete, conditional inserts,
  * NOT MATCHED BY SOURCE update/delete, first-satisfied-wins ordering,
  * the duplicate-source-key refusal, CDF capture, and row-tracking
  * identity across a clause merge. */
class MergeClausesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("tag", StringType)))

  private def target(name: String, cfg: Map[String, String] = Map.empty): DeltaTable = {
    val t = DeltaTable.forPath(spark, tmpDir(name)).create(schema,
      configuration = cfg)
    t.append((0L until 10L).map(i => (i, i * 10, "base")).toDF("id", "v", "tag"))
    t
  }

  test("applyChanges: within-batch argmax, cross-batch staleness, sequenced deletes") {
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("seq", LongType),
      StructField("v", StringType)))
    val t = DeltaTable.forPath(spark, tmpDir("mc-applych")).create(sch)
    // batch 1, deliberately disordered within keys:
    //  k=1: seq 5 "new" beats seq 2 "old"; k=2: seq 3 then DELETED at 7;
    //  k=3: insert at 4; k=4: a delete for an absent key (no-op);
    //  k=5: same-seq tie — the delete wins
    val b1 = Seq(
      (1L, 2L, "old", "U"), (1L, 5L, "new", "U"),
      (2L, 3L, "x", "U"), (2L, 7L, "x", "D"),
      (3L, 4L, "three", "U"),
      (4L, 9L, "gone", "D"),
      (5L, 6L, "tie", "U"), (5L, 6L, "tie", "D")
    ).toDF("k", "seq", "v", "op")
    assert(t.applyChanges(b1, Seq("k"), "seq", Some("op = 'D'")) > 0L)
    val s1 = t.toDF.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(s1.toSeq === Seq((1L, 5L, "new"), (3L, 4L, "three")),
      s"got ${s1.toSeq}")
    // batch 2: stale update for k=1 (seq 3 < stored 5) must NO-OP; stale
    // delete for k=3 (seq 1 < 4) must no-op; fresh update k=3; new k=6
    val b2 = Seq(
      (1L, 3L, "stale", "U"),
      (3L, 1L, "x", "D"), (3L, 8L, "three2", "U"),
      (6L, 2L, "six", "U")
    ).toDF("k", "seq", "v", "op")
    assert(t.applyChanges(b2, Seq("k"), "seq", Some("op = 'D'")) > 0L)
    val s2 = t.toDF.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(s2.toSeq === Seq((1L, 5L, "new"), (3L, 8L, "three2"), (6L, 2L, "six")),
      s"got ${s2.toSeq}")
    // the op marker never lands in the table; exactly-once via txn
    assert(t.schema.fieldNames.toSeq === Seq("k", "seq", "v"))
    assert(t.applyChanges(b2, Seq("k"), "seq", Some("op = 'D'"),
      txnAppId = Some("cdc"), txnVersion = 1L) > 0L)
    assert(t.applyChanges(b2, Seq("k"), "seq", Some("op = 'D'"),
      txnAppId = Some("cdc"), txnVersion = 1L) === -1L)
    // sequence column required on the table
    val bare = DeltaTable.forPath(spark, tmpDir("mc-applych-bare")).create(
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
    assertThrows[IllegalArgumentException](
      bare.applyChanges(b2, Seq("k"), "seq", Some("op = 'D'")))
  }

  test("applyChanges on a DV table is merge-on-read: zero rewrites, same state") {
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("seq", LongType),
      StructField("v", StringType)))
    val t = DeltaTable.forPath(spark, tmpDir("mc-applych-dv")).create(sch,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t.append((0L until 20L).map(i => (i, 0L, s"v$i")).toDF("k", "seq", "v"))
    val before = t.snapshot.files.map(_.path).toSet
    val feed = Seq(
      (3L, 5L, "upd", "U"), (7L, 5L, "x", "D"), (100L, 5L, "new", "U")
    ).toDF("k", "seq", "v", "op")
    assert(t.applyChanges(feed, Seq("k"), "seq", Some("op = 'D'")) > 0L)
    val after = t.snapshot.files
    // original files all survive (masked by DV where claimed) + one new
    assert(before.subsetOf(after.map(_.path).toSet),
      "merge-on-read must not rewrite claimed files")
    assert(after.exists(_.deletionVector.isDefined))
    val rows = t.toDF.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 20) // 20 - deleted 7 + inserted 100
    assert(rows.find(_._1 == 3L).get === ((3L, 5L, "upd")))
    assert(!rows.exists(_._1 == 7L))
    assert(rows.find(_._1 == 100L).get === ((100L, 5L, "new")))
  }

  test("CDC apply: op=D deletes, op=U updates, op=I inserts, one commit") {
    val t = target("mc-cdc")
    // source op column is NOT a table column — project it into clauses
    // via conditions on a provided column instead: here we encode ops in
    // `tag` (the table HAS tag), the realistic CDC-payload shape
    val src = Seq(
      (1L, 0L, "D"),   // delete id 1
      (2L, 222L, "U"), // update id 2
      (20L, 200L, "I") // insert id 20
    ).toDF("id", "v", "tag")
    val v = t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedDelete(condition = Some("s.tag = 'D'")),
      WhenMatchedUpdate(set = Map("v" -> "s.v", "tag" -> "'upd'"),
        condition = Some("s.tag = 'U'")),
      WhenNotMatchedInsert(values = Map("id" -> "s.id", "v" -> "s.v", "tag" -> "'ins'"),
        condition = Some("s.tag = 'I'"))))
    assert(v > 0L)
    val out = t.toDF.orderBy("id").collect()
    assert(out.length === 10) // 10 - 1 deleted + 1 inserted
    assert(!out.exists(_.getLong(0) == 1L), "id 1 deleted")
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getLong(1) === 222L && r2.getString(2) === "upd")
    val r20 = out.find(_.getLong(0) == 20L).get
    assert(r20.getLong(1) === 200L && r20.getString(2) === "ins")
    // untouched rows carried exactly
    assert(out.find(_.getLong(0) == 5L).get.getLong(1) === 50L)
  }

  test("first satisfied clause wins within a group; unclaimed rows carry/drop") {
    val t = target("mc-order")
    val src = Seq((3L, 999L, "x"), (30L, 1L, "skip")).toDF("id", "v", "tag")
    t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedUpdate(set = Map("v" -> "t.v + 1"), condition = Some("s.v > 0")),
      WhenMatchedUpdate(set = Map("v" -> "0")), // shadowed for s.v>0 rows
      WhenNotMatchedInsert(condition = Some("s.tag = 'ins'")))) // claims nothing
    val out = t.toDF.orderBy("id").collect()
    assert(out.length === 10, "unclaimed source row must NOT insert")
    assert(out.find(_.getLong(0) == 3L).get.getLong(1) === 31L,
      "first matched clause (t.v + 1) wins over the later unconditional one")
  }

  test("an earlier unconditional clause refuses; by-source SET * refuses") {
    val t = target("mc-guard")
    val src = Seq((1L, 1L, "s")).toDF("id", "v", "tag")
    assertThrows[IllegalArgumentException](t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedUpdate(), WhenMatchedDelete())))
    assertThrows[IllegalArgumentException](t.mergeClauses(src, Seq("id"), Seq(
      WhenNotMatchedBySourceUpdate(set = Map.empty))))
  }

  test("NOT MATCHED BY SOURCE delete = full-sync; update tags stale rows") {
    val t = target("mc-nmbs")
    // source carries only ids 0-4: 5-9 are "stale"
    val src = (0L until 5L).map(i => (i, i * 10, "keep")).toDF("id", "v", "tag")
    t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedUpdate(),
      WhenNotMatchedBySourceDelete(condition = Some("t.id >= 8")),
      WhenNotMatchedBySourceUpdate(set = Map("tag" -> "'stale'"))))
    val out = t.toDF.orderBy("id").collect()
    assert(out.length === 8, "ids 8,9 deleted by source absence")
    assert(out.filter(_.getString(2) == "stale").map(_.getLong(0)).toSeq === Seq(5L, 6L, 7L))
    assert(out.filter(_.getLong(0) < 5L).forall(_.getString(2) == "keep"),
      "matched rows took the source's tag via SET *")
  }

  test("duplicate source keys matching a target row refuse loudly") {
    val t = target("mc-dup")
    val src = Seq((2L, 1L, "a"), (2L, 2L, "b")).toDF("id", "v", "tag")
    val e = intercept[IllegalArgumentException](t.mergeClauses(src, Seq("id"),
      Seq(WhenMatchedUpdate())))
    assert(e.getMessage.contains("multiple source rows"))
    // duplicates that match NOTHING are legal (they insert as two rows)
    val src2 = Seq((50L, 1L, "a"), (50L, 2L, "b")).toDF("id", "v", "tag")
    t.mergeClauses(src2, Seq("id"), Seq(WhenMatchedUpdate(), WhenNotMatchedInsert()))
    assert(t.toDF.filter(col("id") === 50L).count() === 2L)
  }

  test("CDF captures update pre/post, delete, insert across clause kinds") {
    val t = target("mc-cdf", Map(DeltaTable.CdfConfigKey -> "true"))
    val preV = t.log.latestVersion()
    val src = Seq((2L, 222L, "U"), (20L, 200L, "I")).toDF("id", "v", "tag")
    t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedUpdate(set = Map("v" -> "s.v")),
      WhenNotMatchedInsert(),
      WhenNotMatchedBySourceDelete(condition = Some("t.id = 9"))))
    val ch = t.changes(preV + 1, preV + 1)
      .select("id", "v", DeltaTable.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(ch.contains((2L, 20L, "update_preimage")))
    assert(ch.contains((2L, 222L, "update_postimage")))
    assert(ch.contains((9L, 90L, "delete")))
    assert(ch.contains((20L, 200L, "insert")))
  }

  test("row tracking: updates keep ids, carried rows keep version, inserts get fresh") {
    val t = DeltaTable.forPath(spark, tmpDir("mc-rt")).create(schema,
      configuration = Map(DeltaTable.RowTrackingConfigKey -> "true"))
    t.append((0L until 6L).map(i => (i, i * 10, "base")).toDF("id", "v", "tag"))
    val before = t.toDFWithRowIds.select("id", DeltaTable.RowIdCol).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val src = Seq((1L, 111L, "u"), (60L, 600L, "i")).toDF("id", "v", "tag")
    t.mergeClauses(src, Seq("id"), Seq(WhenMatchedUpdate(), WhenNotMatchedInsert()))
    val after = t.toDFWithRowIds.select("id", DeltaTable.RowIdCol).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after(1L) === before(1L), "an updated row keeps its row id")
    assert((0L until 6L).filter(_ != 1L).forall(i => after(i) === before(i)))
    assert(!before.values.toSet.contains(after(60L)), "insert gets a fresh id")
  }

  test("partitioned target: clause merge rewrites only claimed partitions' files") {
    val t = DeltaTable.forPath(spark, tmpDir("mc-part")).create(
      StructType(schema.fields :+ StructField("p", StringType)), Seq("p"))
    t.append((0L until 40L).map(i => (i, i * 10, "base", s"p${i % 4}"))
      .toDF("id", "v", "tag", "p"))
    val filesBefore = t.snapshot.files.map(_.path).toSet
    val src = Seq((4L, 444L, "u", "p0")).toDF("id", "v", "tag", "p")
    t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedUpdate(set = Map("v" -> "s.v"))))
    val stillThere = t.snapshot.files.map(_.path).toSet.intersect(filesBefore)
    assert(stillThere.exists(_.contains("p=p1")),
      "a merge claiming only p0 rows must not rewrite p1 files")
    assert(t.toDF.filter(col("id") === 4L).head().getLong(1) === 444L)
  }

  test("marker columns outside the table schema drive conditions but never write") {
    val t = target("mc-marker")
    // `op` is NOT a table column — the Debezium-style CDC payload shape
    val src = Seq(
      (1L, 0L, "x", "delete"),
      (2L, 222L, "u2", "update"),
      (30L, 300L, "i30", "insert"),
      (31L, 0L, "x", "delete") // delete of an absent key: dropped, not inserted
    ).toDF("id", "v", "tag", "op")
    t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedDelete(condition = Some("s.op = 'delete'")),
      WhenMatchedUpdate(),
      WhenNotMatchedInsert(condition = Some("op != 'delete'"))))
    assert(t.toDF.columns.toSeq === Seq("id", "v", "tag"),
      "SET * / INSERT * must exclude the marker column")
    val out = t.toDF.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size === 10 && !out.contains(1L) && !out.contains(31L))
    assert(out(2L) === ((222L, "u2")) && out(30L) === ((300L, "i30")))
  }

  test("mergeSchema: extra source columns widen the schema in the same commit") {
    val t = target("mc-evolve")
    val v0 = t.log.latestVersion()
    val src = Seq((2L, 222L, "u2", 3.5), (30L, 300L, "i30", 7.25))
      .toDF("id", "v", "tag", "score")
    t.mergeClauses(src, Seq("id"),
      Seq(WhenMatchedUpdate(), WhenNotMatchedInsert()), mergeSchema = true)
    assert(t.log.latestVersion() === v0 + 1, "evolution + rewrite = ONE commit")
    assert(t.schema.fieldNames.toSeq === Seq("id", "v", "tag", "score"))
    val out = t.toDF.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out.size === 11)
    assert(out(2L) === Some(3.5), "matched SET * writes the new column")
    assert(out(30L) === Some(7.25), "INSERT * carries the new column")
    assert(out(5L) === None, "carried rows read the new column as NULL")
    // time travel still reads the OLD schema
    assert(t.toDF(v0).columns.toSeq === Seq("id", "v", "tag"))
  }

  test("mergeSchema on a column-mapped table: evolved columns get fresh ids") {
    val t = DeltaTable.forPath(spark, tmpDir("mc-evmap")).create(schema,
      configuration = Map(DeltaTable.ColumnMappingModeKey -> "name"))
    t.append((0L until 4L).map(i => (i, i * 10, "base")).toDF("id", "v", "tag"))
    val src = Seq((1L, 11L, "u", "extra1")).toDF("id", "v", "tag", "note")
    t.mergeClauses(src, Seq("id"),
      Seq(WhenMatchedUpdate(), WhenNotMatchedInsert()), mergeSchema = true)
    val f = t.schema("note")
    assert(f.metadata.contains(DeltaTable.ColMapIdKey) &&
      f.metadata.contains(DeltaTable.ColMapPhysKey),
      "an evolved column on a mapped table needs a stable id + physical name")
    val got = t.toDF.orderBy("id").select("note").collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got === Seq(null, "extra1", null, null))
    // a later rename of the evolved column stays metadata-only
    t.renameColumn("note", "note2")
    assert(t.toDF.filter(col("note2") === "extra1").count() === 1L)
  }

  test("idempotent txn replay skips; unclaimed no-op merge returns -1") {
    val t = target("mc-txn")
    val src = Seq((1L, 111L, "u")).toDF("id", "v", "tag")
    assert(t.mergeClauses(src, Seq("id"), Seq(WhenMatchedUpdate()),
      txnAppId = Some("app"), txnVersion = 7L) > 0L)
    assert(t.mergeClauses(src, Seq("id"), Seq(WhenMatchedUpdate()),
      txnAppId = Some("app"), txnVersion = 7L) === -1L)
    // merge claiming nothing: no commit
    val v0 = t.log.latestVersion()
    val noop = Seq((99L, 1L, "x")).toDF("id", "v", "tag")
    assert(t.mergeClauses(noop, Seq("id"), Seq(WhenMatchedUpdate())) === -1L)
    assert(t.log.latestVersion() === v0)
  }
}
