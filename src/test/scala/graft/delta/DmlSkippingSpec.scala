package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DML file-candidate selection through the `add.stats` index: a point
  * DELETE/UPDATE/MERGE must only OPEN files whose stats range admits a
  * match. The observable: physically removing an out-of-range data file
  * from disk — if pruning works the DML never touches it and succeeds;
  * without pruning the row-level candidate scan would throw
  * FileNotFoundException. Also pins [[DataSkipping.fromFilter]]'s
  * conservative extraction. */
class DmlSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** Three appends with disjoint id ranges → three stats'd files; the
    * middle range's file is deleted from DISK (log still lists it). */
  private def mkPruned(prefix: String, conf: Map[String, String] = Map.empty) = {
    val dir = tmpDir(prefix)
    val t = DeltaTable.forPath(spark, dir).create(
      Seq((0L, "x")).toDF("id", "v").schema, configuration = conf)
    t.append((0L until 50L).map(i => (i, s"a$i")).toDF("id", "v").repartition(1))
    t.append((100L until 150L).map(i => (i, s"b$i")).toDF("id", "v").repartition(1))
    t.append((200L until 250L).map(i => (i, s"c$i")).toDF("id", "v").repartition(1))
    assert(t.snapshot.files.size === 3)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // find the file covering [100, 150) via its stats and unlink it
    val mid = t.snapshot.files.find(_.stats.exists(_.contains("\"id\":100"))).get
    assert(fs.delete(new Path(dir, mid.path), false))
    (t, mid.path)
  }

  test("point DELETE opens only stats-matching files") {
    val (t, midPath) = mkPruned("dmlskip-del")
    assert(t.delete(col("id") === 5L) > 0L)
    assert(t.snapshot.files.map(_.path).contains(midPath),
      "the unopened file must stay live")
    // the delete landed: id 5 gone from the readable files
    val readable = t.snapshot.files.filterNot(_.path == midPath)
    val back = spark.read.parquet(readable.map(f => t.path + "/" + f.path): _*)
    assert(back.where(col("id") === 5L).isEmpty)
    assert(back.count() === 99L)
  }

  test("point UPDATE and range DELETE prune the same way") {
    val (t, _) = mkPruned("dmlskip-upd")
    assert(t.update(col("id") === 201L, Map("v" -> lit("upd"))) > 0L)
    assert(t.delete(col("id") >= 210L && col("id") < 220L) > 0L)
  }

  test("MERGE prunes candidates by source-key ranges") {
    val (t, midPath) = mkPruned("dmlskip-merge")
    // keys 5..55: [min,max] stays below the mid file's [100,150) range,
    // so it is never opened; 55 is absent everywhere and inserts
    val src = Seq((5L, "m5"), (7L, "m7"), (55L, "new")).toDF("id", "v")
    assert(t.merge(src, Seq("id")) > 0L)
    val back = spark.read.parquet(t.snapshot.files
      .filterNot(_.path == midPath)
      .map(f => t.path + "/" + f.path): _*)
    val got = back.where(col("id").isin(5L, 7L, 55L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(5L -> "m5", 7L -> "m7", 55L -> "new"))
  }

  test("clause MERGE prunes by source-key ranges; by-source clauses scan (correctly)") {
    import graft.delta.DeltaTable._
    val (t, midPath) = mkPruned("dmlskip-mergecl")
    // matched/insert-only clause set: same skipForKeys pre-restriction
    // as the upsert merge — the unlinked mid file never opens
    val src = Seq((5L, "D"), (7L, "m7"), (55L, "new")).toDF("id", "v")
    assert(t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedDelete(condition = Some("s.v = 'D'")),
      WhenMatchedUpdate(),
      WhenNotMatchedInsert())) > 0L)
    assert(t.snapshot.files.map(_.path).contains(midPath))
    val back = spark.read.parquet(t.snapshot.files
      .filterNot(_.path == midPath)
      .map(f => t.path + "/" + f.path): _*)
    assert(back.where(col("id") === 5L).isEmpty, "matched 'D' row deleted")
    assert(back.where(col("id").isin(7L, 55L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap === Map(7L -> "m7", 55L -> "new"))
    // a BY SOURCE clause's claims can live anywhere → the row-level scan
    // is REQUIRED and must now fail loudly on the missing file instead
    // of silently treating its rows as absent
    intercept[Exception](t.mergeClauses(src, Seq("id"), Seq(
      WhenMatchedUpdate(),
      WhenNotMatchedBySourceDelete(condition = Some("t.id >= 240")))))
  }

  test("DV DELETE/MERGE prune their position scans too") {
    val (t, midPath) = mkPruned("dmlskip-dv", Map(DeltaTable.DvConfigKey -> "true"))
    assert(t.deleteWithDv(col("id") === 3L) > 0L)
    assert(t.mergeWithDv(Seq((4L, "u4"), (55L, "n55")).toDF("id", "v"), Seq("id")) > 0L)
    assert(t.snapshot.files.map(_.path).contains(midPath))
  }

  test("inexpressible predicates keep every candidate (conservative fallback)") {
    val dir = tmpDir("dmlskip-fallback")
    val t = DeltaTable.forPath(spark, dir).create(
      Seq((0L, "x")).toDF("id", "v").schema)
    t.append((0L until 50L).map(i => (i, s"a$i")).toDF("id", "v"))
    t.append((100L until 150L).map(i => (i, s"b$i")).toDF("id", "v"))
    // an OR spans both files — both must be candidates, both rewritten
    assert(t.delete(col("id") === 5L || col("id") === 105L) > 0L)
    assert(t.toDF.where(col("id").isin(5L, 105L)).isEmpty)
    assert(t.toDF.count() === 98L)
  }

  test("fromFilter: conservative conjunct extraction") {
    import DataSkipping.{fromFilter, ColPred}
    val sch = Seq((0L, "x", 0.0)).toDF("id", "name", "score").schema
    def f(c: org.apache.spark.sql.Column) = fromFilter(spark, sch, c).toSet
    assert(f(col("id") === 7L) === Set(ColPred("id", "=", 7L)))
    // int literal coerces to the column's long type and still extracts
    assert(f(col("id") === 7) === Set(ColPred("id", "=", 7L)))
    assert(f(lit(3L) < col("id")) === Set(ColPred("id", ">", 3L)))
    assert(f(col("id") >= 2L && col("name") === "a") ===
      Set(ColPred("id", ">=", 2L), ColPred("name", "=", "a")))
    // OR, expressions over the column, and null literals extract nothing
    assert(f(col("id") === 1L || col("id") === 2L) === Set.empty)
    assert(f(col("id") + 1L === 2L) === Set.empty)
    assert(f(col("name") === lit(null)) === Set.empty)
    // IN-lists extract (round 16 — the partition fan-out shape); a null
    // element drops the conjunct, never a wrong prune
    assert(f(col("id").isin(1L, 2L)) === Set(ColPred("id", "in", Seq(1L, 2L))))
    assert(f(col("id").isin(1L, null)) === Set.empty)
    // a mixed AND keeps its expressible half
    assert(f(col("id") < 9L && (col("name") === "a" || col("name") === "b")) ===
      Set(ColPred("id", "<", 9L)))
  }
}
