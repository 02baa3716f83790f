package graft.sql

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.delta.{DataSkipping, DeltaTable}

/** The SQL statement surface (OPTIMIZE / VACUUM / DESCRIBE DETAIL /
  * DESCRIBE HISTORY / ALTER TABLE TBLPROPERTIES over path tables):
  * each statement must behave exactly like the Scala API it wraps, and
  * everything else must still parse through the default parser. */
class SqlStatementsSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(prefix: String, files: Int = 4): DeltaTable = {
    val dir = tmpDir(prefix)
    val t = DeltaTable.forPath(spark, dir).create(
      Seq((0L, 0L)).toDF("a", "b").schema)
    (0 until files).foreach(i =>
      t.append((i * 100L until (i + 1) * 100L).map(v => (v, v % 7)).toDF("a", "b")
        .coalesce(1)))
    t
  }

  test("default parser is untouched: ordinary SQL still runs") {
    assert(spark.sql("SELECT 1 + 1 AS x").head().getInt(0) === 2)
    // a catalog-table OPTIMIZE stays the default parser's business
    intercept[Exception](spark.sql("OPTIMIZE some_catalog_table"))
  }

  test("OPTIMIZE compacts; OPTIMIZE ZORDER BY clusters N columns") {
    val t = mkTable("sqlstmt-opt")
    val n0 = t.snapshot.files.size
    val out = spark.sql(s"OPTIMIZE '${t.path}'").collect()
    assert(out.head.getString(1) === "COMPACT" && out.head.getLong(2) > 0L)
    assert(DeltaTable.forPath(spark, t.path).snapshot.files.size < n0)

    val t2 = mkTable("sqlstmt-zorder")
    val out2 = spark.sql(s"OPTIMIZE '${t2.path}' ZORDER BY (a, b)").collect()
    assert(out2.head.getString(1).startsWith("ZORDER") && out2.head.getLong(2) > 0L)
    // and the three-column form runs the N-ary curve
    val t3 = mkTable("sqlstmt-zorder3")
    val t3b = DeltaTable.forPath(spark, t3.path)
    spark.sql(s"ALTER TABLE '${t3.path}' SET TBLPROPERTIES ('user.k' = 'v')")
    val out3 = spark.sql(s"OPTIMIZE '${t3.path}' ZORDER BY (a, b, a)").collect()
    assert(out3.head.getLong(2) > 0L)
  }

  test("OPTIMIZE on a clustered table runs incremental clustering, not compaction") {
    val dir = tmpDir("sqlstmt-clus")
    val df = (0L until 200L).map(v => (v, v % 7)).toDF("a", "b")
    val t = DeltaTable.forPath(spark, dir).create(df.schema, clusterBy = Seq("a", "b"))
    spark.sql(s"ALTER TABLE '$dir' SET TBLPROPERTIES " +
      s"('${DeltaTable.MinCubeSizeKey}' = '1')") // any cube is final
    (0 until 2).foreach(_ => t.append(df.coalesce(1)))
    val out = spark.sql(s"OPTIMIZE '$dir'").collect()
    assert(out.head.getString(1).startsWith("CLUSTER BY"), out.head.getString(1))
    assert(out.head.getLong(2) > 0L)
    // incremental: with the cube final and nothing appended, a re-run
    // must be the quiet no-op, not a fresh table rewrite
    assert(spark.sql(s"OPTIMIZE '$dir'").collect().head.getLong(2) === -1L)
    assert(DeltaTable.forPath(spark, dir).toDF.count() === 400L)
    // two more appends cluster into a SECOND final cube; incremental
    // leaves the first untouched
    (0 until 2).foreach(_ => t.append(df.coalesce(1)))
    assert(spark.sql(s"OPTIMIZE '$dir'").collect().head.getLong(2) > 0L)
    assert(spark.sql(s"OPTIMIZE '$dir'").collect().head.getLong(2) === -1L)
    // FULL forces the complete re-cluster — final cubes included (the
    // lever when incremental maintenance would correctly skip all):
    // both cubes merge into one fresh layout
    val full = spark.sql(s"OPTIMIZE '$dir' FULL").collect()
    assert(full.head.getString(1).endsWith("FULL"), full.head.getString(1))
    assert(full.head.getLong(2) > 0L)
    assert(DeltaTable.forPath(spark, dir).toDF.count() === 800L)
    // and the rewrite re-finalizes: incremental is a no-op again
    assert(spark.sql(s"OPTIMIZE '$dir'").collect().head.getLong(2) === -1L)
    // FULL without clustering is a loud contract error
    val plain = mkTable("sqlstmt-full-plain", files = 2)
    intercept[Exception](spark.sql(s"OPTIMIZE '${plain.path}' FULL"))
  }

  test("VACUUM DRY RUN lists candidates and deletes nothing; VACUUM deletes") {
    val t = mkTable("sqlstmt-vac", files = 2)
    assert(t.compact(minBytes = Long.MaxValue) > 0L) // orphan the 2 small files
    val dry = spark.sql(s"VACUUM '${t.path}' RETAIN 0 HOURS DRY RUN").collect()
    assert(dry.length === 2, s"two superseded files must list, got ${dry.toSeq}")
    assert(DeltaTable.forPath(spark, t.path).toDF.count() === 200L)
    val real = spark.sql(s"VACUUM '${t.path}' RETAIN 0 HOURS").collect()
    assert(real.head.getLong(1) === 2L)
    assert(spark.sql(s"VACUUM '${t.path}' RETAIN 0 HOURS DRY RUN").collect().isEmpty)
    assert(DeltaTable.forPath(spark, t.path).toDF.count() === 200L)
  }

  test("COMMENT ON TABLE round-trips the description through commits and checkpoints") {
    val t = mkTable("sqlstmt-comment", files = 1)
    spark.sql(s"COMMENT ON TABLE '${t.path}' IS 'curated demo table'")
    val t2 = DeltaTable.forPath(spark, t.path)
    assert(t2.snapshot.metadata.get.description.contains("curated demo table"))
    assert(spark.sql(s"DESCRIBE DETAIL '${t.path}'").head
      .getAs[String]("description") === "curated demo table")
    // survives unrelated metadata rewrites
    t2.setProperties(Map("user.note" -> "x"))
    assert(t2.snapshot.metadata.get.description.contains("curated demo table"))
    // survives a checkpoint seed (fresh reader reconstructs from parquet)
    t2.log.checkpointAt(t2.snapshot.version)
    t2.log.cleanupMetadata(t2.snapshot.version)
    assert(DeltaTable.forPath(spark, t.path).snapshot.metadata.get
      .description.contains("curated demo table"))
    // IS NULL clears it
    spark.sql(s"COMMENT ON TABLE '${t.path}' IS NULL")
    assert(DeltaTable.forPath(spark, t.path).snapshot.metadata.get.description.isEmpty)
  }

  test("DESCRIBE DETAIL and DESCRIBE HISTORY mirror the Scala APIs") {
    val t = mkTable("sqlstmt-desc", files = 2)
    val det = spark.sql(s"DESCRIBE DETAIL '${t.path}'").collect()
    assert(det.length === 1)
    val r = det.head
    assert(r.getString(0) === "delta")
    assert(r.getLong(r.fieldIndex("numFiles")) === 2L)
    assert(r.getLong(r.fieldIndex("version")) === 2L)
    val hist = spark.sql(s"DESC HISTORY '${t.path}' LIMIT 2").collect()
    assert(hist.length === 2)
    assert(hist.map(_.getString(2)).forall(_ == "WRITE"))
    assert(hist.head.getLong(0) === 2L, "history is newest-first")
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES goes through the feature-aware path") {
    val t = mkTable("sqlstmt-props", files = 1)
    val v = spark.sql(s"ALTER TABLE '${t.path}' SET TBLPROPERTIES " +
      "('delta.enableChangeDataFeed' = 'true', 'user.owner' = 'me')").collect()
    assert(v.head.getLong(0) > 0L)
    val after = DeltaTable.forPath(spark, t.path)
    assert(after.cdfEnabled)
    assert(after.snapshot.metadata.get.configuration("user.owner") === "me")
    // the refusal rules apply identically from SQL
    intercept[Exception](spark.sql(
      s"ALTER TABLE '${t.path}' SET TBLPROPERTIES ('delta.enableTypo' = 'true')"))
    val v2 = spark.sql(
      s"ALTER TABLE '${t.path}' UNSET TBLPROPERTIES ('user.owner')").collect()
    assert(v2.head.getLong(0) > 0L)
    assert(!DeltaTable.forPath(spark, t.path).snapshot
      .metadata.get.configuration.contains("user.owner"))
  }

  test("OPTIMIZE WHERE scopes to matching partitions") {
    val dir = tmpDir("sqlstmt-optwhere")
    val df = (0L until 200L).map(i => (i, i % 2)).toDF("v", "p")
    val t = DeltaTable.forPath(spark, dir).create(df.schema, Seq("p"))
    (0 until 3).foreach(_ => t.append(df.coalesce(1)))
    val filesPerPart = t.snapshot.files.groupBy(_.partitionValues("p"))
    assert(filesPerPart.values.forall(_.size === 3))
    spark.sql(s"OPTIMIZE '$dir' WHERE p = 0")
    val after = DeltaTable.forPath(spark, dir).snapshot.files
      .groupBy(_.partitionValues("p"))
    assert(after("0").size === 1, "partition 0 must compact")
    assert(after("1").size === 3, "partition 1 must be untouched")
  }

  test("delta.`path` naming works too") {
    val t = mkTable("sqlstmt-tick", files = 2)
    val det = spark.sql(s"DESCRIBE DETAIL delta.`${t.path}`").collect()
    assert(det.head.getLong(det.head.fieldIndex("numFiles")) === 2L)
  }

  test("ALTER TABLE column DDL: ADD/RENAME/DROP/ALTER COLUMN from SQL") {
    val dir = tmpDir("sqlstmt-coldd")
    val t = DeltaTable.forPath(spark, dir).create(
      Seq((0L, 0)).toDF("a", "b").schema,
      configuration = Map(
        DeltaTable.ColumnMappingModeKey -> "name",
        "delta.enableTypeWidening" -> "true"))
    t.append(Seq((1L, 10), (2L, 20)).toDF("a", "b"))
    val files0 = t.snapshot.files.map(_.path).toSet
    assert(spark.sql(
      s"ALTER TABLE delta.`$dir` ADD COLUMNS (c STRING COMMENT 'note', d BIGINT)")
      .head().getLong(0) > 0L)
    assert(spark.sql(s"ALTER TABLE delta.`$dir` RENAME COLUMN c TO c2")
      .head().getLong(0) > 0L)
    assert(spark.sql(s"ALTER TABLE delta.`$dir` DROP COLUMN d").head().getLong(0) > 0L)
    // IF EXISTS on an absent column: quiet no-op (-1)
    assert(spark.sql(s"ALTER TABLE delta.`$dir` DROP COLUMN IF EXISTS nope")
      .head().getLong(0) === -1L)
    assert(spark.sql(s"ALTER TABLE delta.`$dir` ALTER COLUMN b TYPE BIGINT")
      .head().getLong(0) > 0L)
    val after = DeltaTable.forPath(spark, dir)
    assert(after.schema.fieldNames.toSeq === Seq("a", "b", "c2"))
    assert(after.schema("b").dataType === LongType)
    assert(after.schema("c2").getComment().contains("note"),
      "the COMMENT must survive ADD + RENAME")
    assert(after.snapshot.files.map(_.path).toSet === files0,
      "every column DDL statement must be metadata-only")
    assert(spark.sql(s"SELECT a, b, c2 FROM delta.`$dir` ORDER BY a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSeq
      === Seq((1L, 10L, true), (2L, 20L, true)))
  }

  test("ADD/DROP CONSTRAINT and SHOW TBLPROPERTIES from SQL") {
    val dir = tmpDir("sqlstmt-constr")
    val t = DeltaTable.forPath(spark, dir).create(Seq((0L, 0L)).toDF("a", "b").schema)
    t.append((0L until 10L).map(i => (i, i)).toDF("a", "b"))
    assert(spark.sql(
      s"ALTER TABLE delta.`$dir` ADD CONSTRAINT nonneg CHECK (a >= 0)")
      .head().getLong(0) > 0L)
    // violating data refuses at write time — the constraint is live
    intercept[Exception](
      DeltaTable.forPath(spark, dir).append(Seq((-1L, 0L)).toDF("a", "b")))
    // adding a constraint existing rows violate refuses
    intercept[Exception](spark.sql(
      s"ALTER TABLE delta.`$dir` ADD CONSTRAINT impossible CHECK (a > 100)"))
    val props = spark.sql(s"SHOW TBLPROPERTIES delta.`$dir`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("delta.constraints.nonneg") === "a >= 0")
    assert(spark.sql(s"SHOW TBLPROPERTIES delta.`$dir` ('delta.constraints.nonneg')")
      .head().getString(1) === "a >= 0")
    assert(spark.sql(s"ALTER TABLE delta.`$dir` DROP CONSTRAINT nonneg")
      .head().getLong(0) > 0L)
    // IF EXISTS quiet; bare drop of an absent constraint refuses
    assert(spark.sql(s"ALTER TABLE delta.`$dir` DROP CONSTRAINT IF EXISTS nonneg")
      .head().getLong(0) === -1L)
    intercept[Exception](spark.sql(s"ALTER TABLE delta.`$dir` DROP CONSTRAINT nonneg"))
    DeltaTable.forPath(spark, dir).append(Seq((-1L, 0L)).toDF("a", "b"))
    // catalog tables stay the default parser/analyzer's business
    intercept[Exception](spark.sql("ALTER TABLE not_a_path_table ADD COLUMNS (x INT)"))
  }

  test("REORG TABLE APPLY (PURGE) rewrites DV files; no-DV table is a quiet no-op") {
    val dir = tmpDir("sqlstmt-reorg")
    val t = DeltaTable.forPath(spark, dir).create(
      Seq((0L, 0L)).toDF("a", "b").schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t.append((0L until 500L).map(v => (v, v % 7)).toDF("a", "b"))
    t.deleteWithDv(col("a") % 5 === 0)
    assert(t.snapshot.files.exists(_.deletionVector.isDefined))
    val r = spark.sql(s"REORG TABLE delta.`$dir` APPLY (PURGE)").head()
    assert(r.getLong(1) > 0L)
    val after = DeltaTable.forPath(spark, dir)
    assert(after.snapshot.files.forall(_.deletionVector.isEmpty),
      "PURGE must materialize every deletion vector away")
    assert(after.toDF.count() === 400L)
    // purging a DV-free table: -1, no commit
    val v0 = after.log.latestVersion()
    assert(spark.sql(s"REORG TABLE delta.`$dir` APPLY (PURGE)").head().getLong(1) === -1L)
    assert(after.log.latestVersion() === v0)
  }

  test("FSCK REPAIR TABLE removes dangling file references; DRY RUN lists only") {
    val dir = tmpDir("sqlstmt-fsck")
    val t = DeltaTable.forPath(spark, dir).create(Seq((0L, 0L)).toDF("a", "b").schema)
    (0 until 3).foreach(i =>
      t.append(((i * 10L) until (i * 10L + 10L)).map(v => (v, v)).toDF("a", "b")
        .coalesce(1)))
    // healthy table: nothing dangling
    assert(spark.sql(s"FSCK REPAIR TABLE delta.`$dir`").collect().isEmpty)
    // out-of-band deletion (a lifecycle rule, a manual rm): reads break
    val victim = t.snapshot.files.head.path
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir, victim), false))
    intercept[Exception](t.toDF.count())
    val v0 = t.log.latestVersion()
    val listed = spark.sql(s"FSCK REPAIR TABLE delta.`$dir` DRY RUN").collect()
    assert(listed.map(_.getString(0)).toSeq === Seq(victim))
    assert(t.log.latestVersion() === v0, "DRY RUN must not commit")
    val repaired = spark.sql(s"FSCK REPAIR TABLE delta.`$dir`").collect()
    assert(repaired.map(_.getString(0)).toSeq === Seq(victim))
    val after = DeltaTable.forPath(spark, dir)
    assert(after.log.latestVersion() === v0 + 1)
    assert(after.toDF.count() === 20L, "reads work again; surviving files intact")
    assert(after.log.history(Some(1)).head._2.exists(_.operation == "FSCK"))
  }

  test("CONVERT TO DELTA imports a partitioned parquet directory in place") {
    val dir = tmpDir("sqlstmt-convert")
    (0L until 40L).map(i => (i, s"d${i % 2}")).toDF("v", "date")
      .write.mode("overwrite").partitionBy("date").parquet(dir)
    val r = spark.sql(
      s"CONVERT TO DELTA parquet.`$dir` PARTITIONED BY (date string)").head()
    assert(r.getLong(1) > 0L, "must report converted file count")
    val t = DeltaTable.forPath(spark, dir)
    assert(t.exists && t.partitionColumns === Seq("date"))
    assert(t.toDF.count() === 40L)
    // the converted table is a first-class SQL citizen immediately
    assert(spark.sql(s"SELECT count(*) AS n FROM delta.`$dir` WHERE date = 'd1'")
      .head().getLong(0) === 20L)
    assert(spark.sql(s"DELETE FROM delta.`$dir` WHERE v < 4").head().getLong(0) > 0L)
    assert(t.toDF.count() === 36L)
    // converting twice refuses (already a Delta table)
    intercept[Exception](spark.sql(s"CONVERT TO DELTA parquet.`$dir`"))
  }
}
