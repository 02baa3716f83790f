package graft.sql

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.delta.DeltaTable

/** `delta.`<path>`` relation resolution ([[GraftPathRules]]): SELECT with
  * time travel, DELETE/UPDATE/MERGE INTO/INSERT, and the RESTORE
  * statement — each must behave exactly like the Scala API it resolves
  * to, and non-path identifiers must fall through untouched. */
class SqlRelationSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(prefix: String): DeltaTable = {
    val dir = tmpDir(prefix)
    val t = DeltaTable.forPath(spark, dir).create(
      Seq((0L, "x")).toDF("k", "v").schema)
    t.append((0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    t
  }

  test("SELECT over delta.`path`, with joins and aggregation") {
    val t = mkTable("sqlrel-sel")
    assert(spark.sql(s"SELECT count(*) AS n FROM delta.`${t.path}`")
      .head().getLong(0) === 10L)
    assert(spark.sql(
      s"SELECT v FROM delta.`${t.path}` WHERE k = 7").head().getString(0) === "v7")
    // self-join through two references of the same path
    val j = spark.sql(
      s"""SELECT a.k FROM delta.`${t.path}` a JOIN delta.`${t.path}` b
         |ON a.k = b.k WHERE a.k < 3 ORDER BY a.k""".stripMargin)
    assert(j.as[Long].collect().toSeq === Seq(0L, 1L, 2L))
  }

  test("time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val t = mkTable("sqlrel-tt")
    t.append(Seq((100L, "late")).toDF("k", "v"))
    assert(spark.sql(s"SELECT count(*) AS n FROM delta.`${t.path}` VERSION AS OF 1")
      .head().getLong(0) === 10L)
    assert(spark.sql(s"SELECT count(*) AS n FROM delta.`${t.path}`")
      .head().getLong(0) === 11L)
    val ts = java.time.Instant.now().plusSeconds(60).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM delta.`${t.path}` TIMESTAMP AS OF '$ts'")
      .head().getLong(0) === 11L)
  }

  test("DELETE FROM / UPDATE go through the Scala DML (stats pruning included)") {
    val t = mkTable("sqlrel-dml")
    val v = spark.sql(s"DELETE FROM delta.`${t.path}` WHERE k >= 8").head().getLong(0)
    assert(v > 0L)
    assert(DeltaTable.forPath(spark, t.path).toDF.count() === 8L)
    // no-match delete commits nothing (the Scala -1 contract)
    assert(spark.sql(s"DELETE FROM delta.`${t.path}` WHERE k = 999")
      .head().getLong(0) === -1L)
    val v2 = spark.sql(
      s"UPDATE delta.`${t.path}` SET v = concat(v, '!') WHERE k < 2").head().getLong(0)
    assert(v2 > 0L)
    val got = DeltaTable.forPath(spark, t.path).toDF
      .orderBy("k").select("v").as[String].collect().take(3).toSeq
    assert(got === Seq("v0!", "v1!", "v2"))
    // UPDATE without WHERE hits every row
    assert(spark.sql(s"UPDATE delta.`${t.path}` SET v = 'all'").head().getLong(0) > 0L)
    assert(DeltaTable.forPath(spark, t.path).toDF
      .select("v").distinct().as[String].collect().toSeq === Seq("all"))
  }

  test("MERGE INTO upserts (the star shape keeps its dedicated path)") {
    val t = mkTable("sqlrel-merge")
    Seq((5L, "upd5"), (100L, "new100")).toDF("k", "v")
      .createOrReplaceTempView("merge_src")
    val v = spark.sql(
      s"""MERGE INTO delta.`${t.path}` t USING merge_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getLong(0)
    assert(v > 0L)
    val rows = DeltaTable.forPath(spark, t.path).toDF
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size === 11 && rows(5L) === "upd5" && rows(100L) === "new100")
  }

  test("MERGE INTO with the full clause surface: conditional update/delete, " +
    "conditional insert, NOT MATCHED BY SOURCE") {
    val t = mkTable("sqlrel-mergecl")
    // CDC-shaped source: 'D' rows delete, others upsert; stale rows
    // (absent from the source, k >= 8) delete by source absence
    Seq((2L, "D"), (5L, "five'"), (100L, "new"), (101L, "D"))
      .toDF("k", "v").createOrReplaceTempView("mergecl_src")
    val v = spark.sql(
      s"""MERGE INTO delta.`${t.path}` tg USING mergecl_src sr ON tg.k = sr.k
         |WHEN MATCHED AND sr.v = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = concat(sr.v, '+')
         |WHEN NOT MATCHED AND sr.v != 'D' THEN INSERT (k, v) VALUES (sr.k, sr.v)
         |WHEN NOT MATCHED BY SOURCE AND tg.k >= 8 THEN DELETE""".stripMargin)
      .head().getLong(0)
    assert(v > 0L)
    val rows = DeltaTable.forPath(spark, t.path).toDF
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!rows.contains(2L), "matched 'D' row deleted")
    assert(!rows.contains(8L) && !rows.contains(9L), "stale rows deleted by source absence")
    assert(!rows.contains(101L), "unclaimed not-matched 'D' row NOT inserted")
    assert(rows(5L) === "five'+", "conditional update applied (quote survives re-render)")
    assert(rows(100L) === "new", "conditional insert applied")
    assert(rows(3L) === "v3", "unclaimed matched rows carry unchanged")
    assert(rows.size === 8) // 10 - (1 matched D) - (2 stale) + (1 insert)
  }

  test("SQL DML on a DV-enabled table runs merge-on-read: zero file rewrites") {
    val dir = tmpDir("sqlrel-dv")
    val t = DeltaTable.forPath(spark, dir).create(
      Seq((0L, "x")).toDF("k", "v").schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t.append((0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    val before = t.snapshot.files.map(_.path).toSet
    assert(spark.sql(s"DELETE FROM delta.`$dir` WHERE k >= 18").head().getLong(0) > 0L)
    assert(spark.sql(s"UPDATE delta.`$dir` SET v = 'u' WHERE k < 2").head().getLong(0) > 0L)
    Seq((5L, "m5"), (100L, "m100")).toDF("k", "v").createOrReplaceTempView("dv_src")
    assert(spark.sql(
      s"""MERGE INTO delta.`$dir` t USING dv_src s ON t.k = s.k
         |WHEN MATCHED AND s.v != 'zzz' THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getLong(0) > 0L)
    val after = DeltaTable.forPath(spark, dir)
    assert(before.subsetOf(after.snapshot.files.map(_.path).toSet),
      "DV-enabled SQL DML must not rewrite any original data file")
    assert(after.snapshot.files.exists(_.deletionVector.isDefined))
    val got = after.toDF.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 19 && !got.contains(18L) && !got.contains(19L))
    assert(got(0L) === "u" && got(1L) === "u")
    assert(got(5L) === "m5" && got(100L) === "m100")
  }

  test("INSERT INTO appends; INSERT OVERWRITE replaces") {
    val t = mkTable("sqlrel-ins")
    assert(spark.sql(
      s"INSERT INTO delta.`${t.path}` VALUES (50, 'fifty'), (51, 'fiftyone')")
      .head().getLong(0) > 0L)
    assert(DeltaTable.forPath(spark, t.path).toDF.count() === 12L)
    assert(spark.sql(
      s"INSERT OVERWRITE delta.`${t.path}` SELECT k + 1000, v FROM delta.`${t.path}` WHERE k < 2")
      .head().getLong(0) > 0L)
    val after = DeltaTable.forPath(spark, t.path).toDF
    assert(after.count() === 2L)
    assert(after.select("k").as[Long].collect().toSet === Set(1000L, 1001L))
  }

  test("RESTORE statement rewinds the table") {
    val t = mkTable("sqlrel-restore")
    spark.sql(s"DELETE FROM delta.`${t.path}` WHERE k >= 5")
    assert(DeltaTable.forPath(spark, t.path).toDF.count() === 5L)
    assert(spark.sql(s"RESTORE TABLE delta.`${t.path}` TO VERSION AS OF 1")
      .head().getLong(0) > 0L)
    assert(DeltaTable.forPath(spark, t.path).toDF.count() === 10L)
  }

  test("table_changes TVF reads the change feed as a relation") {
    val dir = tmpDir("sqlrel-tvf")
    spark.sql(
      s"""CREATE TABLE delta.`$dir` (k BIGINT, v STRING) USING delta
         |TBLPROPERTIES ('${DeltaTable.CdfConfigKey}' = 'true')""".stripMargin)
    spark.sql(s"INSERT INTO delta.`$dir` VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(s"DELETE FROM delta.`$dir` WHERE k = 2")
    spark.sql(s"UPDATE delta.`$dir` SET v = 'z' WHERE k = 3")
    val t = DeltaTable.forPath(spark, dir)
    val latest = t.snapshot.version
    // the TVF relation equals the Scala API's frame, row for row
    val api = t.changes(1, latest)
      .select("k", "v", "_change_type", "_commit_version")
      .collect().map(_.toSeq).toSet
    val tvf = spark.sql(
      s"""SELECT k, v, _change_type, _commit_version
         |FROM table_changes('$dir', 1)""".stripMargin)
      .collect().map(_.toSeq).toSet
    assert(tvf === api && tvf.nonEmpty)
    // it composes: aggregate over change types, bounded range
    val counts = spark.sql(
      s"""SELECT _change_type, count(*) AS n
         |FROM table_changes('$dir', 1, 2) GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("insert" -> 3L, "delete" -> 1L))
    // unknown TVFs stay Spark's business
    assert(spark.sql("SELECT count(*) FROM range(5)").head().getLong(0) === 5L)
    // non-literal / non-path first args fall through to Spark's error
    intercept[Exception](spark.sql("SELECT * FROM table_changes(1, 2)").collect())
  }

  test("non-path identifiers fall through to the catalog untouched") {
    // a temp view named like a 2-part identifier is not hijacked
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("plainview")
    assert(spark.sql("SELECT count(*) AS n FROM plainview").head().getLong(0) === 1L)
    // delta.<not-a-path> stays an unresolved catalog reference
    intercept[Exception](spark.sql("SELECT * FROM delta.sometable").collect())
  }

  test("CREATE TABLE: columns, PARTITIONED BY, TBLPROPERTIES, IF NOT EXISTS") {
    val dir = tmpDir("sqlrel-create")
    val r = spark.sql(
      s"""CREATE TABLE delta.`$dir` (k BIGINT, v STRING, part STRING)
         |USING delta PARTITIONED BY (part)
         |TBLPROPERTIES ('${DeltaTable.CdfConfigKey}' = 'true')""".stripMargin).head()
    assert(r.getBoolean(1), "created must be true")
    val t = DeltaTable.forPath(spark, dir)
    assert(t.exists)
    assert(t.schema.fieldNames.toSeq === Seq("k", "v", "part"))
    assert(t.partitionColumns === Seq("part"))
    assert(t.snapshot.metadata.get.configuration(DeltaTable.CdfConfigKey) === "true")
    // the created table is immediately usable through the SQL surface
    spark.sql(s"INSERT INTO delta.`$dir` VALUES (1, 'a', 'p0'), (2, 'b', 'p1')")
    assert(spark.sql(s"SELECT count(*) AS n FROM delta.`$dir`").head().getLong(0) === 2L)
    // plain CREATE on an existing table errors; IF NOT EXISTS no-ops
    intercept[Exception](spark.sql(s"CREATE TABLE delta.`$dir` (x INT) USING delta"))
    val again = spark.sql(
      s"CREATE TABLE IF NOT EXISTS delta.`$dir` (x INT) USING delta").head()
    assert(!again.getBoolean(1))
    assert(t.schema.fieldNames.length === 3, "IF NOT EXISTS must not touch the schema")
  }

  test("CREATE TABLE: generated, default, and identity columns from SQL DDL") {
    val dir = tmpDir("sqlrel-createddl")
    spark.sql(
      s"""CREATE TABLE delta.`$dir` (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY,
         |  amount DOUBLE,
         |  bucket BIGINT GENERATED ALWAYS AS (CAST(floor(amount) AS BIGINT)),
         |  tag STRING DEFAULT 'none'
         |) USING delta""".stripMargin)
    val t = DeltaTable.forPath(spark, dir)
    val fm = t.schema.fields.map(f => f.name -> f.metadata).toMap
    assert(fm("id").contains(DeltaTable.IdentityStartKey))
    assert(fm("bucket").getString(DeltaTable.GenerationExprKey)
      .toLowerCase.contains("floor"))
    assert(fm("tag").getString(DeltaTable.CurrentDefaultKey) === "'none'")
    // write through the Scala API: identity assigns, generation computes,
    // default fills — identical semantics to a Scala-declared schema
    t.append(Seq(3.7, 5.2).toDF("amount"))
    val rows = t.toDF.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.map(_.getLong(2)).toSeq === Seq(3L, 5L))
    assert(rows.map(_.getString(3)).toSeq === Seq("none", "none"))
  }

  test("CREATE OR REPLACE TABLE swaps the table; bare REPLACE needs an existing one") {
    val dir = tmpDir("sqlrel-replace")
    spark.sql(s"CREATE TABLE delta.`$dir` (k BIGINT, v STRING) USING delta")
    spark.sql(s"INSERT INTO delta.`$dir` VALUES (1, 'a'), (2, 'b')")
    val vOld = DeltaTable.forPath(spark, dir).snapshot.version
    spark.sql(
      s"""CREATE OR REPLACE TABLE delta.`$dir` (name STRING, n BIGINT)
         |USING delta PARTITIONED BY (name)""".stripMargin)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.schema.fieldNames.toSeq === Seq("name", "n"))
    assert(t.partitionColumns === Seq("name"))
    assert(t.toDF.count() === 0L)
    // history is intact: the pre-replace epoch still time-travels
    assert(spark.sql(
      s"SELECT count(*) AS n FROM delta.`$dir` VERSION AS OF $vOld").head().getLong(0) === 2L)
    // OR REPLACE on a MISSING table creates; bare REPLACE refuses
    val dir2 = tmpDir("sqlrel-replace-new")
    spark.sql(s"CREATE OR REPLACE TABLE delta.`$dir2` (x BIGINT) USING delta")
    assert(DeltaTable.forPath(spark, dir2).exists)
    val dir3 = tmpDir("sqlrel-replace-miss")
    intercept[Exception](
      spark.sql(s"REPLACE TABLE delta.`$dir3` (x BIGINT) USING delta"))
    assert(!DeltaTable.forPath(spark, dir3).exists)
    // REPLACE ... AS SELECT: atomic swap + load — ONE commit (CRAS
    // contract), so no reader can ever pin an empty in-between version
    val vBefore = DeltaTable.forPath(spark, dir).snapshot.version
    spark.sql(
      s"""CREATE OR REPLACE TABLE delta.`$dir` USING delta
         |AS SELECT 'z' AS name, 9 AS n""".stripMargin)
    assert(spark.sql(s"SELECT name FROM delta.`$dir`").as[String].collect().toSeq === Seq("z"))
    assert(DeltaTable.forPath(spark, dir).snapshot.version === vBefore + 1,
      "REPLACE ... AS SELECT must land as a single commit")
  }

  test("CREATE TABLE AS SELECT materializes the query; USING parquet falls through") {
    val dir = tmpDir("sqlrel-ctas")
    val src = mkTable("sqlrel-ctassrc")
    val r = spark.sql(
      s"""CREATE TABLE delta.`$dir` USING delta
         |AS SELECT k, upper(v) AS v FROM delta.`${src.path}` WHERE k < 4""".stripMargin)
      .head()
    assert(r.getBoolean(1) && r.getLong(2) >= 1L)
    val got = spark.sql(s"SELECT v FROM delta.`$dir` ORDER BY k").as[String].collect()
    assert(got.toSeq === Seq("V0", "V1", "V2", "V3"))
    // a non-delta provider is NOT ours: falls through to Spark's catalog
    // resolution (which has no 'delta' catalog) and must not create a log
    val alien = tmpDir("sqlrel-alien")
    intercept[Exception](
      spark.sql(s"CREATE TABLE delta.`$alien` (x INT) USING parquet"))
    assert(!DeltaTable.forPath(spark, alien).exists)
  }
}
