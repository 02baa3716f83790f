package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Round-16 COPY INTO contracts: the parallel deep-tree source listing,
  * the JSON reader schema derived from the SOURCE (so missing-column
  * refusal / defaults / generated / identity checks match the parquet
  * path), and COPY_OPTIONS mergeSchema widening in the same commit. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  test("deep nested source trees list completely; hidden dirs and files skip") {
    val src = tmpDir("copy-deep-src")
    val df = (0L until 120L).map(i => (i, s"v$i")).toDF("id", "v")
    // 3 levels × 2 dirs × 2 dirs = 8 leaves, one file each
    var i = 0
    for (a <- 0 until 2; b <- 0 until 2; c <- 0 until 2) {
      df.filter(col("id") % 8 === i).coalesce(1)
        .write.parquet(s"$src/l$a/m$b/n$c")
      i += 1
    }
    // hidden trees and files must not load (Spark's file-index rule)
    df.limit(5).coalesce(1).write.parquet(s"$src/_tmp/leak")
    df.limit(5).coalesce(1).write.parquet(s"$src/.stage/leak")
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // parquet writers leave _SUCCESS markers — already hidden-file-skipped
    val dir = tmpDir("copy-deep-tbl")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    assert(t.copyInto(src) > 0L)
    assert(t.toDF.count() === 120L)
    assert(t.toDF.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    assert(t.copyInto(src) === -1L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$src/_tmp/leak")))
  }

  test("JSON reader schema derives from the source: defaults/generated fill, non-nullable refuses") {
    // a JSON source missing a DEFAULT column must compute the default —
    // the round-15 bug read json under the FULL table schema, so the
    // column was "present" (null) and the default never ran
    val src = tmpDir("copy-json-src")
    Seq((1L, "a"), (2L, "b")).toDF("k", "name")
      .coalesce(1).write.json(src + "/files")
    val sch = StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType),
      DeltaTable.defaultField("src", StringType, "'landed'")))
    val dir = tmpDir("copy-json-def")
    val t = DeltaTable.forPath(spark, dir).create(sch)
    assert(t.copyInto(src + "/files", format = "json") > 0L)
    val rows = t.toDF.orderBy("k").collect()
    assert(rows.map(_.getString(2)).toSeq === Seq("landed", "landed"))
    // generated columns compute for json exactly as for parquet
    val gsch = StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType),
      DeltaTable.generatedField("k2", LongType, "k * 2")))
    val gdir = tmpDir("copy-json-gen")
    val gt = DeltaTable.forPath(spark, gdir).create(gsch)
    assert(gt.copyInto(src + "/files", format = "json") > 0L)
    assert(gt.toDF.orderBy("k").collect().map(_.getLong(2)).toSeq === Seq(2L, 4L))
    // a missing NON-NULLABLE column refuses loudly instead of null-filling
    val nsch = StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType),
      StructField("must", StringType, nullable = false)))
    val ndir = tmpDir("copy-json-nn")
    val nt = DeltaTable.forPath(spark, ndir).create(nsch)
    val e = intercept[IllegalArgumentException](
      nt.copyInto(src + "/files", format = "json"))
    assert(e.getMessage.contains("must"))
    // extra JSON source columns refuse loudly (previously invisible:
    // the table-schema read silently dropped them)
    val xsrc = tmpDir("copy-json-extra")
    Seq((1L, "a", true)).toDF("k", "name", "oops")
      .coalesce(1).write.json(xsrc + "/files")
    val xdir = tmpDir("copy-json-x")
    val xt = DeltaTable.forPath(spark, xdir)
      .create(StructType(sch.take(2)))
    val e2 = intercept[IllegalArgumentException](
      xt.copyInto(xsrc + "/files", format = "json"))
    assert(e2.getMessage.contains("oops"))
  }

  test("AVRO + CSV sources: same reader-schema discipline as json — defaults fill, refusals fire") {
    val avroSchema =
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val asrc = tmpDir("copy-avro-src")
    graft.serialization.AvroContainerFiles.write(
      Seq((1L, "a"), (2L, "b")).toDF("k", "name").repartition(2), asrc, avroSchema)
    val csrc = tmpDir("copy-csv-src")
    Seq((1L, "a"), (2L, "b")).toDF("k", "name")
      .coalesce(1).write.option("header", "true").csv(csrc + "/files")

    for ((fmt, src) <- Seq("avro" -> asrc, "csv" -> (csrc + "/files"))) {
      // DEFAULT column absent from the source computes its default
      val sch = StructType(Seq(
        StructField("k", LongType),
        StructField("name", StringType),
        DeltaTable.defaultField("src", StringType, "'landed'")))
      val t = DeltaTable.forPath(spark, tmpDir(s"copy-$fmt-def")).create(sch)
      assert(t.copyInto(src, format = fmt) > 0L)
      assert(t.toDF.orderBy("k").collect().map(_.getString(2)).toSeq ===
        Seq("landed", "landed"))
      assert(t.toDF.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L),
        s"$fmt values must land typed under the table schema")
      assert(t.copyInto(src, format = fmt) === -1L,
        s"replayed $fmt COPY INTO must be a no-op")
      // generated column computes
      val gt = DeltaTable.forPath(spark, tmpDir(s"copy-$fmt-gen"))
        .create(StructType(Seq(
          StructField("k", LongType), StructField("name", StringType),
          DeltaTable.generatedField("k2", LongType, "k * 2"))))
      assert(gt.copyInto(src, format = fmt) > 0L)
      assert(gt.toDF.orderBy("k").collect().map(_.getLong(2)).toSeq === Seq(2L, 4L))
      // missing NON-NULLABLE column refuses loudly
      val nt = DeltaTable.forPath(spark, tmpDir(s"copy-$fmt-nn"))
        .create(StructType(Seq(
          StructField("k", LongType), StructField("name", StringType),
          StructField("must", StringType, nullable = false))))
      val e = intercept[IllegalArgumentException](nt.copyInto(src, format = fmt))
      assert(e.getMessage.contains("must"))
    }

    // extra source columns refuse loudly, per format
    val xasrc = tmpDir("copy-avro-xsrc")
    graft.serialization.AvroContainerFiles.write(
      Seq((1L, "a", true)).toDF("k", "name", "oops").coalesce(1), xasrc,
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},{"name":"name","type":"string"},
        |{"name":"oops","type":"boolean"}]}""".stripMargin)
    val xcsrc = tmpDir("copy-csv-xsrc")
    Seq((1L, "a", true)).toDF("k", "name", "oops")
      .coalesce(1).write.option("header", "true").csv(xcsrc + "/files")
    for ((fmt, src) <- Seq("avro" -> xasrc, "csv" -> (xcsrc + "/files"))) {
      val xt = DeltaTable.forPath(spark, tmpDir(s"copy-$fmt-x"))
        .create(StructType(Seq(
          StructField("k", LongType), StructField("name", StringType))))
      val e = intercept[IllegalArgumentException](xt.copyInto(src, format = fmt))
      assert(e.getMessage.contains("oops"), s"$fmt extra column must refuse")
    }

    // csv column order ≠ table order still aligns BY NAME (the reader
    // schema is built in FILE order — a positional misbind would land
    // names in k and break the cast)
    val osrc = tmpDir("copy-csv-osrc")
    Seq(("a", 1L), ("b", 2L)).toDF("name", "k")
      .coalesce(1).write.option("header", "true").csv(osrc + "/files")
    val ot = DeltaTable.forPath(spark, tmpDir("copy-csv-o"))
      .create(StructType(Seq(
        StructField("k", LongType), StructField("name", StringType))))
    assert(ot.copyInto(osrc + "/files", format = "csv") > 0L)
    assert(ot.toDF.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a"), (2L, "b")))

    // mixed header ORDERS across files refuse loudly: the csv reader
    // binds positionally under one schema, so letting the second layout
    // through would land its name strings in k (PERMISSIVE → nulls)
    // and COMMIT silently corrupted rows
    val msrc = tmpDir("copy-csv-mixed")
    Seq(("a", 1L)).toDF("name", "k")
      .coalesce(1).write.option("header", "true").csv(msrc + "/g1")
    Seq((2L, "b")).toDF("k", "name")
      .coalesce(1).write.option("header", "true").csv(msrc + "/g2")
    val mt = DeltaTable.forPath(spark, tmpDir("copy-csv-m"))
      .create(StructType(Seq(
        StructField("k", LongType), StructField("name", StringType))))
    val em = intercept[IllegalArgumentException](
      mt.copyInto(msrc, format = "csv"))
    assert(em.getMessage.contains("disagree on the header"))
    assert(mt.toDF.count() === 0L, "nothing may commit from a mixed load")

    // SQL surface accepts the new formats
    val st = DeltaTable.forPath(spark, tmpDir("copy-sql-avro"))
      .create(StructType(Seq(
        StructField("k", LongType), StructField("name", StringType))))
    spark.sql(s"COPY INTO '${st.path}' FROM '$asrc' FILEFORMAT = AVRO")
    assert(st.toDF.count() === 2L)
    spark.sql(s"COPY INTO '${st.path}' FROM '$csrc/files' FILEFORMAT = CSV")
    assert(st.toDF.count() === 4L)
    // unknown format still refuses
    val e3 = intercept[IllegalArgumentException](
      st.copyInto(asrc, format = "orc"))
    assert(e3.getMessage.contains("FILEFORMAT"))
  }

  test("COPY_OPTIONS mergeSchema widens the table in the load's own commit") {
    val src = tmpDir("copy-merge-src")
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    base.coalesce(1).write.parquet(src + "/gen1")
    val dir = tmpDir("copy-merge-tbl")
    val t = DeltaTable.forPath(spark, dir).create(base.schema,
      configuration = Map(DeltaTable.ColumnMappingModeKey -> "name"))
    assert(t.copyInto(src + "/gen1") > 0L)
    // generation 2 grows a column: without mergeSchema it refuses...
    Seq((3L, "c", 0.5)).toDF("id", "v", "score")
      .coalesce(1).write.parquet(src + "/gen2")
    intercept[IllegalArgumentException](t.copyInto(src))
    // ...with it the schema widens and the load rides ONE commit
    val vBefore = t.snapshot.version
    val v = t.copyInto(src, copyOptions = Map("mergeSchema" -> "true"))
    assert(v === vBefore + 1, "metaData update and adds share one commit")
    val sch = t.schema
    assert(sch.fieldNames.toSeq === Seq("id", "v", "score"))
    assert(sch("score").nullable)
    // column-mapping: the new field minted an id and the maxId bumped
    assert(sch("score").metadata.contains(DeltaTable.ColMapIdKey))
    assert(t.snapshot.metadata.get
      .configuration(DeltaTable.ColumnMappingMaxIdKey) === "3")
    val rows = t.toDF.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows.take(2).forall(_.isNullAt(2)), "old files read back null-filled")
    assert(rows(2).getDouble(2) === 0.5)
    // replay stays a no-op after evolution
    assert(t.copyInto(src, copyOptions = Map("mergeSchema" -> "true")) === -1L)
    // unknown COPY_OPTIONS refuse
    intercept[IllegalArgumentException](
      t.copyInto(src, copyOptions = Map("force" -> "true")))
    // SQL surface
    val src2 = tmpDir("copy-merge-sql-src")
    Seq((9L, "z", 0.1, true)).toDF("id", "v", "score", "flag")
      .coalesce(1).write.parquet(src2 + "/files")
    spark.sql(s"COPY INTO '$dir' FROM '$src2/files' FILEFORMAT = PARQUET " +
      "COPY_OPTIONS ('mergeSchema'='true')")
    assert(DeltaTable.forPath(spark, dir).schema.fieldNames.contains("flag"))
    assert(DeltaTable.forPath(spark, dir).toDF.count() === 4L)
  }
}
