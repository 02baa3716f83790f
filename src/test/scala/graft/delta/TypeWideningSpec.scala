package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Type widening (Delta reader+writer feature `typeWidening`): metadata-only
  * ALTER COLUMN TYPE; old files' narrow pages read back widened in-scan. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  test("int->long and float->double widen without rewriting a byte") {
    val dir = tmpDir("widen-t")
    val df = Seq((1, 1.5f, "a"), (2, 2.5f, "b")).toDF("k", "w", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    t.append(df)
    val filesBefore = t.snapshot.files.map(_.path).toSet
    assert(t.widenColumnType("k", LongType) > 0L)
    assert(t.widenColumnType("w", DoubleType) > 0L)
    assert(t.snapshot.files.map(_.path).toSet === filesBefore,
      "widening must be metadata-only")
    val p = t.snapshot.protocol.get
    assert(p.readerFeatures.get.contains("typeWidening"))
    assert(p.writerFeatures.get.contains("typeWidening"))
    // old (narrow) and new (wide) files answer under the widened schema
    t.append(Seq((3L, 9.25d, "c")).toDF("k", "w", "v"))
    assert(t.schema("k").dataType === LongType)
    val rows = t.toDF.orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.5d, 2.5d, 9.25d))
    // the protocol's typeChanges record rides the field metadata
    val tc = t.schema("k").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length === 1 && tc.head.getString("toType") === "bigint")
  }

  test("timestampNtz columns raise the feature and round-trip with stats skipping") {
    val dir = tmpDir("ntz")
    val df = Seq(
      (1L, java.time.LocalDateTime.of(2021, 7, 20, 10, 0, 0)),
      (2L, java.time.LocalDateTime.of(2021, 7, 21, 11, 30, 0)))
      .toDF("k", "ts")
    assert(df.schema("ts").dataType === TimestampNTZType)
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    val p = t.snapshot.protocol.get
    assert(p.minReaderVersion === 3)
    assert(p.readerFeatures.get.contains("timestampNtz"))
    assert(p.writerFeatures.get.contains("timestampNtz"))
    t.append(df)
    val back = t.toDF.orderBy("k").collect()
    assert(back.map(_.getAs[java.time.LocalDateTime]("ts").getHour).toSeq === Seq(10, 11),
      "NTZ wall-clock values must round-trip unshifted")
    assert(t.schema("ts").dataType === TimestampNTZType)
  }

  test("byte->short and date->timestamp_ntz widen too; NTZ raise rides the widen") {
    val dir = tmpDir("widen-more")
    val df = Seq((1.toByte, java.sql.Date.valueOf("2021-07-20")),
      (2.toByte, java.sql.Date.valueOf("2021-07-21"))).toDF("b", "d")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    t.append(df)
    assert(t.widenColumnType("b", ShortType) > 0L)
    assert(t.widenColumnType("d", TimestampNTZType) > 0L)
    val p = t.snapshot.protocol.get
    assert(p.readerFeatures.get.contains("typeWidening"))
    assert(p.readerFeatures.get.contains("timestampNtz"),
      "widening INTO ntz must raise timestampNtz in the same commit")
    val rows = t.toDF.orderBy("b").collect()
    assert(rows.map(_.getShort(0)).toSeq === Seq(1.toShort, 2.toShort))
    assert(rows.map(_.getAs[java.time.LocalDateTime](1).getDayOfMonth).toSeq === Seq(20, 21))
  }

  test("widening a column referenced by a generated column or constraint refuses") {
    val dir = tmpDir("widen-ref")
    val sch = StructType(Seq(
      StructField("k", IntegerType),
      DeltaTable.generatedField("g", IntegerType, "k")))
    val t = DeltaTable.forPath(spark, dir).create(sch)
    assertThrows[IllegalArgumentException](t.widenColumnType("k", LongType))
  }

  test("mergeSchema evolution adding NTZ raises the feature in the same commit") {
    val dir = tmpDir("widen-ntz-evolve")
    val df = Seq((1L, "a")).toDF("k", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    t.append(df)
    assert(t.snapshot.protocol.get.minReaderVersion === 1)
    val withNtz = Seq((2L, "b", java.time.LocalDateTime.of(2021, 1, 1, 0, 0)))
      .toDF("k", "v", "ts")
    t.append(withNtz, mergeSchema = true)
    val p = t.snapshot.protocol.get
    assert(p.minReaderVersion === 3)
    assert(p.readerFeatures.get.contains("timestampNtz"))
    assert(p.writerFeatures.get.contains("timestampNtz"))
    assert(t.toDF.count() === 2L)
  }

  test("NESTED NTZ (struct field) raises the feature at create") {
    val dir = tmpDir("widen-ntz-nested")
    val sch = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StructType(Seq(StructField("ts", TimestampNTZType))))))
    val t = DeltaTable.forPath(spark, dir).create(sch)
    assert(t.snapshot.protocol.get.readerFeatures.get.contains("timestampNtz"))
  }

  test("narrowing, unknown columns, and partition columns refuse") {
    val dir = tmpDir("widen-no")
    val df = Seq((1L, 1, "x")).toDF("k", "n", "par")
    val t = DeltaTable.forPath(spark, dir).create(df.schema,
      partitionColumns = Seq("par"))
    t.append(df)
    assertThrows[IllegalArgumentException](t.widenColumnType("k", IntegerType))
    assertThrows[IllegalArgumentException](t.widenColumnType("nope", LongType))
    assertThrows[IllegalArgumentException](t.widenColumnType("par", LongType))
  }

  test("data skipping keeps pruning across the widen; DML works on mixed files") {
    val dir = tmpDir("widen-skip")
    val df1 = (0 until 50).map(i => (i, s"a$i")).toDF("k", "v")
    val t = DeltaTable.forPath(spark, dir).create(df1.schema)
    t.append(df1)
    assert(t.widenColumnType("k", LongType) > 0L)
    t.append((100L until 150L).map(i => (i, s"b$i")).toDF("k", "v"))
    val pruned = t.scanFiles(Seq(DataSkipping.ColPred("k", "<=", 10L)))
    assert(pruned.size === 1, "old-file int stats must prune under the long predicate")
    assert(t.delete(col("k") >= 100L && col("k") < 110L) > 0L)
    assert(t.toDF.count() === 90L)
  }
}
