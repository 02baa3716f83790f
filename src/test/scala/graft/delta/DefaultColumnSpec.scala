package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Column defaults (Delta writer feature `allowColumnDefaults`): omitted
  * columns evaluate their CURRENT_DEFAULT on append; provided values pass
  * through unchecked; defaults must be constant expressions. */
class DefaultColumnSpec extends SparkSpec {
  import spark.implicits._

  test("omitted column takes the default; provided values pass through") {
    val dir = tmpDir("def-basic")
    val sch = StructType(Seq(
      StructField("k", LongType),
      DeltaTable.defaultField("src", StringType, "'unknown'"),
      DeltaTable.defaultField("weight", LongType, "7")))
    val t = DeltaTable.forPath(spark, dir).create(sch)
    assert(t.snapshot.protocol.get.writerFeatures.get.contains("allowColumnDefaults"))
    assert(t.columnDefaults === Map("src" -> "'unknown'", "weight" -> "7"))
    t.append(Seq(1L, 2L).toDF("k"))
    t.append(Seq((3L, "web", 9L)).toDF("k", "src", "weight"))
    val rows = t.toDF.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows === Map(
      1L -> ("unknown", 7L), 2L -> ("unknown", 7L), 3L -> ("web", 9L)))
  }

  test("non-constant and non-deterministic defaults refuse at create") {
    def refuse(name: String, e: String): Unit = {
      val sch = StructType(Seq(
        StructField("k", LongType),
        DeltaTable.defaultField(name, LongType, e)))
      assertThrows[IllegalArgumentException](
        DeltaTable.forPath(spark, tmpDir(s"def-bad-$name")).create(sch))
    }
    refuse("bad", "k + 1")
    // 'id' must not silently resolve against some internal relation
    refuse("copy", "id")
    refuse("roll", "CAST(rand() * 100 AS BIGINT)")
  }

  test("defaults compose with generated columns and partitioning") {
    val dir = tmpDir("def-compose")
    val sch = StructType(Seq(
      StructField("v", LongType),
      DeltaTable.defaultField("tier", StringType, "'bronze'"),
      DeltaTable.generatedField("bucket", LongType, "v % 3")))
    val t = DeltaTable.forPath(spark, dir)
      .create(sch, partitionColumns = Seq("bucket"))
    t.append((0L until 9L).toDF("v"))
    assert(t.toDF.filter(col("tier") === "bronze").count() === 9L)
    assert(t.toDF.filter(col("bucket") === col("v") % 3).count() === 9L)
    // a default on a PARTITION column routes rows to its directory
    val dir2 = tmpDir("def-part")
    val sch2 = StructType(Seq(
      StructField("v", LongType),
      DeltaTable.defaultField("region", StringType, "'emea'")))
    val t2 = DeltaTable.forPath(spark, dir2)
      .create(sch2, partitionColumns = Seq("region"))
    t2.append(Seq(1L).toDF("v"))
    assert(t2.snapshot.files.head.partitionValues === Map("region" -> "emea"))
  }
}
