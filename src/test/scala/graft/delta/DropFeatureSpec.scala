package graft.delta

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ALTER TABLE ... DROP FEATURE: a feature leaves the protocol only when
  * no table state uses it; reader-scoped features demand TRUNCATE
  * HISTORY; downgrades must never underclaim what the state requires. */
class DropFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def protoOf(t: DeltaTable) = t.snapshot.protocol.get

  test("writer feature drop: changeDataFeed leaves the protocol once disabled") {
    // ICT forces table-features form (writer 7) so changeDataFeed is an
    // enumerated feature — CDF alone rides the legacy writer-4 protocol,
    // where there is nothing to drop (and dropFeature says so loudly)
    val t = DeltaTable.forPath(spark, tmpDir("dropf-cdf")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.CdfConfigKey -> "true",
        DeltaTable.IctConfigKey -> "true"))
    t.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    // still enabled → refuse
    val e = intercept[IllegalArgumentException](t.dropFeature("changeDataFeed"))
    assert(e.getMessage.contains("still enabled"))
    t.setProperties(Map(DeltaTable.CdfConfigKey -> "false"))
    assert(t.dropFeature("changeDataFeed") > 0L)
    assert(!protoOf(t).writerFeatures.getOrElse(Nil).contains("changeDataFeed"))
    // the table keeps working and the feature can come back
    t.append(Seq((100L, "y")).toDF("id", "v"))
    t.setProperties(Map(DeltaTable.CdfConfigKey -> "true"))
    assert(protoOf(t).writerFeatures.getOrElse(Nil).contains("changeDataFeed"))
  }

  test("reader feature drop: deletionVectors needs purge + disable + TRUNCATE HISTORY") {
    val t = DeltaTable.forPath(spark, tmpDir("dropf-dv")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    t.append((0L until 30L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    assert(t.deleteWithDv(col("id") < 5L) > 0L)
    t.setProperties(Map(DeltaTable.DvConfigKey -> "false"))
    // live DV → refuse even with truncate — and the FAILED drop must
    // leave history fully intact (truncation only runs after the
    // downgrade commit lands)
    val e1 = intercept[IllegalArgumentException](
      t.dropFeature("deletionVectors", truncateHistory = true))
    assert(e1.getMessage.contains("REORG"))
    assert(t.log.snapshotAt(1L).files.nonEmpty,
      "a refused TRUNCATE HISTORY drop must not have truncated anything")
    t.purgeDeletionVectors()
    // reader-scoped without TRUNCATE HISTORY → refuse
    val e2 = intercept[IllegalArgumentException](t.dropFeature("deletionVectors"))
    assert(e2.getMessage.contains("TRUNCATE HISTORY"))
    val tip = t.snapshot.version
    assert(t.dropFeature("deletionVectors", truncateHistory = true) === tip + 1)
    val p = protoOf(t)
    assert(!p.readerFeatures.getOrElse(Nil).contains("deletionVectors"))
    assert(!p.writerFeatures.getOrElse(Nil).contains("deletionVectors"))
    // history below the truncation checkpoint is gone; the tip reads fine
    val t2 = DeltaTable.forPath(spark, t.path)
    assert(t2.toDF.count() === 25L)
    intercept[Exception](t2.log.snapshotAt(1L))
    // downgraded minReaderVersion once no reader feature remains
    assert(p.minReaderVersion === 1)
  }

  test("rowTracking drop tombstones its domain; unknown/forever features refuse") {
    val t = DeltaTable.forPath(spark, tmpDir("dropf-rt")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.RowTrackingConfigKey -> "true"))
    t.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(t.snapshot.domainMetadata.contains(DeltaLog.RowTrackingDomain))
    t.setProperties(Map(DeltaTable.RowTrackingConfigKey -> "false"))
    assert(t.dropFeature("rowTracking") > 0L)
    assert(!protoOf(t).writerFeatures.getOrElse(Nil).contains("rowTracking"))
    assert(!t.snapshot.domainMetadata.contains(DeltaLog.RowTrackingDomain),
      "the high-water-mark domain must tombstone with the feature")

    intercept[IllegalArgumentException](t.dropFeature("columnMapping"))
    intercept[IllegalArgumentException](t.dropFeature("notAFeature"))
    // not in the protocol at all
    intercept[IllegalArgumentException](t.dropFeature("deletionVectors"))
  }

  test("SQL: ALTER TABLE ... DROP FEATURE [TRUNCATE HISTORY]") {
    val t = DeltaTable.forPath(spark, tmpDir("dropf-sql")).create(
      Seq((0L, "x")).toDF("id", "v").schema,
      configuration = Map(DeltaTable.IctConfigKey -> "true"))
    t.append((0L until 5L).map(i => (i, s"v$i")).toDF("id", "v"))
    spark.sql(s"ALTER TABLE '${t.path}' SET TBLPROPERTIES " +
      s"('${DeltaTable.IctConfigKey}' = 'false')")
    val rows = spark.sql(
      s"ALTER TABLE '${t.path}' DROP FEATURE inCommitTimestamp").collect()
    assert(rows.head.getString(1) === "inCommitTimestamp" && rows.head.getLong(2) > 0L)
    assert(!DeltaTable.forPath(spark, t.path).snapshot.protocol.get
      .writerFeatures.getOrElse(Nil).contains("inCommitTimestamp"))
  }
}
