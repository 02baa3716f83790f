package graft.delta

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ALTER TABLE ... CLUSTER BY (liquid re-clustering) and the
  * operationMetrics DESCRIBE HISTORY column (round 16). */
class AlterClusterBySpec extends SparkSpec {
  import spark.implicits._

  private def df = (0L until 256L).map(i =>
    (i, (i * 37) % 256, s"v$i")).toDF("a", "b", "v")

  test("CLUSTER BY enables, re-keys, and NONE disables clustering") {
    val dir = tmpDir("acb")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    t.append(df)
    // unclustered: clustering maintenance refuses
    intercept[IllegalArgumentException](t.optimizeClustered())
    // enable: one metadata commit, features raised, no data moved
    val files0 = t.snapshot.files.map(_.path).toSet
    val v = t.alterClusterBy(Seq("a"))
    assert(t.snapshot.version === v)
    assert(t.clusteringColumns === Seq("a"))
    assert(t.snapshot.protocol.get.writerFeatures.get.contains("clusteredTable"))
    assert(t.snapshot.files.map(_.path).toSet === files0, "metadata-only")
    assert(t.optimizeClustered() > 0L)
    val tagged = t.snapshot.files
    assert(tagged.forall(_.tags.exists(_.contains(DeltaTable.ZCubeColsTag))))
    // re-key: old cubes stop matching, so incremental maintenance
    // rewrites everything under the new columns (a fresh append joins
    // them — a single-file table would no-op on the <2-candidates rule)
    t.append(df.coalesce(1))
    t.alterClusterBy(Seq("b"))
    assert(t.clusteringColumns === Seq("b"))
    assert(t.optimizeClustered() > 0L,
      "old-key cubes must be candidates under the new key")
    assert(t.toDF.count() === 512L)
    // NONE: columns clear, maintenance refuses again, feature stays
    t.alterClusterBy(Nil)
    assert(t.clusteringColumns.isEmpty)
    intercept[IllegalArgumentException](t.optimizeClustered())
    assert(t.snapshot.protocol.get.writerFeatures.get.contains("clusteredTable"))
    // bad column and partitioned-table refusals
    intercept[IllegalArgumentException](t.alterClusterBy(Seq("nope")))
    val pdir = tmpDir("acb-part")
    val pt = DeltaTable.forPath(spark, pdir)
      .create(df.schema, partitionColumns = Seq("b"))
    intercept[IllegalArgumentException](pt.alterClusterBy(Seq("a")))
    // SQL surface
    val sdir = tmpDir("acb-sql")
    val st = DeltaTable.forPath(spark, sdir).create(df.schema)
    st.append(df)
    spark.sql(s"ALTER TABLE '$sdir' CLUSTER BY (a, b)")
    assert(DeltaTable.forPath(spark, sdir).clusteringColumns === Seq("a", "b"))
    spark.sql(s"ALTER TABLE '$sdir' CLUSTER BY NONE")
    assert(DeltaTable.forPath(spark, sdir).clusteringColumns.isEmpty)
  }

  test("operationMetrics ride commits and surface in DESCRIBE HISTORY") {
    val dir = tmpDir("opmetrics")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    t.append(df.coalesce(2))
    val (_, appendCi) = t.log.history(Some(1)).head
    val am = appendCi.get.operationMetrics.get
    assert(am("numFiles") === "2")
    assert(am("numOutputRows") === "256")
    assert(am("numOutputBytes").toLong > 0L)
    // DML rewrite metrics via the shared commit tail
    t.delete(col("a") < 10L)
    val dm = t.log.history(Some(1)).head._2.get.operationMetrics.get
    assert(dm("numRemovedFiles").toInt >= 1 && dm("numAddedFiles").toInt >= 1)
    // OPTIMIZE metrics
    t.append(df.coalesce(1))
    t.compact(minBytes = Long.MaxValue)
    val om = t.log.history(Some(1)).head._2.get.operationMetrics.get
    assert(om("numRemovedFiles").toInt >= 2 && om("numAddedFiles").toInt >= 1)
    assert(om("numRemovedBytes").toLong > 0L)
    // SQL column (empty map for metric-less commits like CREATE)
    val rows = spark.sql(s"DESCRIBE HISTORY '$dir'").collect()
    val byOp = rows.map(r => r.getString(2) -> r.getMap[String, String](4)).toMap
    assert(byOp("WRITE").nonEmpty && byOp("OPTIMIZE").nonEmpty)
    assert(byOp("CREATE TABLE").isEmpty)
    // RESTORE metrics
    t.restoreTo(1L)
    val rm = t.log.history(Some(1)).head._2.get.operationMetrics.get
    assert(rm.contains("numRestoredFiles") && rm.contains("numRemovedFiles"))
  }
}
