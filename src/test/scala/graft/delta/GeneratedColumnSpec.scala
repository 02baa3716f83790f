package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Generated columns (Delta protocol "Generated Columns", writer v4):
  * omitted on append → computed; provided → enforced; merge/update
  * enforce consistency (the documented enforce-not-recompute scope). */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", DoubleType),
    DeltaTable.generatedField("bucket", LongType, "CAST(floor(v) AS BIGINT)")))

  private def newTable(): DeltaTable =
    DeltaTable.forPath(spark, tmpDir("gencol")).create(schema)

  test("create records writer v4; omitted column is computed on append") {
    val t = newTable()
    assert(t.snapshot.protocol.get.minWriterVersion === 4)
    assert(t.generatedColumns === Map("bucket" -> "CAST(floor(v) AS BIGINT)"))
    t.append(Seq((1L, 2.7), (2L, -1.2)).toDF("id", "v"))
    val got = t.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L), (2L, -2L)))
  }

  test("a provided value is enforced: consistent passes, mismatch refuses and commits nothing") {
    val t = newTable()
    t.append(Seq((1L, 2.7, 2L)).toDF("id", "v", "bucket")) // consistent
    assert(t.toDF.count() === 1L)
    val v = t.snapshot.version
    val e = intercept[Exception](
      t.append(Seq((2L, 2.7, 99L)).toDF("id", "v", "bucket")))
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("generated column 'bucket'"))
    assert(t.snapshot.version === v, "a refused write must commit nothing")
    assert(t.toDF.count() === 1L)
  }

  test("update: breaking generation consistency refuses; consistent SET passes") {
    val t = newTable()
    t.append(Seq((1L, 2.7), (2L, 5.5)).toDF("id", "v"))
    // SET v without bucket → stale bucket no longer matches → refuse
    assertThrows[Exception](
      t.update(col("id") === 1L, Map("v" -> lit(9.9))))
    // SET both consistently → passes
    assert(t.update(col("id") === 1L,
      Map("v" -> lit(9.9), "bucket" -> lit(9L))) > 0L)
    val r = t.toDF.filter(col("id") === 1L).collect()(0)
    assert(r.getDouble(1) === 9.9 && r.getLong(2) === 9L)
  }

  test("merge enforces: a source omitting the generated column cannot insert") {
    val t = newTable()
    t.append(Seq((1L, 2.7)).toDF("id", "v"))
    // unmatched source row inserts with bucket null-filled → enforcement
    // refuses loudly (the documented enforce-not-recompute divergence)
    assertThrows[Exception](
      t.merge(Seq((5L, 3.3)).toDF("id", "v"), Seq("id")))
    // a source carrying the consistent value merges fine
    assert(t.merge(Seq((5L, 3.3, 3L)).toDF("id", "v", "bucket"), Seq("id")) > 0L)
    assert(t.toDF.count() === 2L)
  }
}
