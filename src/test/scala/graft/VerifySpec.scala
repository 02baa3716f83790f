package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The oracle-output contract of graft.Verify: timestamp columns must reach
  * parquet as TIMESTAMP_NTZ (naive µs — what the DuckDB side of the
  * driver's gate produces), not Spark's default tz-adjusted instant. This
  * pins the round-3 regression where every timestamp-emitting query went
  * schema-red on the tz annotation alone. */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  test("ntz casts every top-level timestamp column, preserving UTC values") {
    val df = Seq((1L, "2021-07-20 23:18:18"))
      .toDF("id", "s")
      .select(col("id"), to_timestamp(col("s")).as("ts"),
        to_timestamp(col("s")).as("ts2"), col("s"))
    val out = Verify.ntz(df)
    assert(out.schema("ts").dataType === TimestampNTZType)
    assert(out.schema("ts2").dataType === TimestampNTZType)
    assert(out.schema("id").dataType === LongType)
    assert(out.schema("s").dataType === StringType)
    // session tz is UTC → wall-clock values are unchanged
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).head.getString(0)
      === "2021-07-20 23:18:18")
  }

  test("ntz outputs read back from parquet as naive timestamps") {
    val dir = tmpDir("verify-ntz")
    val df = Seq(1L).toDF("id")
      .select(col("id"), to_timestamp(lit("2021-01-02 03:04:05")).as("ts"))
    Verify.ntz(df).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType === TimestampNTZType,
      s"parquet round-trip must stay NTZ, got ${back.schema("ts").dataType}")
  }
}
