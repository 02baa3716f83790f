package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Pins generated-column partition pruning ([[GeneratedPruning]]): a
  * predicate on the SOURCE column prunes the files of a partition
  * column GENERATED from it, for each whitelisted monotone shape —
  * and derives nothing (while staying correct) outside the whitelist. */
class GeneratedPruningSpec extends SparkSpec {
  import DataSkipping.ColPred
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("substring-prefix generation: ts_str range prunes to the matching day partitions") {
    val t = DeltaTable.forPath(spark, tmpDir("genprune-sub")).create(
      StructType(Seq(
        StructField("ts_str", StringType),
        StructField("v", LongType),
        DeltaTable.generatedField("day", StringType, "substring(ts_str, 1, 10)"))),
      partitionColumns = Seq("day"))
    t.append((1 to 3).flatMap(d => (0 until 4).map(i =>
      (f"2021-11-0$d%d 0$i%d:00:00", (d * 10 + i).toLong))).toDF("ts_str", "v"))
    assert(t.snapshot.files.map(_.partitionValues("day")).toSet.size === 3)
    val preds = Seq(ColPred("ts_str", ">=", "2021-11-02"),
      ColPred("ts_str", "<", "2021-11-03"))
    val files = t.scanFiles(preds)
    assert(files.nonEmpty &&
      files.forall(_.partitionValues("day") == "2021-11-02"),
      s"must prune to day=2021-11-02, got ${files.map(_.partitionValues("day"))}")
    assert(t.scan(preds).select("v").as[Long].collect().sorted
      === (0 until 4).map(i => (20 + i).toLong))
  }

  test("chronological-cast generation: ts range prunes a DATE partition column") {
    val t = DeltaTable.forPath(spark, tmpDir("genprune-date")).create(
      StructType(Seq(
        StructField("ts", TimestampType),
        StructField("v", LongType),
        DeltaTable.generatedField("day", DateType, "CAST(ts AS DATE)"))),
      partitionColumns = Seq("day"))
    t.append((1 to 3).flatMap(d => (0 until 3).map(i =>
      (ts(f"2021-11-0$d%d 1$i%d:30:00"), (d * 10 + i).toLong))).toDF("ts", "v"))
    val preds = Seq(ColPred("ts", ">=", ts("2021-11-02 00:00:00")),
      ColPred("ts", "<=", ts("2021-11-02 23:59:59")))
    val files = t.scanFiles(preds)
    assert(files.nonEmpty && files.forall(_.partitionValues("day") == "2021-11-02"),
      s"got ${files.map(_.partitionValues("day"))}")
    assert(t.scan(preds).count() === 3L)
  }

  test("year() generation prunes; non-monotone month() derives nothing but stays correct") {
    val t = DeltaTable.forPath(spark, tmpDir("genprune-yr")).create(
      StructType(Seq(
        StructField("ts", TimestampType),
        StructField("v", LongType),
        DeltaTable.generatedField("yr", IntegerType, "year(ts)"))),
      partitionColumns = Seq("yr"))
    t.append(Seq(
      (ts("2020-06-01 00:00:00"), 1L), (ts("2021-06-01 00:00:00"), 2L),
      (ts("2022-06-01 00:00:00"), 3L)).toDF("ts", "v"))
    val preds = Seq(ColPred("ts", ">=", ts("2021-01-01 00:00:00")),
      ColPred("ts", "<", ts("2022-01-01 00:00:00")))
    val files = t.scanFiles(preds)
    assert(files.nonEmpty && files.forall(_.partitionValues("yr") == "2021"),
      s"got ${files.map(_.partitionValues("yr"))}")
    assert(t.scan(preds).select("v").as[Long].collect().toSeq === Seq(2L))

    val m = DeltaTable.forPath(spark, tmpDir("genprune-mo")).create(
      StructType(Seq(
        StructField("ts", TimestampType),
        StructField("v", LongType),
        DeltaTable.generatedField("mo", IntegerType, "month(ts)"))),
      partitionColumns = Seq("mo"))
    m.append(Seq(
      (ts("2021-05-01 00:00:00"), 1L), (ts("2021-06-01 00:00:00"), 2L)).toDF("ts", "v"))
    val mPreds = Seq(ColPred("ts", ">=", ts("2021-06-01 00:00:00")))
    // month is not monotone across years: NOTHING derives (plain ts
    // stats-skipping still applies, so scanFiles may prune — that's the
    // other mechanism); results stay correct either way
    assert(GeneratedPruning.derive(spark, m.schema, m.partitionColumns,
      m.generatedColumns, mPreds) === Nil)
    assert(m.scan(mPreds).select("v").as[Long].collect().toSeq === Seq(2L))
  }

  test("date_trunc generation prunes at month granularity") {
    val t = DeltaTable.forPath(spark, tmpDir("genprune-trunc")).create(
      StructType(Seq(
        StructField("ts", TimestampType),
        StructField("v", LongType),
        DeltaTable.generatedField("mon", TimestampType, "date_trunc('MONTH', ts)"))),
      partitionColumns = Seq("mon"))
    t.append(Seq(
      (ts("2021-05-15 08:00:00"), 1L), (ts("2021-06-15 08:00:00"), 2L),
      (ts("2021-07-15 08:00:00"), 3L)).toDF("ts", "v"))
    val preds = Seq(ColPred("ts", ">=", ts("2021-06-01 00:00:00")),
      ColPred("ts", "<", ts("2021-07-01 00:00:00")))
    // timestamp partition values render in a non-stats format; the
    // derived bound still prunes via the chronological comparison IF
    // parseable — at minimum the scan stays correct
    assert(t.scan(preds).select("v").as[Long].collect().toSeq === Seq(2L))
  }

  test("monotoneSource whitelist: accepts prefix/cast/year, rejects the rest") {
    val sch = StructType(Seq(
      StructField("s", StringType), StructField("ts", TimestampType),
      StructField("n", LongType)))
    def m(sql: String) = GeneratedPruning.monotoneSource(spark, sch, sql)
    assert(m("substring(s, 1, 7)") === Some("s"))
    assert(m("substring(s, 2, 7)") === None)  // mid-string: not monotone
    assert(m("CAST(ts AS DATE)") === Some("ts"))
    assert(m("CAST(s AS DATE)") === None)     // string parse: not monotone
    assert(m("year(ts)") === Some("ts"))
    assert(m("month(ts)") === None)
    assert(m("n % 10") === None)
    assert(m("concat(s, 'x')") === None)      // suffix changes order
    assert(m("date_trunc('DAY', ts)") === Some("ts"))
  }
}
