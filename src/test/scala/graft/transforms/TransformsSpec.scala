package graft.transforms

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Port of the reference's transform unit tests
  * (/root/reference/src/transforms.rs:478-787): substr char semantics,
  * chrono-Debug ISO-8601 rendering, ms→µs, nested set + null-not-set, and
  * Kafka meta injection.
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame) = df.head()

  test("substr returns Will from William (start 0 len 4)") {
    val r = one(Seq("William").toDF("name")
      .select(JmesPath.toColumn(JmesPath.parse("substr(name, `0`, `4`)")).as("s")))
    assert(r.getString(0) === "Will")
  }

  test("substr returns liam from William (start 3 len 4)") {
    val r = one(Seq("William").toDF("name")
      .select(JmesPath.toColumn(JmesPath.parse("substr(name, `3`, `4`)")).as("s")))
    assert(r.getString(0) === "liam")
  }

  test("transforms_with_substr: modified_date from modified") {
    val df = Seq(("A", "2021-03-16T14:38:58Z")).toDF("name", "modified")
      .withColumn("modified_date", lit(null).cast("string"))
    val out = Transformer(Seq("modified_date" -> "substr(modified, `0`, `10`)"))(df).head()
    assert(out.getAs[String]("name") === "A")
    assert(out.getAs[String]("modified") === "2021-03-16T14:38:58Z")
    assert(out.getAs[String]("modified_date") === "2021-03-16")
  }

  test("iso8601 from epoch seconds renders chrono-Debug style (no fraction)") {
    val r = one(Seq(1626823098L).toDF("v")
      .select(TimeFormat.iso8601FromEpoch(col("v"), "s").as("s")))
    assert(r.getString(0) === "2021-07-20T23:18:18Z")
  }

  test("iso8601 from epoch micros: whole seconds lose the fraction") {
    val r = one(Seq(1626823098000000L).toDF("v")
      .select(TimeFormat.iso8601FromEpoch(col("v"), "us").as("s")))
    assert(r.getString(0) === "2021-07-20T23:18:18Z")
  }

  test("iso8601 fraction groups: millis render .3, micros render .6") {
    val r = one(Seq((1626823098123L, 1626823098123456L)).toDF("ms", "us")
      .select(
        TimeFormat.iso8601FromEpoch(col("ms"), "ms").as("a"),
        TimeFormat.iso8601FromEpoch(col("us"), "us").as("b")))
    assert(r.getString(0) === "2021-07-20T23:18:18.123Z")
    assert(r.getString(1) === "2021-07-20T23:18:18.123456Z")
  }

  test("epoch_millis_to_micro multiplies by 1000") {
    val r = one(Seq(1732279537028L).toDF("modified")
      .select(JmesPath.toColumn(JmesPath.parse("epoch_millis_to_micro(modified)")).as("v")))
    assert(r.getLong(0) === 1732279537028000L)
  }

  test("nested set creates intermediate fields, keeps siblings") {
    val df = Seq(Tuple1("Doe")).toDF("last")
      .select(struct(col("last")).as("name"))
    val out = Transformer(Seq("name.first" -> "'John'"))(df).head()
    val name = out.getAs[org.apache.spark.sql.Row]("name")
    assert(name.getAs[String]("last") === "Doe")
    assert(name.getAs[String]("first") === "John")
  }

  test("null-result-not-set: existing value kept when source is null") {
    val df = Seq(("keepme", Option.empty[String])).toDF("target", "src")
    val out = Transformer(Seq("target" -> "src"))(df).head()
    assert(out.getAs[String]("target") === "keepme")
  }

  test("null-result-not-set: fresh target becomes null, row survives") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("src")
    val out = Transformer(Seq("fresh" -> "src"))(df).head()
    assert(out.isNullAt(out.fieldIndex("fresh")))
  }

  test("kafka meta: timestamp is converted ms to us, offset passes through") {
    val df = Seq((3, 42L, "t", 1732279537028L, 0))
      .toDF("partition", "offset", "topic", "timestamp", "timestampType")
    val out = df.select(
      KafkaMeta.column("kafka.timestamp").as("ts_us"),
      KafkaMeta.column("kafka.offset").as("off"),
      KafkaMeta.column("kafka.partition").as("part"),
      KafkaMeta.column("kafka.topic").as("topic")).head()
    assert(out.getAs[Long]("ts_us") === 1732279537028000L)
    assert(out.getAs[Long]("off") === 42L)
    assert(out.getAs[Int]("part") === 3)
    assert(out.getAs[String]("topic") === "t")
  }

  test("unsupported JMESPath specs fail fast at compile time") {
    assertThrows[TransformCompileError](JmesPath.parse("a[0].b"))
    assertThrows[TransformCompileError](JmesPath.parse("a | b"))
    assertThrows[TransformCompileError](
      JmesPath.toColumn(JmesPath.parse("unknown_fn(a)")))
  }
}
