package graft.serialization

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wire-format edge cases for the decode expressions (the happy paths are
  * oracle-checked as ref_d1–ref_d7): corrupt/garbage inputs must yield
  * NULL (→ dead letter), never throw; framing magic is enforced. */
class DecodersSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    """{"type":"record","name":"M","fields":[
      |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin

  test("gzip roundtrip is identity; corrupt gzip yields null") {
    val df = Seq("hello graft").toDF("s")
      .select(Decoders.gunzip(Decoders.gzip(col("s").cast("binary"))).cast("string").as("rt"),
        Decoders.gunzip(lit(Array[Byte](1, 2, 3))).as("bad"))
    val r = df.head()
    assert(r.getString(0) === "hello graft")
    assert(r.isNullAt(1))
  }

  test("avro SOE: roundtrip decodes; wrong magic and unknown fingerprint yield null") {
    val json = """{"id":7,"name":"x"}"""
    val df = Seq(json).toDF("j").select(
      Decoders.avroSoe(Decoders.avroEncode(col("j"), schema, soe = true), Seq(schema)).as("ok"),
      Decoders.avroSoe(lit("nonsense".getBytes), Seq(schema)).as("badmagic"),
      Decoders.avroSoe(Decoders.avroEncode(col("j"), schema, soe = true), Seq.empty).as("unknownfp"))
    val r = df.head()
    val node = graft.delta.Actions.mapper.readTree(r.getString(0))
    assert(node.get("id").asLong() === 7L && node.get("name").asText() === "x")
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
  }

  test("avro SOE from a schema directory: each .avsc is fingerprinted and resolvable") {
    val schema2 =
      """{"type":"record","name":"N","fields":[
        |{"name":"k","type":"string"}]}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("avsc")
    java.nio.file.Files.writeString(dir.resolve("m.avsc"), schema)
    java.nio.file.Files.writeString(dir.resolve("n.avsc"), schema2)
    java.nio.file.Files.writeString(dir.resolve("ignored.txt"), "not a schema")
    try {
      assert(Decoders.avscSchemas(dir) === Seq(schema, schema2)) // name-sorted, .avsc only
      assert(Decoders.avscSchemas(dir.resolve("m.avsc")) === Seq(schema)) // single file
      // frames written under EITHER schema decode through the directory
      val r = Seq(("""{"id":7,"name":"x"}""", """{"k":"v"}""")).toDF("a", "b").select(
        Decoders.avroSoe(Decoders.avroEncode(col("a"), schema, soe = true), dir).as("m"),
        Decoders.avroSoe(Decoders.avroEncode(col("b"), schema2, soe = true), dir).as("n")).head()
      assert(graft.delta.Actions.mapper.readTree(r.getString(0)).get("id").asLong() === 7L)
      assert(graft.delta.Actions.mapper.readTree(r.getString(1)).get("k").asText() === "v")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala.foreach(java.nio.file.Files.delete)
      java.nio.file.Files.delete(dir)
    }
  }

  test("registry JSON framing: header stripped; missing magic yields null") {
    val payload = Array[Byte](0, 0, 0, 0, 42) ++ """{"a":1}""".getBytes("UTF-8")
    val r = Seq(1).toDF("x").select(
      Decoders.registryJson(lit(payload)).as("ok"),
      Decoders.registryJson(lit("""{"a":1}""".getBytes)).as("noheader")).head()
    assert(r.getString(0) === """{"a":1}""")
    assert(r.isNullAt(1))
  }

  test("avro container: decodes the first record only; garbage yields null") {
    val json = """{"id":1,"name":"first"}"""
    val r = Seq(json).toDF("j").select(
      Decoders.avroContainer(Decoders.avroContainerEncode(col("j"), schema)).as("ok"),
      Decoders.avroContainer(lit(Array[Byte](9, 9, 9))).as("bad")).head()
    assert(graft.delta.Actions.mapper.readTree(r.getString(0)).get("name").asText() === "first")
    assert(r.isNullAt(1))
  }

  test("avro registry framing: id lookup; unknown id yields null") {
    val json = """{"id":3,"name":"y"}"""
    val body = Seq(json).toDF("j")
      .select(Decoders.avroEncode(col("j"), schema, soe = false).as("b"))
      .head().getAs[Array[Byte]]("b")
    val framed = Array[Byte](0, 0, 0, 0, 7) ++ body
    val r = Seq(1).toDF("x").select(
      Decoders.avroRegistry(lit(framed), Map(7 -> schema)).as("ok"),
      Decoders.avroRegistry(lit(framed), Map(8 -> schema)).as("unknown")).head()
    assert(graft.delta.Actions.mapper.readTree(r.getString(0)).get("id").asLong() === 3L)
    assert(r.isNullAt(1))
  }
}
