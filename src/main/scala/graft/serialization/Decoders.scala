package graft.serialization

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileWriter, SeekableByteArrayInput, DataFileReader}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.SchemaNormalization
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Format decoders (reference §2.2, /root/reference/src/serialization.rs).
  *
  * Each decoder is a Catalyst `Expression` (binary → JSON text) evaluated on
  * executors; failures yield NULL so the pipeline can route the raw bytes to
  * the dead-letter channel (E2) instead of aborting the batch. Decoded JSON
  * feeds the same `parse_json` → coercion path as plain JSON messages, so
  * every format shares one downstream plan.
  *
  * The Confluent schema-registry decoders take a pre-resolved id→schema map
  * (this environment has no egress); the wire formats are public:
  * registry framing = 0x00 magic + 4-byte big-endian schema id
  * (src/serialization.rs:317-346); Avro single-object encoding = C3 01 magic
  * + 8-byte little-endian Rabin CRC-64-AVRO fingerprint
  * (src/serialization.rs:429-439).
  */
object Decoders {
  import org.apache.spark.sql.graft.ColumnBridge.{wrap, toExpr}

  /** D2: gunzip payload before parse (src/serialization.rs:108-127). */
  def gunzip(c: Column): Column = wrap(GzipDecompress(toExpr(c)))
  def gzip(c: Column): Column = wrap(GzipCompress(toExpr(c)))
  def avroContainer(c: Column, readerSchema: Option[String] = None): Column =
    wrap(AvroContainerDecode(toExpr(c), readerSchema))
  def avroSoe(c: Column, schemas: Seq[String]): Column =
    wrap(AvroSoeDecode(toExpr(c), schemas))
  /** D6 from a path: a directory is walked for `.avsc` files, a single file
    * is read directly — the reference's SoeAvroDeserializer::try_from_path
    * (src/serialization.rs:368-439); every schema is Rabin-fingerprinted by
    * [[AvroSoeDecode]]. */
  def avroSoe(c: Column, path: java.nio.file.Path): Column =
    avroSoe(c, avscSchemas(path))

  /** Schema JSONs at `path`: `.avsc` files of a directory (name-sorted for
    * deterministic plans) or the single file itself. */
  def avscSchemas(path: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val files =
      if (java.nio.file.Files.isDirectory(path)) {
        val s = java.nio.file.Files.list(path)
        try s.iterator().asScala.toSeq.filter(_.toString.endsWith(".avsc")).sortBy(_.toString)
        finally s.close()
      } else Seq(path)
    files.map(java.nio.file.Files.readString)
  }
  def avroRegistry(c: Column, schemaById: Map[Int, String]): Column =
    wrap(AvroRegistryDecode(toExpr(c), MapSchemaSource(schemaById)))
  /** D4 against a live registry (or any [[SchemaSource]]). */
  def avroRegistry(c: Column, source: SchemaSource): Column =
    wrap(AvroRegistryDecode(toExpr(c), source))
  def registryJson(c: Column): Column = wrap(RegistryJsonStrip(toExpr(c)))
  def avroEncode(jsonCol: Column, schemaJson: String, soe: Boolean = false): Column =
    wrap(AvroBinaryEncode(toExpr(jsonCol), schemaJson, soe))
  def avroContainerEncode(jsonCol: Column, schemaJson: String): Column =
    wrap(AvroContainerEncode(toExpr(jsonCol), schemaJson))
}

/** Gunzip: binary → binary; null on corrupt input. */
case class GzipDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => null }
  }
  override protected def withNewChildInternal(c: Expression): GzipDecompress = copy(child = c)
}

/** Gzip compress (test/e2e harness helper — the inverse of D2). */
case class GzipCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(input.asInstanceOf[Array[Byte]])
    gz.close()
    out.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): GzipCompress = copy(child = c)
}

/** Shared per-partition Avro machinery (transient: rebuilt per executor). */
trait AvroDecodeSupport { self: Expression =>
  @transient protected lazy val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()
  protected def parseSchema(json: String): Schema =
    schemaCache.computeIfAbsent(json, s => new Schema.Parser().parse(s))

  /** GenericRecord → JSON text (Avro's generic toString emits JSON). */
  protected def recordToJson(r: AnyRef): UTF8String =
    UTF8String.fromString(r.toString)

  protected def decodeBinary(schema: Schema, bytes: Array[Byte], off: Int): AnyRef = {
    val reader = new GenericDatumReader[AnyRef](schema)
    val dec = DecoderFactory.get().binaryDecoder(bytes, off, bytes.length - off, null)
    reader.read(null, dec)
  }
}

/** D5: Avro object-container decode; reads only the FIRST record, matching
  * the reference (src/serialization.rs:243-315 — "only first record").
  * Optional reader schema from an .avsc literal. */
case class AvroContainerDecode(child: Expression, readerSchemaJson: Option[String])
    extends UnaryExpression with CodegenFallback with AvroDecodeSupport {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    try {
      val reader = readerSchemaJson match {
        case Some(js) => new GenericDatumReader[AnyRef](null, parseSchema(js))
        case None => new GenericDatumReader[AnyRef]()
      }
      val dfr = new DataFileReader[AnyRef](
        new SeekableByteArrayInput(input.asInstanceOf[Array[Byte]]), reader)
      try { if (dfr.hasNext) recordToJson(dfr.next()) else null }
      finally dfr.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }
  override protected def withNewChildInternal(c: Expression): AvroContainerDecode = copy(child = c)
}

/** D6: Avro single-object encoding: [C3 01][8B LE Rabin fp][binary body];
  * fingerprint → schema from a pre-registered directory of schemas. */
case class AvroSoeDecode(child: Expression, schemaJsons: Seq[String])
    extends UnaryExpression with CodegenFallback with AvroDecodeSupport {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val byFingerprint: Map[Long, Schema] =
    schemaJsons.map { js =>
      val s = parseSchema(js)
      SchemaNormalization.parsingFingerprint64(s) -> s
    }.toMap

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      if (bytes.length < 10 || bytes(0) != 0xC3.toByte || bytes(1) != 0x01.toByte) return null
      val fp = ByteBuffer.wrap(bytes, 2, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
      byFingerprint.get(fp) match {
        case Some(schema) => recordToJson(decodeBinary(schema, bytes, 10))
        case None => null
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }
  override protected def withNewChildInternal(c: Expression): AvroSoeDecode = copy(child = c)
}

/** D4: Confluent-framed Avro: [0x00][4B BE schema id][binary body]; schemas
  * resolved through a [[SchemaSource]] — a pre-fetched id→schema map for
  * the oracle-gated path, or [[HttpSchemaSource]] against a live registry
  * (id→schema fetches are cached per executor; unresolvable ids null out
  * and the frame dead-letters). */
case class AvroRegistryDecode(child: Expression, schemas: SchemaSource)
    extends UnaryExpression with CodegenFallback with AvroDecodeSupport {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      if (bytes.length < 5 || bytes(0) != 0x00.toByte) return null
      val id = ByteBuffer.wrap(bytes, 1, 4).order(ByteOrder.BIG_ENDIAN).getInt
      schemas.schemaFor(id) match {
        case Some(js) => recordToJson(decodeBinary(parseSchema(js), bytes, 5))
        case None => null
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }
  override protected def withNewChildInternal(c: Expression): AvroRegistryDecode = copy(child = c)
}

/** D3: Confluent-framed JSON: strip the 5-byte header, body is JSON text. */
case class RegistryJsonStrip(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 5 || bytes(0) != 0x00.toByte) null
    else UTF8String.fromBytes(bytes, 5, bytes.length - 5)
  }
  override protected def withNewChildInternal(c: Expression): RegistryJsonStrip = copy(child = c)
}

/** Encoders used by tests and the verification queries to fabricate wire
  * payloads (roundtrip: encode → decode must be identity). */
case class AvroBinaryEncode(child: Expression, schemaJson: String, soeFraming: Boolean)
    extends UnaryExpression with CodegenFallback with AvroDecodeSupport {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    try {
      val schema = parseSchema(schemaJson)
      val json = input.asInstanceOf[UTF8String].toString
      val reader = new GenericDatumReader[AnyRef](schema)
      val jsonDec = DecoderFactory.get().jsonDecoder(schema, json)
      val datum = reader.read(null, jsonDec)
      val out = new java.io.ByteArrayOutputStream()
      if (soeFraming) {
        out.write(0xC3); out.write(0x01)
        val fp = SchemaNormalization.parsingFingerprint64(schema)
        val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(fp)
        out.write(bb.array())
      }
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      val writer = new GenericDatumWriter[AnyRef](schema)
      writer.write(datum, enc)
      enc.flush()
      out.toByteArray
    } catch { case scala.util.control.NonFatal(_) => null }
  }
  override protected def withNewChildInternal(c: Expression): AvroBinaryEncode = copy(child = c)
}

/** Avro object-container encode (single record per container, like the
  * reference's test fixtures). */
case class AvroContainerEncode(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback with AvroDecodeSupport {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    try {
      val schema = parseSchema(schemaJson)
      val json = input.asInstanceOf[UTF8String].toString
      val reader = new GenericDatumReader[AnyRef](schema)
      val datum = reader.read(null, DecoderFactory.get().jsonDecoder(schema, json))
      val out = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[AnyRef](new GenericDatumWriter[AnyRef](schema))
      w.create(schema, out)
      w.append(datum)
      w.close()
      out.toByteArray
    } catch { case scala.util.control.NonFatal(_) => null }
  }
  override protected def withNewChildInternal(c: Expression): AvroContainerEncode = copy(child = c)
}
