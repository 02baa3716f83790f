package graft.serialization

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Registry client against a stub Confluent endpoint (JDK HttpServer — no
  * egress): fetch path + response-envelope parse, per-id caching, auth
  * header assembly mirroring the reference's SrSettings build
  * (/root/reference/src/serialization.rs:74-96), and error → None (frame
  * dead-letters rather than batch abort). */
class SchemaSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"M","fields":[{"name":"id","type":"long"}]}"""

  /** Stub registry serving /schemas/ids/42; counts hits, records auth. */
  private def withStubRegistry[A](f: (String, AtomicInteger, () => Option[String]) => A): A = {
    val hits = new AtomicInteger(0)
    @volatile var lastAuth: Option[String] = None
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/", { (ex: HttpExchange) =>
      lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val id = ex.getRequestURI.getPath.stripPrefix("/schemas/ids/")
      if (id == "42") {
        hits.incrementAndGet()
        // Confluent envelope: the schema arrives as an escaped JSON string
        val env = new com.fasterxml.jackson.databind.ObjectMapper().createObjectNode()
        env.put("schema", schemaJson)
        val body = env.toString.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
      } else {
        ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", hits, () => lastAuth)
    finally server.stop(0)
  }

  test("fetches and parses the Confluent envelope; unknown id is None") {
    withStubRegistry { (url, _, _) =>
      val src = HttpSchemaSource(url, username = None, password = None, proxyUrl = None)
      assert(src.schemaFor(42) === Some(schemaJson))
      assert(src.schemaFor(99) === None)
    }
  }

  test("caches per id: many lookups, one request; trailing slash trimmed") {
    withStubRegistry { (url, hits, _) =>
      val src = HttpSchemaSource(url + "/", username = None, password = None, proxyUrl = None)
      (1 to 5).foreach(_ => assert(src.schemaFor(42).isDefined))
      assert(hits.get() === 1)
    }
  }

  test("basic-auth parity with the reference: username alone OK, password needs username") {
    withStubRegistry { (url, _, lastAuth) =>
      val both = HttpSchemaSource(url, username = Some("u"), password = Some("p"), proxyUrl = None)
      assert(both.schemaFor(42).isDefined)
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString("u:p".getBytes(StandardCharsets.UTF_8))
      assert(lastAuth() === Some(expected))

      // username without password authenticates with an empty password
      val userOnly = HttpSchemaSource(url, username = Some("u"), password = None, proxyUrl = None)
      assert(userOnly.authHeader === Some("Basic " + java.util.Base64.getEncoder
        .encodeToString("u:".getBytes(StandardCharsets.UTF_8))))

      // password without username sends no auth at all (reference reads
      // the password only inside the username branch)
      val passOnly = HttpSchemaSource(url, username = None, password = Some("p"), proxyUrl = None)
      assert(passOnly.authHeader === None)
      assert(passOnly.schemaFor(42).isDefined)
      assert(lastAuth() === None)
    }
  }

  test("registry errors degrade to None (dead-letter), not exceptions") {
    // nothing listening on this port
    val src = HttpSchemaSource("http://127.0.0.1:1", username = None,
      password = None, proxyUrl = None, connectTimeoutMs = 200, readTimeoutMs = 200)
    assert(src.schemaFor(1) === None)
  }

  test("transient failures are retried (not cached); 404s are cached as definitive") {
    @volatile var failFirst = true
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/", { (ex: HttpExchange) =>
      hits.incrementAndGet()
      val id = ex.getRequestURI.getPath.stripPrefix("/schemas/ids/")
      if (failFirst) { failFirst = false; ex.sendResponseHeaders(503, -1) }
      else if (id == "42") {
        val env = new com.fasterxml.jackson.databind.ObjectMapper().createObjectNode()
        env.put("schema", schemaJson)
        val body = env.toString.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
      } else ex.sendResponseHeaders(404, -1)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val src = HttpSchemaSource(url, username = None, password = None, proxyUrl = None)
      // 503 → None but NOT cached: the registry blip heals on the next call
      assert(src.schemaFor(42) === None)
      assert(src.schemaFor(42) === Some(schemaJson))
      assert(hits.get() === 2)
      // definitive 404 IS cached: one request total for an unknown id
      assert(src.schemaFor(99) === None)
      assert(src.schemaFor(99) === None)
      assert(hits.get() === 3)
    } finally server.stop(0)
  }

  test("a schemeless proxy URL fails at construction, not as silent dead-letters") {
    val e = intercept[IllegalArgumentException](
      HttpSchemaSource("http://r", username = None, password = None,
        proxyUrl = Some("proxy.corp:3128")))
    assert(e.getMessage.contains("SCHEMA_REGISTRY_PROXY"))
    // a well-formed proxy URL constructs fine
    HttpSchemaSource("http://r", username = None, password = None,
      proxyUrl = Some("http://proxy.corp:3128")): Unit
  }

  test("end-to-end: AvroRegistryDecode resolves schemas through the live source") {
    withStubRegistry { (url, _, _) =>
      val src = HttpSchemaSource(url, username = None, password = None, proxyUrl = None)
      val json = """{"id":3}"""
      val body = Seq(json).toDF("j")
        .select(Decoders.avroEncode(col("j"), schemaJson, soe = false).as("b"))
        .head().getAs[Array[Byte]]("b")
      val framed = Array[Byte](0, 0, 0, 0, 42) ++ body
      val unknownId = Array[Byte](0, 0, 0, 0, 99) ++ body
      val r = Seq(1).toDF("x").select(
        Decoders.avroRegistry(lit(framed), src).as("ok"),
        Decoders.avroRegistry(lit(unknownId), src).as("unknown")).head()
      assert(graft.delta.Actions.mapper.readTree(r.getString(0)).get("id").asLong() === 3L)
      assert(r.isNullAt(1))
    }
  }
}
