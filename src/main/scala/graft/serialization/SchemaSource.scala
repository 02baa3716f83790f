package graft.serialization

import java.net.{HttpURLConnection, InetSocketAddress, Proxy, URI}
import java.nio.charset.StandardCharsets
import java.util.Base64

/** Where Confluent-framed decoders resolve schema id → Avro schema JSON.
  *
  * The reference resolves ids from a live schema-registry URL configured at
  * startup (/root/reference/src/serialization.rs:74-96: trailing-slash trim,
  * SCHEMA_REGISTRY_USERNAME/PASSWORD basic auth, SCHEMA_REGISTRY_PROXY);
  * this trait is that seam. [[MapSchemaSource]] is the pre-resolved form
  * every oracle-gated query uses (deterministic, no egress);
  * [[HttpSchemaSource]] is the live-registry form.
  *
  * Implementations are shipped to executors inside decode expressions, so
  * they must be Serializable and resolve lazily (one fetch per id per
  * executor, cached for the life of the process — schema ids are immutable
  * in a Confluent registry, so the cache never invalidates).
  */
trait SchemaSource extends Serializable {
  /** Schema JSON for a registry id; None if unknown (row dead-letters). */
  def schemaFor(id: Int): Option[String]
}

/** Pre-resolved id → schema map (the no-egress stand-in). */
final case class MapSchemaSource(byId: Map[Int, String]) extends SchemaSource {
  override def schemaFor(id: Int): Option[String] = byId.get(id)
}

/** Live Confluent registry client over `GET {base}/schemas/ids/{id}`.
  *
  * Parity with the reference's SrSettings build
  * (/root/reference/src/serialization.rs:74-96):
  *   - a trailing '/' on the registry URL is trimmed;
  *   - SCHEMA_REGISTRY_USERNAME (+ optional SCHEMA_REGISTRY_PASSWORD) env
  *     vars become a basic-auth header;
  *   - SCHEMA_REGISTRY_PROXY env var routes requests through an HTTP proxy.
  * Env vars are read AT CONSTRUCTION (driver side, like the reference's
  * process startup) and carried as fields so executors authenticate
  * identically without needing the env replicated.
  *
  * Fetches are cached per id in a transient map (rebuilt per executor, at
  * most one request per id per JVM). Registry errors surface as None — the
  * frame dead-letters like an unknown id rather than failing the batch;
  * a registry outage therefore degrades to DLQ traffic, not a crashed
  * stream (matching the reference's per-message deserialize error path).
  */
final case class HttpSchemaSource(
    registryUrl: String,
    username: Option[String] = sys.env.get("SCHEMA_REGISTRY_USERNAME"),
    password: Option[String] = sys.env.get("SCHEMA_REGISTRY_PASSWORD"),
    proxyUrl: Option[String] = sys.env.get("SCHEMA_REGISTRY_PROXY"),
    connectTimeoutMs: Int = 30000,
    readTimeoutMs: Int = 30000) extends SchemaSource {

  private val base = if (registryUrl.endsWith("/")) registryUrl.dropRight(1) else registryUrl

  /** Basic-auth header value; reference semantics: username alone is valid
    * (password empty), password without username sends no auth at all. */
  private[serialization] def authHeader: Option[String] = username.map { u =>
    val token = u + ":" + password.getOrElse("")
    "Basic " + Base64.getEncoder.encodeToString(token.getBytes(StandardCharsets.UTF_8))
  }

  // Misconfiguration must fail at CONSTRUCTION (the reference's SrSettings
  // build fails at startup), not as silent per-message dead-letters: a
  // schemeless proxy like "proxy.corp:3128" URI-parses with a null host.
  private val proxyHostPort: Option[(String, Int)] = proxyUrl.map { p =>
    val u = URI.create(p)
    require(u.getHost != null,
      s"SCHEMA_REGISTRY_PROXY '$p' has no parseable host — use an explicit " +
        "scheme, e.g. http://proxy.corp:3128")
    (u.getHost, if (u.getPort >= 0) u.getPort else 80)
  }

  /** Only SUCCESSFUL lookups and definitive not-founds (404) are cached; a
    * transient registry failure (timeout, 5xx, connection refused) is
    * retried on the next message for that id, so an outage degrades to DLQ
    * traffic while it lasts instead of poisoning the id for the life of
    * the executor. */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Option[String]]()

  @transient private lazy val proxy: Proxy = proxyHostPort match {
    case Some((h, p)) => new Proxy(Proxy.Type.HTTP, new InetSocketAddress(h, p))
    case None => Proxy.NO_PROXY
  }

  override def schemaFor(id: Int): Option[String] = {
    val hit = cache.get(id)
    if (hit != null) hit
    else fetch(id) match {
      case Right(resolved) =>
        cache.putIfAbsent(id, resolved)
        resolved
      case Left(_) => None // transient — do NOT cache
    }
  }

  /** Right(Some) = resolved, Right(None) = definitive 404, Left = transient. */
  private def fetch(id: Int): Either[Throwable, Option[String]] = {
    try {
      val conn = URI.create(s"$base/schemas/ids/$id").toURL
        .openConnection(proxy).asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept", "application/vnd.schemaregistry.v1+json")
      authHeader.foreach(conn.setRequestProperty("Authorization", _))
      try {
        conn.getResponseCode match {
          case 200 =>
            val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
            // response envelope: {"schema": "<escaped schema json>"}
            val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
            Right(Option(node.get("schema")).map(_.asText()))
          case 404 => Right(None)
          case _ => Left(new java.io.IOException(s"registry returned ${conn.getResponseCode}"))
        }
      } finally conn.disconnect()
    } catch { case scala.util.control.NonFatal(e) => Left(e) }
  }
}
