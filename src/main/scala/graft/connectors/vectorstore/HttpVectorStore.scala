package graft.connectors.vectorstore

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, InetSocketAddress, URI, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import scala.jdk.CollectionConverters._

/** HTTP transport for [[VectorStore]]: the seam's network face, proving
  * the DSv2 readers/writers, scroll paging, batch upserts, and
  * [[RetryingTransport]] all work across a REAL socket with REAL
  * (de)serialization — not just in-JVM method calls. The reference talks
  * to its backends over HTTP/gRPC clients (`adapters/qdrant.py:42-50`,
  * `adapters/milvus.py:22`); this is the same boundary, with the server
  * side doubling as a hermetic localhost backend for tests (the sandbox
  * has no external network).
  *
  * Wire shapes are Qdrant-REST-ish JSON:
  * {{{
  *   PUT    /collections/{name}           {distance, dim, vector_type, recreate, ...}
  *   GET    /collections/{name}           -> config | 404
  *   GET    /collections/{name}/count     -> {"count": n}
  *   POST   /collections/{name}/scroll    {"offset": o, "limit": n} -> {"points": [...]}
  *   PUT    /collections/{name}/points    {"points": [...]} -> {"upserted": n}
  *   DELETE /collections/{name}
  * }}}
  * A point is `{"id", "vector": [floats]|absent, "binary": base64|absent,
  * "metadata": {k: v|null}}` — binary vectors travel base64, like every
  * real JSON vector API.
  *
  * Error mapping is part of the contract: 404 → `NoSuchElementException`
  * (a missing collection is a logic error, which [[RetryingTransport]]
  * deliberately does NOT retry); 5xx / connect faults → `java.io.IOException`
  * (transient, retried).
  */
object HttpJson {
  val mapper = new ObjectMapper()

  def recordToJson(r: VSRecord): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", r.id)
    if (r.vector != null) {
      val a = o.putArray("vector")
      r.vector.foreach(a.add)
    }
    if (r.binary != null)
      o.put("binary", java.util.Base64.getEncoder.encodeToString(r.binary))
    val m = o.putObject("metadata")
    r.metadata.foreach { case (k, v) => if (v == null) m.putNull(k) else m.put(k, v) }
    o
  }

  def recordFromJson(n: JsonNode): VSRecord = {
    val vector =
      if (n.hasNonNull("vector")) {
        val a = n.get("vector").asInstanceOf[ArrayNode]
        Array.tabulate(a.size())(i => a.get(i).floatValue())
      } else null
    val binary =
      if (n.hasNonNull("binary")) java.util.Base64.getDecoder.decode(n.get("binary").asText())
      else null
    val metadata =
      if (n.hasNonNull("metadata"))
        n.get("metadata").properties().asScala
          .map(e => e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())).toMap
      else Map.empty[String, String]
    VSRecord(n.get("id").asText(), vector, metadata, binary)
  }

  def configToJson(c: CollectionConfig): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("distance", c.distance)
    o.put("dim", c.dim)
    o.put("on_disk", c.onDisk)
    o.put("vector_type", c.vectorType)
    val p = o.putObject("props")
    c.props.foreach { case (k, v) => p.put(k, v) }
    o
  }

  def configFromJson(n: JsonNode): CollectionConfig = CollectionConfig(
    distance = n.get("distance").asText(),
    dim = n.get("dim").asInt(),
    onDisk = n.get("on_disk").asBoolean(),
    props =
      if (n.hasNonNull("props"))
        n.get("props").properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      else Map.empty,
    vectorType =
      if (n.hasNonNull("vector_type")) n.get("vector_type").asText() else VectorTypes.Float)
}

/** Localhost HTTP server over any inner [[VectorStoreTransport]] — the
  * test double standing in for a real Qdrant/Milvus/Pinecone endpoint.
  * `failEveryNth > 0` makes every Nth request answer 503 BEFORE touching
  * the store (deterministic transient-fault injection for retry tests). */
class HttpVectorStoreServer(inner: VectorStoreTransport, port: Int = 0,
                            failEveryNth: Int = 0,
                            /** When set, requests must carry this key in
                              * the `api-key` header (Qdrant's scheme) or
                              * get 401 — lets tests assert the credential
                              * actually crosses the wire. */
                            apiKey: Option[String] = None,
                            /** `> 0`: every Nth request answers 429 before
                              * touching the store — deterministic
                              * rate-limit injection (the Pinecone failure
                              * mode) for end-to-end Retry-After tests. */
                            rateLimitEveryNth: Int = 0,
                            /** Sent as the 429's `Retry-After` header
                              * (RFC delta-seconds) when set. */
                            retryAfterSecs: Option[Int] = None) {
  import HttpJson._

  private val reqCount = new AtomicLong(0)
  /** Total requests served (including injected failures) — lets tests
    * assert how many wire calls a scan/write actually made. */
  def requests: Long = reqCount.get()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/collections", (ex: HttpExchange) => handle(ex))
  // daemon pool — same rationale as WireServers: gate-started servers must
  // not pin the JVM open after spark.stop()
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r); t.setDaemon(true); t
  })
  server.setExecutor(pool)
  server.start()

  val boundPort: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$boundPort"
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def readBody(ex: HttpExchange): JsonNode = {
    val in: InputStream = ex.getRequestBody
    val buf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var n = in.read(tmp)
    while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    if (buf.size() == 0) mapper.createObjectNode() else mapper.readTree(buf.toByteArray)
  }

  private def respond(ex: HttpExchange, code: Int, body: JsonNode): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(ex: HttpExchange, code: Int, msg: String): Unit = {
    val o = mapper.createObjectNode(); o.put("error", msg)
    respond(ex, code, o)
  }

  private def handle(ex: HttpExchange): Unit = try {
    val rc = reqCount.incrementAndGet()
    if (failEveryNth > 0 && rc % failEveryNth == 0)
      return err(ex, 503, "injected transient fault")
    if (rateLimitEveryNth > 0 && rc % rateLimitEveryNth == 0) {
      retryAfterSecs.foreach(s =>
        ex.getResponseHeaders.set("Retry-After", s.toString))
      return err(ex, 429, "injected rate limit")
    }
    apiKey.foreach { k =>
      if (Option(ex.getRequestHeaders.getFirst("api-key")).forall(_ != k))
        return err(ex, 401, "invalid or missing api-key")
    }
    // /collections/{name}[/verb]
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    if (parts.length < 2) {
      // GET /collections — enumerate (Qdrant's list-collections shape)
      if (ex.getRequestMethod == "GET") {
        val o = mapper.createObjectNode()
        val a = o.putArray("collections")
        inner.listCollections().foreach(a.add)
        return respond(ex, 200, o)
      }
      return err(ex, 400, "missing collection name")
    }
    val name = URLDecoder.decode(parts(1), UTF_8)
    val verb = if (parts.length > 2) parts(2) else ""
    val method = ex.getRequestMethod
    (method, verb) match {
      case ("PUT", "") =>
        val b = readBody(ex)
        inner.createCollection(name, configFromJson(b),
          recreate = b.hasNonNull("recreate") && b.get("recreate").asBoolean())
        respond(ex, 200, mapper.createObjectNode().put("ok", true))
      case ("GET", "") =>
        inner.describe(name) match {
          case Some(cfg) => respond(ex, 200, configToJson(cfg))
          case None => err(ex, 404, s"collection not found: $name")
        }
      case ("DELETE", "") =>
        inner.drop(name)
        respond(ex, 200, mapper.createObjectNode().put("ok", true))
      case ("GET", "count") =>
        respond(ex, 200, mapper.createObjectNode().put("count", inner.count(name)))
      case ("POST", "scroll") =>
        val b = readBody(ex)
        val recs = inner.scroll(name, b.get("offset").asInt(), b.get("limit").asInt())
        val o = mapper.createObjectNode()
        val a = o.putArray("points")
        recs.foreach(r => a.add(recordToJson(r)))
        respond(ex, 200, o)
      case ("PUT", "points") =>
        val pts = readBody(ex).get("points").asInstanceOf[ArrayNode]
        val recs = (0 until pts.size()).map(i => recordFromJson(pts.get(i)))
        val n = inner.upsert(name, recs)
        respond(ex, 200, mapper.createObjectNode().put("upserted", n))
      case ("POST", "points") if parts.length > 3 && parts(3) == "delete" =>
        // Qdrant's points-delete shape: POST …/points/delete {"points":[id,…]}
        val arr = readBody(ex).get("points").asInstanceOf[ArrayNode]
        val ids = (0 until arr.size()).map(i => arr.get(i).asText())
        val n = inner.delete(name, ids)
        respond(ex, 200, mapper.createObjectNode().put("deleted", n))
      case _ => err(ex, 400, s"unsupported: $method /$verb")
    }
  } catch {
    case _: NoSuchElementException =>
      err(ex, 404, "collection not found")
    case e: Throwable =>
      err(ex, 500, String.valueOf(e.getMessage))
  }
}

/** Client side: a [[VectorStoreTransport]] over HTTP. Serializable by
  * construction — the only state is the endpoint string, so executors can
  * each open their own connections (connections are per-request; the JDK
  * pools keep-alive sockets under the hood). */
class HttpTransport(baseUrl: String, connectTimeoutMs: Int = 2000,
                    readTimeoutMs: Int = 10000,
                    /** Sent as the `api-key` request header (Qdrant's auth
                      * scheme, `adapters/qdrant.py:42-50` passes the same
                      * credential to qdrant_client). Never logged. */
                    apiKey: Option[String] = None) extends VectorStoreTransport {
  import HttpJson._

  private def enc(name: String): String = URLEncoder.encode(name, UTF_8)

  private def request(method: String, path: String,
                      body: Option[JsonNode]): (Int, JsonNode, Option[Long]) = {
    val conn = new URI(s"$baseUrl$path").toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod(method)
    apiKey.foreach(k => conn.setRequestProperty("api-key", k))
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val bytes = mapper.writeValueAsBytes(b)
      conn.setFixedLengthStreamingMode(bytes.length)
      conn.getOutputStream.write(bytes)
    }
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text =
      if (stream == null) "{}"
      else new String(stream.readAllBytes(), UTF_8)
    // Retry-After is RFC delta-seconds; fractional accepted leniently
    val retryAfterMs = Option(conn.getHeaderField("Retry-After"))
      .flatMap(_.toDoubleOption).map(s => (s * 1000).toLong)
    conn.disconnect()
    (code,
      if (text.isEmpty) mapper.createObjectNode() else mapper.readTree(text),
      retryAfterMs)
  }

  private def call(method: String, path: String, body: Option[JsonNode] = None): JsonNode = {
    val (code, node, retryAfterMs) = request(method, path, body)
    if (code == 404)
      throw new NoSuchElementException(
        if (node.has("error")) node.get("error").asText() else s"not found: $path")
    if (code == 429)
      // typed, carrying the service's own pacing: the retry layer honors
      // Retry-After instead of its blind exponential schedule (same
      // mapping as WireClient — a 429 is not a fault to backoff through)
      throw new RateLimitedException(s"HTTP 429 on $method $path: " +
        (if (node.has("error")) node.get("error").asText() else node.toString),
        retryAfterMs)
    if (code >= 400)
      throw new java.io.IOException(s"HTTP $code on $method $path: " +
        (if (node.has("error")) node.get("error").asText() else node.toString))
    node
  }

  override def createCollection(name: String, config: CollectionConfig,
                                recreate: Boolean): Unit = {
    val b = configToJson(config)
    b.put("recreate", recreate)
    call("PUT", s"/collections/${enc(name)}", Some(b))
  }

  override def exists(name: String): Boolean =
    try { call("GET", s"/collections/${enc(name)}"); true }
    catch { case _: NoSuchElementException => false }

  override def describe(name: String): Option[CollectionConfig] =
    try Some(configFromJson(call("GET", s"/collections/${enc(name)}")))
    catch { case _: NoSuchElementException => None }

  override def scroll(name: String, fromIdx: Int, pageSize: Int): Seq[VSRecord] = {
    val b = mapper.createObjectNode()
    b.put("offset", fromIdx)
    b.put("limit", pageSize)
    val pts = call("POST", s"/collections/${enc(name)}/scroll", Some(b))
      .get("points").asInstanceOf[ArrayNode]
    (0 until pts.size()).map(i => recordFromJson(pts.get(i)))
  }

  override def count(name: String): Int =
    call("GET", s"/collections/${enc(name)}/count").get("count").asInt()

  override def upsert(name: String, records: Seq[VSRecord]): Int = {
    val b = mapper.createObjectNode()
    val a = b.putArray("points")
    records.foreach(r => a.add(recordToJson(r)))
    call("PUT", s"/collections/${enc(name)}/points", Some(b)).get("upserted").asInt()
  }

  override def delete(name: String, ids: Seq[String]): Int = {
    val b = mapper.createObjectNode()
    val a = b.putArray("points")
    ids.foreach(a.add)
    call("POST", s"/collections/${enc(name)}/points/delete", Some(b)).get("deleted").asInt()
  }

  override def drop(name: String): Unit = call("DELETE", s"/collections/${enc(name)}")

  override def listCollections(): Seq[String] = {
    val a = call("GET", "/collections").get("collections").asInstanceOf[ArrayNode]
    (0 until a.size()).map(i => a.get(i).asText())
  }
}

object HttpTransport {
  /** The wire client for an endpoint spec — each backend speaks its own
    * REST dialect (see [[QdrantWireTransport]]/[[MilvusWireTransport]]/
    * [[PineconeWireTransport]]); unknown backends fall back to the
    * generic JSON transport. */
  def forSpec(spec: TransportSpec): VectorStoreTransport = {
    val strip = spec.reservedKeys == "strip"
    spec.backend match {
      case "qdrant" => new QdrantWireTransport(spec.url.get, spec.apiKey, strip)
      case "milvus" => new MilvusWireTransport(spec.url.get, spec.apiKey)
      case "pinecone" => new PineconeWireTransport(spec.url.get, spec.apiKey, strip)
      case _ => new HttpTransport(spec.url.get, apiKey = spec.apiKey)
    }
  }
}
