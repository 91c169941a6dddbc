package graft.connectors.vectorstore

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-shape contract for the wire response parsers: an endpoint that
  * ANSWERS, but not in the documented shape (proxy error page, API-version
  * drift, truncated envelope), must surface as a typed
  * [[WireShapeException]] naming the backend, the verb, and the missing
  * path — never as a context-free NullPointerException /
  * ClassCastException inside schema inference, and never silently as
  * `describe -> None` (absent collection ≠ wrong protocol). Also pins that
  * the retry layer does NOT burn attempts on a shape mismatch (it is
  * deterministic — the retry would replay the same wrong shape). */
class WireShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  /** Canned-JSON server: answers every request with `body` (status 200),
    * unless a `perPath` entry matches the request path — first matching
    * substring wins. Per-path bodies are what lets the mixed-sequence
    * fuzz serve a WELL-FORMED response on one verb of a multi-verb flow
    * and a hostile one on the next (the Pinecone count path takes two
    * different verbs; one global body could never reach the second). */
  private class StubServer {
    @volatile var body: String = "{}"
    @volatile var perPath: Seq[(String, String)] = Nil
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      requests.incrementAndGet()
      ex.getRequestBody.readAllBytes()
      val path = ex.getRequestURI.getPath
      val chosen = perPath.find { case (sub, _) => path.contains(sub) }
        .map(_._2).getOrElse(body)
      val bytes = chosen.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.setExecutor(null)
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private val stub = new StubServer
  override def afterAll(): Unit = stub.stop()

  private def shapeError(f: => Any): WireShapeException = {
    val e = intercept[WireShapeException](f)
    e
  }

  private def withBody[A](body: String)(f: => A): A = {
    stub.perPath = Nil
    stub.body = body
    f
  }

  // ------------------------------------------------------------- qdrant

  private val qdrant = new QdrantWireTransport(stub.url)

  test("qdrant describe: hostile shapes raise typed errors naming the path") {
    for (body <- Seq("{}", """{"result": null}""", """{"status":"ok"}""",
      """{"result": {"config": {}}}""",
      """{"result": {"config": {"params": {}}}}""")) {
      val e = withBody(body)(shapeError(qdrant.describe("c")))
      assert(e.getMessage.contains("unexpected describe response from qdrant"), e.getMessage)
      assert(e.getMessage.contains("missing 'result"), e.getMessage)
    }
    // the walk names the FULL path down to the first missing step
    val eFull = withBody("""{"result": {"config": {"params": {}}}}""")(
      shapeError(qdrant.describe("c")))
    assert(eFull.getMessage.contains("result.config.params.vectors"), eFull.getMessage)
    // present envelope, wrong FIELD types
    val e2 = withBody(
      """{"result":{"config":{"params":{"vectors":{"distance":{},"size":2}}}}}""")(
      shapeError(qdrant.describe("c")))
    assert(e2.getMessage.contains("distance"), e2.getMessage)
    val e3 = withBody(
      """{"result":{"config":{"params":{"vectors":{"distance":"Cosine","size":"x"}}}}}""")(
      shapeError(qdrant.describe("c")))
    assert(e3.getMessage.contains("size"), e3.getMessage)
    // FRACTIONAL numbers reject like non-numbers — a drifted endpoint's
    // "size": 2.5 must not silently truncate into a wrong dim
    val e4 = withBody(
      """{"result":{"config":{"params":{"vectors":{"distance":"Cosine","size":2.5}}}}}""")(
      shapeError(qdrant.describe("c")))
    assert(e4.getMessage.contains("size") && e4.getMessage.contains("integer"), e4.getMessage)
    // …while integral floats pass (2.0 is a lossless int)
    val ok = withBody(
      """{"result":{"config":{"params":{"vectors":{"distance":"Cosine","size":2.0}}}}}""")(
      qdrant.describe("c"))
    assert(ok.exists(_.dim == 2))
  }

  test("qdrant count/scroll/aliases: hostile shapes raise typed errors") {
    val e = withBody("""{"result": {}}""")(shapeError(qdrant.count("c")))
    assert(e.getMessage.contains("count response from qdrant"), e.getMessage)
    val e2 = withBody("""{"result": {"points": "nope"}}""")(
      shapeError(qdrant.scrollPage("c", None, 10)))
    assert(e2.getMessage.contains("points"), e2.getMessage)
    // drop() consults the alias map first — a half-shaped alias entry
    // names the missing element field, not a bare NPE
    val e3 = withBody("""{"result": {"aliases": [{"alias_name": "a"}]}}""")(
      shapeError(qdrant.drop("x")))
    assert(e3.getMessage.contains("collection_name"), e3.getMessage)
  }

  // ------------------------------------------------------------- milvus

  private val milvus = new MilvusWireTransport(stub.url)

  test("milvus describe/count/query: hostile shapes raise typed errors") {
    val e = withBody("""{"code": 0}""")(shapeError(milvus.describe("c")))
    assert(e.getMessage.contains("unexpected describe response from milvus"), e.getMessage)
    assert(e.getMessage.contains("'data'"), e.getMessage)
    val e2 = withBody("""{"code":0,"data":{}}""")(
      shapeError(milvus.countFiltered("c", None)))
    assert(e2.getMessage.contains("count response from milvus"), e2.getMessage)
    val e3 = withBody("""{"code":0,"data":[]}""")(
      shapeError(milvus.countFiltered("c", None)))
    assert(e3.getMessage.contains("count(*)"), e3.getMessage)
    val e4 = withBody("""{"code":0,"data":[{"count(*)":"x"}]}""")(
      shapeError(milvus.countFiltered("c", None)))
    assert(e4.getMessage.contains("count(*)"), e4.getMessage)
    val e5 = withBody("""{"code":0,"data":{"rows":[]}}""")(
      shapeError(milvus.scroll("c", 0, 10)))
    assert(e5.getMessage.contains("not an array"), e5.getMessage)
  }

  // ----------------------------------------------------------- pinecone

  private val pinecone = new PineconeWireTransport(stub.url)

  test("pinecone describe/stats/list: hostile shapes raise typed errors") {
    val e = withBody("{}")(shapeError(pinecone.describe("ix")))
    assert(e.getMessage.contains("unexpected describe response from pinecone"), e.getMessage)
    assert(e.getMessage.contains("metric"), e.getMessage)
    val e2 = withBody("""{"metric":"cosine"}""")(shapeError(pinecone.describe("ix")))
    assert(e2.getMessage.contains("dimension"), e2.getMessage)
    val e3 = withBody("""{"metric":"cosine","dimension":"abc"}""")(
      shapeError(pinecone.describe("ix")))
    assert(e3.getMessage.contains("dimension"), e3.getMessage)
    val e4 = withBody("""{"namespaces":{"ns":{"count":3}}}""")(
      shapeError(pinecone.count("ix")))
    assert(e4.getMessage.contains("stats response from pinecone") &&
      e4.getMessage.contains("vectorCount"), e4.getMessage)
    val e5 = withBody("""{"indexes":[{"no_name":true}]}""")(
      shapeError(pinecone.listCollections()))
    assert(e5.getMessage.contains("name"), e5.getMessage)
  }

  // ------------------------------------------------- retry + None contract

  test("shape mismatch is NOT retried and NOT swallowed into describe=None") {
    val retrying = RetryingTransport(new QdrantWireTransport(stub.url), maxAttempts = 3)
    stub.body = """{"result": {"config": {}}}"""
    stub.requests.set(0)
    intercept[WireShapeException](retrying.describe("c"))
    assert(stub.requests.get() == 1,
      s"shape mismatch burned ${stub.requests.get()} attempts — deterministic " +
        "protocol errors must not be retried")
  }

  // ------------------------------------- generative: no NPE/CCE, anywhere

  /** Random JSON of bounded depth: the fuzz face of the contract — ANY
    * response shape must parse, raise a typed wire error, or raise the
    * backend's own documented error class; never NPE/CCE. */
  private def randNode(rnd: scala.util.Random, depth: Int): com.fasterxml.jackson.databind.JsonNode = {
    val mapper = WireJson.mapper
    val pick = if (depth <= 0) rnd.nextInt(4) else rnd.nextInt(6)
    pick match {
      case 0 => mapper.getNodeFactory.textNode(rnd.alphanumeric.take(4).mkString)
      case 1 => mapper.getNodeFactory.numberNode(rnd.nextInt(1000) - 500)
      case 2 => mapper.getNodeFactory.booleanNode(rnd.nextBoolean())
      case 3 => mapper.getNodeFactory.nullNode()
      case 4 =>
        val o = mapper.createObjectNode()
        // bias keys toward the REAL envelope fields so the walk gets deep
        val keys = Seq("result", "config", "params", "vectors", "data",
          "matches", "points", "namespaces", "indexes", "metric", "dimension",
          "distance", "size", "count", "id", "name", "vectorCount", "count(*)",
          "aliases", "alias_name", "collection_name", "aliasName", "collectionName")
        (0 until rnd.nextInt(4)).foreach { _ =>
          o.set[com.fasterxml.jackson.databind.JsonNode](
            keys(rnd.nextInt(keys.length)), randNode(rnd, depth - 1))
        }
        o
      case _ =>
        val a = mapper.createArrayNode()
        (0 until rnd.nextInt(3)).foreach(_ => a.add(randNode(rnd, depth - 1)))
        a
    }
  }

  test("arbitrary response shapes never surface as NPE/CCE (all dialects)") {
    val rnd = new scala.util.Random(20260816L)
    val mapper = WireJson.mapper
    val rec = VSRecord("1", Array(1f, 2f), Map("k" -> "v"))
    val probes: Seq[(String, VectorStoreTransport => Any)] = Seq(
      ("describe", _.describe("c")),
      ("count", _.count("c")),
      ("scroll", _.scroll("c", 0, 5)),
      ("list", _.listCollections()),
      ("upsert", _.upsert("c", Seq(rec))),
      ("delete", _.delete("c", Seq("1"))),
      ("search", _.nativeSearch("c", SearchSpec(Array(1f, 2f), 3), None)),
      ("exists", _.exists("c")))
    val transports = Seq("qdrant" -> qdrant, "milvus" -> milvus, "pinecone" -> pinecone)
    for (_ <- 1 to 120) {
      stub.perPath = Nil
      stub.body = mapper.writeValueAsString(randNode(rnd, 4))
      for ((backend, t) <- transports; (verb, probe) <- probes) {
        try { probe(t); () } catch {
          case _: WireShapeException => () // the typed contract
          case _: NoSuchElementException => () // backend's documented 404 class
          case _: java.io.IOException => () // backend's documented error code class
          case _: IllegalArgumentException => () // value-level parse rejection
          case e @ (_: NullPointerException | _: ClassCastException) =>
            fail(s"$backend $verb NPE/CCE on hostile shape ${stub.body}: $e")
        }
      }
    }
  }

  /** Mixed-shape sequences: multi-verb flows (the Pinecone count path
    * takes a pointer fetch + a stats POST; Qdrant drop consults the alias
    * map before DELETE; Milvus drop/list walk aliases/list +
    * aliases/describe) where every verb answers WELL-FORMED except one,
    * randomly corrupted — the flow must traverse past the good verbs and
    * still fail TYPED on the hostile one, never NPE/CCE. */
  test("mixed-shape sequences: one hostile verb inside a well-formed flow") {
    val rnd = new scala.util.Random(20260817L)
    val mapper = WireJson.mapper
    val wellFormed: Map[String, Seq[(String, String)]] = Map(
      "qdrant" -> Seq(
        "/collections/aliases" -> """{"result": true}""",
        "/points/count" -> """{"result":{"count":1}}""",
        "/points/scroll" -> """{"result":{"points":[],"next_page_offset":null}}""",
        "/aliases" -> """{"result":{"aliases":[{"alias_name":"a","collection_name":"g"}]}}""",
        "/collections/g" ->
          """{"result":{"config":{"params":{"vectors":{"distance":"Cosine","size":2}}},"points_count":1}}""",
        "/collections" -> """{"result":{"collections":[{"name":"g"}]}}"""),
      "milvus" -> Seq(
        "aliases/list" -> """{"code":0,"data":["a"]}""",
        "aliases/describe" -> """{"code":0,"data":{"aliasName":"a","collectionName":"g"}}""",
        "collections/list" -> """{"code":0,"data":["g"]}""",
        "collections/describe" ->
          """{"code":0,"data":{"collectionName":"g","fields":[{"name":"vector","type":"FloatVector","params":[{"key":"dim","value":"2"}]}],"indexes":[{"metricType":"COSINE"}]}}""",
        "entities/query" -> """{"code":0,"data":[{"count(*)":2}]}""",
        "collections/" -> """{"code":0,"data":{}}"""),
      "pinecone" -> Seq(
        "/describe_index_stats" ->
          """{"namespaces":{"ns":{"vectorCount":3}},"totalVectorCount":3}""",
        "/vectors/fetch" -> """{"vectors":{}}""",
        "/vectors/list" -> """{"vectors":[]}""",
        "/vectors/upsert" -> """{"upsertedCount":1}""",
        "/vectors/delete" -> """{}""",
        "/indexes/" -> """{"metric":"cosine","dimension":2}""",
        "/indexes" -> """{"indexes":[{"name":"ix"}]}"""))
    // flows that take MORE than one verb on the wire
    val flows: Seq[(String, VectorStoreTransport => Any)] = Seq(
      ("count", _.count("ix::ns")),
      ("exists", _.exists("ix::ns")),
      ("scroll", _.scroll("ix::ns", 0, 5)),
      ("list", _.listCollections()),
      ("drop", _.drop("a")),
      ("describe", _.describe("g")))
    val transports = Seq("qdrant" -> qdrant, "milvus" -> milvus, "pinecone" -> pinecone)
    for (round <- 1 to 60) {
      for ((backend, t) <- transports) {
        val canned = wellFormed(backend)
        // corrupt ONE randomly-chosen verb; the rest stay well-formed
        val victim = rnd.nextInt(canned.length)
        val hostile = mapper.writeValueAsString(randNode(rnd, 3))
        stub.perPath = canned.updated(victim, (canned(victim)._1, hostile))
        stub.body = hostile
        for ((verb, flow) <- flows) {
          try { flow(t); () } catch {
            case _: WireShapeException => ()
            case _: NoSuchElementException => ()
            case _: java.io.IOException => ()
            case _: IllegalArgumentException => ()
            case e @ (_: NullPointerException | _: ClassCastException) =>
              fail(s"$backend $verb NPE/CCE in round $round (victim " +
                s"${canned(victim)._1} -> $hostile): $e")
          }
        }
      }
    }
    stub.perPath = Nil
  }
}
