package graft.connectors.vectorstore

import graft.SparkSpec
import graft.model.Canonical
import java.nio.file.Files

/** Pinecone atomic publish via the engine-maintained NAMESPACE POINTER —
  * the alias-swap analog for a wire with no rename and no alias verb
  * (cf. `/root/reference` pinecone adapter: an empty module; the public
  * API surface is index/namespace/vector CRUD only). The shadow is a
  * namespace of the target's own index, publish is ONE pointer upsert,
  * and the retiring generation is deleted afterwards — replacing the
  * 2×-write drop-before-copy fallback whose crash window BASELINE.md
  * priced at 78.8 s / 200k rows at 10 ms RTT. */
class PineconePublishSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: String, tag: String) =
    VSRecord(id, Array(id.hashCode.toFloat % 7, 1f), Map("v" -> tag))

  /** Raw (pointer-blind) row count of a namespace in the loopback's inner
    * store — deleteAll drops the inner collection, so absent == retired. */
  private def rawRows(inner: InMemoryStore, name: String): Int =
    if (inner.exists(name)) inner.scroll(name, 0, 1000).size else 0

  test("atomic publish = pointer flip on the wire, generations retired") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      // live target serving old data in the LITERAL namespace
      t.createCollection("ix::pub", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert("ix::pub", Seq(rec("1", "old")))
      // generation 1 shadow (a namespace of the same index) -> publish
      val sh1 = t.stagingName("ix::pub")
      assert(sh1.startsWith("ix::pub__staging_"), sh1)
      t.createCollection(sh1, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(sh1, Seq(rec("1", "g1"), rec("2", "g1")))
      t.rename(sh1, "ix::pub")
      assert(t.count("ix::pub") == 2)
      assert(t.scroll("ix::pub", 0, 10).forall(_.metadata("v") == "g1"))
      // the pointer record rode the documented upsert verb into __graft_meta
      assert(server.bodiesOf("POST /vectors/upsert").exists(_.contains("__graft_ptr::pub")))
      // literal-namespace rows were retired at publish
      assert(rawRows(inner, "ix::pub") == 0)
      // catalog shows the published name, never generation or meta plumbing
      assert(t.listCollections() == Seq("ix::pub"), t.listCollections().toString)

      // generation 2: publish again, generation 1 retired
      val sh2 = t.stagingName("ix::pub")
      t.createCollection(sh2, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(sh2, Seq(rec("3", "g2")))
      t.rename(sh2, "ix::pub")
      assert(t.count("ix::pub") == 1)
      assert(t.scroll("ix::pub", 0, 10).head.metadata("v") == "g2")
      assert(rawRows(inner, sh1) == 0, "generation 1 must be retired")
      assert(t.listCollections() == Seq("ix::pub"))

      // retried publish (lost response) converges, no data loss
      t.rename(sh2, "ix::pub")
      assert(t.count("ix::pub") == 1)
      assert(t.scroll("ix::pub", 0, 10).head.metadata("v") == "g2")

      // non-atomic writes to the logical name land in the LIVE generation
      t.upsert("ix::pub", Seq(rec("4", "patch")))
      assert(t.count("ix::pub") == 2)

      // dropping the published name removes pointer AND generation; the
      // INDEX itself remains (bare), like dropping one namespace always did
      t.drop("ix::pub")
      assert(!t.exists("ix::pub"))
      assert(t.listCollections() == Seq("ix"), t.listCollections().toString)
    } finally server.stop()
  }

  test("publish cost is O(1) verbs at any size — no per-row copy traffic") {
    val server = new PineconeWireServer(new InMemoryStore)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("big::ns", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert("big::ns", (0 until 500).map(i => rec(s"o$i", "old")))
      val sh = t.stagingName("big::ns")
      t.createCollection(sh, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      (0 until 500).grouped(100).foreach(g =>
        t.upsert(sh, g.map(i => rec(s"n$i", "new"))))
      val before = server.requests
      t.rename(sh, "big::ns")
      val delta = server.requests - before
      // pointer fetch + stats + describe + 2 pointer upserts + 1 deleteAll:
      // a fixed handful, where the copy fallback paid >= 2*ceil(500/100)
      // scroll+upsert pages AND a drop-before-copy crash window
      assert(delta <= 8, s"publish issued $delta wire calls — not O(1)")
      val lines = server.requestLines.drop(before.toInt)
      assert(!lines.exists(_.startsWith("GET /vectors/list")),
        s"publish scanned the shadow — copy fallback still in play: $lines")
      assert(t.count("big::ns") == 500)
      assert(t.scroll("big::ns", 0, 1).head.metadata("v") == "new")
    } finally server.stop()
  }

  test("crash before the flip leaves the old target serving, untouched") {
    val server = new PineconeWireServer(new InMemoryStore)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("cw::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert("cw::t", Seq(rec("1", "old"), rec("2", "old")))
      val sh = t.stagingName("cw::t")
      t.createCollection(sh, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(sh, Seq(rec("9", "new")))
      // ... job dies here: no rename. Readers see exactly the old rows.
      assert(t.count("cw::t") == 2)
      assert(t.scroll("cw::t", 0, 10).forall(_.metadata("v") == "old"))
    } finally server.stop()
  }

  test("crash between flip and retire: readers serve the new generation; retry finishes") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("cr::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert("cr::t", Seq(rec("1", "old")))
      val sh = "cr::t__staging_gen1"
      t.createCollection(sh, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(sh, Seq(rec("2", "new"), rec("3", "new")))
      // the flip applied but the process died before the retire leg:
      // pointer carries target + prev, old rows still physically present
      t.upsert("cr::__graft_meta", Seq(VSRecord("__graft_ptr::t", Array(1f, 1f),
        Map("target" -> "t__staging_gen1", "prev" -> "t"))))
      assert(inner.count("cr::t") == 1, "old generation rows still on disk")
      // READERS already resolve to the new generation — publish is atomic.
      // (A fresh client, like any reader arriving after the crash: the
      // writer that died holds no cache, and a surviving client's pointer
      // cache re-reads the wire within its 2 s TTL.)
      val reader = new PineconeWireTransport(server.url)
      assert(reader.count("cr::t") == 2)
      assert(reader.scroll("cr::t", 0, 10).forall(_.metadata("v") == "new"))
      // a retried publish is a no-op flip that FINISHES the retire from `prev`
      t.rename(sh, "cr::t")
      assert(rawRows(inner, "cr::t") == 0, "retry must retire the old rows")
      assert(t.count("cr::t") == 2)
      assert(t.scroll("cr::t", 0, 10).forall(_.metadata("v") == "new"))
      assert(reader.count("cr::t") == 2)
    } finally server.stop()
  }

  test("DSv2 atomic overwrite rides the pointer flip — bare index AND namespace targets") {
    val server = new PineconeWireServer(new InMemoryStore)
    val t = new PineconeWireTransport(server.url)
    try {
      val df = Seq(
        ("a", Seq(1f, 0f), Map("k" -> "1")),
        ("b", Seq(0f, 1f), Map("k" -> "2")))
        .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
      // bare-index target: shadow must be a NAMESPACE (ix::__staging_*),
      // never a sibling index paying provisioning latency + copy publish
      df.write.format("graft-pinecone").option("url", server.url)
        .option("collection", "aw").option("atomic", "true").option("dim", "2")
        .mode("overwrite").save()
      assert(t.count("aw") == 2)
      val ixs = WireJson.mapper.readTree(
        java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"${server.url}/indexes")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).body())
        .get("indexes")
      assert((0 until ixs.size()).map(ixs.get(_).get("name").asText()) == Seq("aw"),
        "atomic write created a sibling index — namespace staging regressed")
      assert(server.bodiesOf("POST /vectors/upsert").exists(_.contains("__graft_ptr::")),
        "publish did not ride the pointer flip")
      assert(t.listCollections() == Seq("aw"), t.listCollections().toString)

      // namespaced target
      df.write.format("graft-pinecone").option("url", server.url)
        .option("collection", "aw").option("namespace", "n1")
        .option("atomic", "true").option("dim", "2")
        .mode("overwrite").save()
      assert(t.count("aw::n1") == 2)
      assert(t.listCollections().sorted == Seq("aw", "aw::n1"),
        t.listCollections().toString)
      // read back through the DSv2 scan: pointer resolution is transparent
      val back = spark.read.format("graft-pinecone").option("url", server.url)
        .option("collection", "aw").option("namespace", "n1").load()
      assert(back.count() == 2)
    } finally server.stop()
  }

  test("--sweep-staging drops stranded namespace shadows, never the live generation") {
    val server = new PineconeWireServer(new InMemoryStore)
    val t = new PineconeWireTransport(server.url)
    try {
      // published target: live generation behind the pointer
      t.createCollection("sw::ns", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      val live = t.stagingName("sw::ns")
      t.createCollection(live, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(live, Seq(rec("1", "live")))
      t.rename(live, "sw::ns")
      // two strandeds: one under the namespaced target, one under the bare
      t.upsert("sw::ns__staging_dead", Seq(rec("d", "dead")))
      t.upsert("sw::__staging_deadbare", Seq(rec("d", "dead")))
      val cfg = Files.createTempFile("swp", ".json")
      Files.writeString(cfg,
        s"""{"type": "pinecone", "connection": {"url": "${server.url}",
           | "namespace": "ns"}, "collection": "sw"}""".stripMargin)
      assert(graft.cli.Main.run(Array("--sweep-staging", cfg.toString)) == 0)
      assert(t.count("sw::ns") == 1, "live generation must survive the sweep")
      assert(!t.listCollections().exists(_.contains("ns__staging_")),
        t.listCollections().toString)
      // the bare-target stranded needs the bare-target sweep
      val cfg2 = Files.createTempFile("swp2", ".json")
      Files.writeString(cfg2,
        s"""{"type": "pinecone", "connection": {"url": "${server.url}"},
           | "collection": "sw"}""".stripMargin)
      assert(graft.cli.Main.run(Array("--sweep-staging", cfg2.toString)) == 0)
      assert(!t.listCollections().exists(_.contains("__staging_")),
        t.listCollections().toString)
      assert(t.count("sw::ns") == 1)
    } finally server.stop()
  }

  test("index drop/recreate purges cached pointers - no writes into dead generations") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      // publish so the pointer ns->gen is CACHED by this client
      t.createCollection("pg::ns", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      val gen = t.stagingName("pg::ns")
      t.createCollection(gen, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(gen, Seq(rec("1", "g1")))
      t.rename(gen, "pg::ns")
      assert(t.count("pg::ns") == 1) // resolves + caches ns -> gen
      // drop the WHOLE index (pointers die with it), recreate, write
      // through the SAME client within the cache TTL: rows must land in
      // the literal namespace of the fresh index, not the dead generation
      t.drop("pg")
      t.createCollection("pg::ns", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = false)
      t.upsert("pg::ns", Seq(rec("7", "fresh"), rec("8", "fresh")))
      assert(t.count("pg::ns") == 2, "stale cached pointer routed the write")
      assert(inner.count("pg::ns") == 2, "rows landed outside the literal namespace")
      // same purge on createCollection(bare index, recreate = true)
      assert(t.count("pg::ns") == 2)
      t.createCollection("pg", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert("pg::ns", Seq(rec("9", "fresh2")))
      assert(t.count("pg::ns") == 1)
    } finally server.stop()
  }

  test("DSv2 scans pin the generation at plan time: zero pointer fetches per page") {
    val server = new PineconeWireServer(new InMemoryStore)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("sp::ns", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      val gen = t.stagingName("sp::ns")
      t.createCollection(gen, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(gen, (0 until 300).map(i => rec(s"r$i", "live")))
      t.rename(gen, "sp::ns")
      // snapshotName resolves to the generation's own (reserved) name
      assert(t.snapshotName("sp::ns") == gen, t.snapshotName("sp::ns"))
      val before = server.requests
      val n = spark.read.format("graft-pinecone").option("url", server.url)
        .option("collection", "sp").option("namespace", "ns")
        .option("page_size", "100").load().count()
      assert(n == 300)
      val lines = server.requestLines.drop(before.toInt)
      // tasks address the generation directly: list calls name the
      // generation namespace, and NO task-side pointer fetch happens
      // (the only __graft_ptr fetch is the driver's one plan-time resolve)
      val genEnc = java.net.URLEncoder.encode(gen.split("::")(1), "UTF-8")
      assert(lines.exists(l => l.startsWith("GET /vectors/list") && l.contains(genEnc)),
        lines.filter(_.startsWith("GET /vectors/list")).toString)
      val ptrFetches = lines.count(l =>
        l.startsWith("GET /vectors/fetch") && l.contains("__graft_ptr"))
      assert(ptrFetches <= 1, s"$ptrFetches pointer fetches - per-page resolution is back")
    } finally server.stop()
  }

  test("stale retry of a SUPERSEDED publish is a no-op, never a flip to an empty gen") {
    val server = new PineconeWireServer(new InMemoryStore)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("sr::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      val gA = "sr::t__staging_jobA"
      t.createCollection(gA, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(gA, Seq(rec("1", "A")))
      t.rename(gA, "sr::t") // job A publishes
      val gB = "sr::t__staging_jobB"
      t.createCollection(gB, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(gB, Seq(rec("2", "B"), rec("3", "B")))
      t.rename(gB, "sr::t") // job B publishes; gA retired and EMPTY
      assert(t.count("sr::t") == 2)
      // a delayed duplicate of job A's publish arrives: its generation is
      // gone - flipping to it (and deleting gB as "old") would be total
      // data loss. Must be a no-op.
      t.rename(gA, "sr::t")
      val reader = new PineconeWireTransport(server.url)
      assert(reader.count("sr::t") == 2, "stale retry destroyed the live generation")
      assert(reader.scroll("sr::t", 0, 10).forall(_.metadata("v") == "B"))
    } finally server.stop()
  }

  test("a NEW publish finishes a crashed predecessor's pending retire first") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("pp::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      // crash state: pointer {target: gen2, prev: gen1}, gen1 rows intact
      val g1 = "pp::t__staging_g1"; val g2 = "pp::t__staging_g2"
      t.createCollection(g1, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(g1, Seq(rec("1", "g1"), rec("2", "g1")))
      t.createCollection(g2, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(g2, Seq(rec("3", "g2")))
      t.upsert("pp::__graft_meta", Seq(VSRecord("__graft_ptr::t", Array(1f, 1f),
        Map("target" -> "t__staging_g2", "prev" -> "t__staging_g1"))))
      assert(inner.count(g1) == 2, "precondition: pending retire")
      // a brand-new publish (gen3, NOT a retry) must not strand gen1
      val g3 = "pp::t__staging_g3"
      t.createCollection(g3, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(g3, Seq(rec("4", "g3")))
      t.rename(g3, "pp::t")
      assert(rawRows(inner, g1) == 0, "predecessor's pending retire was stranded")
      assert(rawRows(inner, g2) == 0, "old live generation not retired")
      assert(t.count("pp::t") == 1)
      assert(t.scroll("pp::t", 0, 10).head.metadata("v") == "g3")
    } finally server.stop()
  }

  test("a publish landing MID-SCAN never tears the scan: one generation per job") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("ov::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      val g1 = t.stagingName("ov::t")
      t.createCollection(g1, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      (0 until 300).grouped(100).foreach(g =>
        t.upsert(g1, g.map(i => rec(f"a$i%03d", "g1"))))
      t.rename(g1, "ov::t")
      val genNs = java.net.URLEncoder.encode(g1.split("::")(1), "UTF-8")
      // slow every page so the scan is still walking when the publish lands
      server.injectLatencyMs = 25
      val markBefore = server.requests
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val scan = Future {
        spark.read.format("graft-pinecone").option("url", server.url)
          .option("collection", "ov").option("namespace", "t")
          .option("page_size", "50").load()
          .select("id", "metadata").collect()
      }(scala.concurrent.ExecutionContext.global)
      // wait until the scan has actually served a page of the PINNED
      // generation, so the publish provably lands mid-walk
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!server.requestLines.drop(markBefore.toInt).exists(l =>
        l.startsWith("GET /vectors/list") && l.contains(genNs)) &&
        System.nanoTime() < deadline) Thread.sleep(10)
      // generation 2 publishes while the scan walks generation 1; the
      // retire leg DELETES g1's rows under the reader's feet
      val g2 = t.stagingName("ov::t")
      t.createCollection(g2, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(g2, Seq(rec("n1", "g2"), rec("n2", "g2")))
      t.rename(g2, "ov::t")
      val rows = Await.result(scan, 120.seconds)
      server.injectLatencyMs = 0
      // the documented overlap window: the scan may see a PREFIX of its
      // pinned generation (the retire can empty the tail mid-walk), but
      // NEVER a row of another generation — snapshot pinning means a scan
      // is one consistent generation or less, not a mix
      val tags = rows.map(_.getAs[Map[String, String]](1)("v")).toSet
      assert(rows.nonEmpty, "the overlapped scan served no pre-publish page")
      assert(tags == Set("g1"), s"scan mixed generations: $tags")
      assert(rows.length <= 300)
      // ids within the pinned generation are never duplicated either
      assert(rows.map(_.getString(0)).distinct.length == rows.length)
      // the NEXT scan (fresh plan-time resolution) sees exactly the new
      // generation
      val after = spark.read.format("graft-pinecone").option("url", server.url)
        .option("collection", "ov").option("namespace", "t").load()
        .select("metadata").collect()
        .map(_.getAs[Map[String, String]](0)("v"))
      assert(after.length == 2 && after.forall(_ == "g2"), after.mkString(","))
    } finally { server.injectLatencyMs = 0; server.stop() }
  }

  test("zero-row overwrite of a POINTERED target publishes an EMPTY generation") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("ze::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      val g1 = t.stagingName("ze::t")
      t.createCollection(g1, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(g1, Seq(rec("1", "g1")))
      t.rename(g1, "ze::t")
      assert(t.count("ze::t") == 1)
      // a legitimate recreate-to-empty: the shadow was CREATED (so its
      // generation marker exists) but received zero rows. Before the
      // marker, this publish was indistinguishable from a stale retry of
      // a retired generation and silently KEPT the old data.
      val g2 = t.stagingName("ze::t")
      t.createCollection(g2, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.rename(g2, "ze::t")
      assert(t.count("ze::t") == 0, "zero-row overwrite must replace, not keep stale rows")
      assert(rawRows(inner, g1) == 0, "the old generation must be retired")
      assert(t.exists("ze::t"), "the pointered logical name survives an empty publish")
      // and the guard still holds: a stale duplicate of g1's publish
      // (retired: rows AND marker gone) must not resurrect anything
      t.rename(g1, "ze::t")
      assert(t.count("ze::t") == 0)
    } finally server.stop()
  }

  test("a swept shadow's delayed rename no-ops on a NEVER-POINTERED target too") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      // the target serves LITERAL rows: upserted directly, never published
      // atomically, so NO pointer exists for it
      t.createCollection("np::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert("np::t", Seq(rec("1", "live"), rec("2", "live")))
      // a zombie job's shadow is built, then swept
      val zombie = t.stagingName("np::t")
      t.createCollection(zombie, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(zombie, Seq(rec("9", "zombie")))
      t.drop(zombie)
      // the zombie wakes and publishes: with the old pointer-gated guard
      // this flipped a pointer onto the retired namespace and deleted the
      // literal rows as "old" — total silent loss on an unpointered target
      t.rename(zombie, "np::t")
      val tags = t.scroll("np::t", 0, 10).map(_.metadata("v")).sorted
      assert(tags == Seq("live", "live"),
        s"swept shadow's rename destroyed literal rows: $tags")
    } finally server.stop()
  }

  test("retire drops the generation MARKER before the rows (bounds the stale-writer window)") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("ro::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      val g1 = t.stagingName("ro::t")
      t.createCollection(g1, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(g1, Seq(rec("1", "g1")))
      t.rename(g1, "ro::t")
      val g1ns = g1.split("::")(1)
      val before = server.bodiesOf("POST /vectors/delete").size
      // publish g2: the retire of g1 must delete g1's MARKER (a targeted
      // id-delete in __graft_meta) BEFORE g1's deleteAll — a stale-cached
      // writer re-verifies through the marker, so marker-first means no
      // marker-verified write can begin once row deletion is underway
      val g2 = t.stagingName("ro::t")
      t.createCollection(g2, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(g2, Seq(rec("2", "g2")))
      t.rename(g2, "ro::t")
      val deletes = server.bodiesOf("POST /vectors/delete").drop(before)
      val markerAt = deletes.indexWhere(b =>
        b.contains("__graft_meta") && b.contains(s"__graft_gen::$g1ns"))
      val rowsAt = deletes.indexWhere(b =>
        b.contains("\"deleteAll\"") && b.contains(g1ns))
      assert(markerAt >= 0 && rowsAt >= 0, s"retire legs missing: $deletes")
      assert(markerAt < rowsAt,
        s"marker delete (#$markerAt) must precede the rows delete (#$rowsAt)")
    } finally server.stop()
  }

  test("a delayed rename of a SWEPT shadow no-ops — sweep is the explicit abort") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("ab::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      val live = t.stagingName("ab::t")
      t.createCollection(live, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(live, Seq(rec("1", "live")))
      t.rename(live, "ab::t")
      // a zombie job's shadow gets swept (drop on the reserved name, the
      // --sweep-staging verb's path) — the sweep must retire the marker
      // WITH the rows, or the zombie's eventual rename would publish an
      // empty generation over the live data
      val zombie = t.stagingName("ab::t")
      t.createCollection(zombie, CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      t.upsert(zombie, Seq(rec("9", "zombie")))
      t.drop(zombie)
      t.rename(zombie, "ab::t") // the zombie wakes up and publishes
      assert(t.count("ab::t") == 1, "swept shadow's rename emptied the live target")
      assert(t.scroll("ab::t", 0, 10).head.metadata("v") == "live")
    } finally server.stop()
  }

  test("stale retry of the SUPERSEDED publish with rows still present: no flip-back") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("sp2::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      // job A published gA; job B flipped to gB but CRASHED before the
      // retire - pointer {target: gB, prev: gA}, gA rows still present
      val gA = "sp2::t__staging_jobA"; val gB = "sp2::t__staging_jobB"
      t.createCollection(gA, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(gA, Seq(rec("1", "A")))
      t.createCollection(gB, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
      t.upsert(gB, Seq(rec("2", "B"), rec("3", "B")))
      t.upsert("sp2::__graft_meta", Seq(VSRecord("__graft_ptr::t", Array(1f, 1f),
        Map("target" -> "t__staging_jobB", "prev" -> "t__staging_jobA"))))
      // a delayed duplicate of JOB A's publish arrives. Flipping back to
      // gA and deleting gB as "old" would destroy the NEWEST generation.
      // The only legitimate work is finishing B's pending retire of gA.
      t.rename(gA, "sp2::t")
      val reader = new PineconeWireTransport(server.url)
      assert(reader.count("sp2::t") == 2, "stale retry flipped the pointer backwards")
      assert(reader.scroll("sp2::t", 0, 10).forall(_.metadata("v") == "B"))
      assert(rawRows(inner, gA) == 0, "the pending retire of gA was not finished")
    } finally server.stop()
  }
}