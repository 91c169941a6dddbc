package graft.connectors.vectorstore

import graft.SparkSpec

/** Cross-client pointer-cache staleness: client A publishes a new
  * generation (invalidating only ITS cache); client B's cached pointer —
  * the DSv2 scan path shares one transport per URL — survives up to the
  * 2 s TTL and, because the publisher RETIRES the old generation, a stale
  * resolution lands on a namespace that no longer exists: scans read
  * emptiness and writes vanish, strictly worse than reading old data.
  * The generation marker (round 13) closes this at the points that
  * matter: `snapshotName` (once per scan job) and the batched write verbs
  * re-verify a staging-namespace resolution and refresh on a missing
  * marker. */
class CrossClientStalenessSpec extends SparkSpec {
  private def rec(id: String, tag: String) =
    VSRecord(id, Array(id.hashCode.toFloat % 7, 1f), Map("v" -> tag))

  private def publish(t: PineconeWireTransport, target: String,
                      recs: Seq[VSRecord]): Unit = {
    val sh = t.stagingName(target)
    t.createCollection(sh, CollectionConfig(distance = "Cosine", dim = 2), recreate = true)
    if (recs.nonEmpty) t.upsert(sh, recs)
    t.rename(sh, target)
  }

  test("a fresh scan INSIDE the cache TTL of an external publish sees the new generation") {
    val server = new PineconeWireServer(new InMemoryStore)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("cs::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      publish(t, "cs::t", (0 until 120).map(i => rec(f"a$i%03d", "g1")))
      // the DSv2 path resolves + CACHES the pointer on its own transport
      val first = spark.read.format("graft-pinecone").option("url", server.url)
        .option("collection", "cs").option("namespace", "t").load().count()
      assert(first == 120)
      // external publish through a DIFFERENT client, then an immediate
      // re-scan (well inside the 2 s TTL): without the marker check the
      // scan pinned the retired generation and returned 0 rows
      publish(t, "cs::t", Seq(rec("n1", "g2"), rec("n2", "g2")))
      val after = spark.read.format("graft-pinecone").option("url", server.url)
        .option("collection", "cs").option("namespace", "t").load()
        .select("metadata").collect()
        .map(_.getAs[Map[String, String]](0)("v"))
      assert(after.length == 2 && after.forall(_ == "g2"),
        s"stale cache served a retired generation: ${after.mkString(",")}")
    } finally server.stop()
  }

  test("a LIVE generation without a marker (pre-marker publish) is memoized, not treated stale") {
    val server = new PineconeWireServer(new InMemoryStore)
    val t = new PineconeWireTransport(server.url)
    try {
      t.createCollection("lg::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      publish(t, "lg::t", Seq(rec("a1", "g1")))
      // simulate a generation published BEFORE markers existed: remove its
      // marker record from the meta namespace through the public verb
      val gen = t.snapshotName("lg::t").split("::")(1)
      t.delete("lg::__graft_meta", Seq(s"__graft_gen::$gen"))
      assert(!t.scroll("lg::__graft_meta", 0, 100).exists(_.id == s"__graft_gen::$gen"))
      // the next marker-verified call sees marker-missing but the FRESH
      // pointer still naming the same generation -> verified legacy,
      // memoized CLIENT-LOCALLY (deliberately NOT healed server-side: a
      // marker write would race a concurrent retire last-writer-wins and
      // could strand a marker on a retired generation)
      t.upsert("lg::t", Seq(rec("a2", "late")))
      assert(t.scroll("lg::t", 0, 100).map(_.metadata("v")).sorted == Seq("g1", "late"))
      assert(!t.scroll("lg::__graft_meta", 0, 100).exists(_.id == s"__graft_gen::$gen"),
        "legacy verification must not write a server-side marker")
      // the memo is effective: the NEXT verified call inside the TTL pays
      // neither a marker fetch nor a pointer re-fetch (both ride
      // GET /vectors/fetch against the meta namespace)
      val mark = server.requests
      t.upsert("lg::t", Seq(rec("a3", "late2")))
      val metaFetches = server.requestLines.drop(mark.toInt)
        .filter(l => l.startsWith("GET /vectors/fetch") && l.contains("__graft_meta"))
      assert(metaFetches.isEmpty,
        s"memoized legacy gen still paying verification churn: $metaFetches")
    } finally server.stop()
  }

  test("a write INSIDE the cache TTL of an external publish lands in the live generation") {
    val inner = new InMemoryStore
    val server = new PineconeWireServer(inner)
    val writer = new PineconeWireTransport(server.url) // the client with the stale cache
    val publisher = new PineconeWireTransport(server.url)
    try {
      writer.createCollection("cw2::t", CollectionConfig(distance = "Cosine", dim = 2),
        recreate = true)
      publish(publisher, "cw2::t", Seq(rec("a1", "g1")))
      assert(writer.count("cw2::t") == 1) // writer resolves + caches ptr -> g1
      publish(publisher, "cw2::t", Seq(rec("b1", "g2")))
      // stale-cache write: without the marker check these rows landed in
      // the retired g1 namespace — silently lost to every reader
      writer.upsert("cw2::t", Seq(rec("w1", "late-write")))
      val reader = new PineconeWireTransport(server.url)
      val tags = reader.scroll("cw2::t", 0, 100).map(_.metadata("v")).sorted
      assert(tags == Seq("g2", "late-write"), s"write vanished: $tags")
      // and a stale-cache DELETE removes from the live generation too
      writer.delete("cw2::t", Seq("b1"))
      assert(reader.scroll("cw2::t", 0, 100).map(_.metadata("v")) == Seq("late-write"))
    } finally server.stop()
  }
}
