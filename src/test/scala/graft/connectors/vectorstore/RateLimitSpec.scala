package graft.connectors.vectorstore

import org.scalatest.funsuite.AnyFunSuite

/** Rate-limit honesty: a 429 is not a generic fault to blind-backoff
  * through — the retry layer honors the service's `Retry-After`, and a
  * throttled endpoint caps this JVM's concurrent calls so parallel sliced
  * walks stop retry-storming in lockstep (the pattern that gets an
  * account banned on real Pinecone/Qdrant). */
class RateLimitSpec extends AnyFunSuite {

  private def freshStore(t: VectorStoreTransport): Unit = {
    t.createCollection("rl", CollectionConfig(dim = 2), recreate = true)
    t.upsert("rl", (0 until 5).map(i => VSRecord(s"$i", Array(i.toFloat, 1f), Map.empty)))
  }

  test("Retry-After is honored over the exponential schedule") {
    val server = new QdrantWireServer(new InMemoryStore)
    try {
      val wire = new QdrantWireTransport(server.url)
      freshStore(wire)
      // backoff schedule deliberately HUGE: if the wrapper ignored
      // Retry-After and used its own schedule, this test would sleep 20 s
      val t = RetryingTransport(wire, maxAttempts = 3, backoffMs = 10000L)
      server.inject429RetryAfterSec = 0.2
      server.inject429Next.set(2)
      ThrottleGate.reset(server.url)
      val t0 = System.nanoTime()
      assert(t.count("rl") == 5)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec >= 0.4, f"resumed before the service said to: $sec%.2f s")
      assert(sec < 5.0, f"fell back to the blind 10 s backoff: $sec%.2f s")
      // exactly 2 rejected attempts + 1 success on the wire
      assert(server.requestLines.count(_.contains("/points/count")) >= 3)
    } finally { ThrottleGate.reset(server.url); server.stop() }
  }

  test("bare 429 (no Retry-After) falls back to the exponential schedule") {
    val server = new QdrantWireServer(new InMemoryStore)
    try {
      val wire = new QdrantWireTransport(server.url)
      freshStore(wire)
      val t = RetryingTransport(wire, maxAttempts = 3, backoffMs = 150L)
      server.inject429RetryAfterSec = -1 // omit the header
      server.inject429Next.set(2)
      ThrottleGate.reset(server.url)
      val t0 = System.nanoTime()
      assert(t.count("rl") == 5)
      val sec = (System.nanoTime() - t0) / 1e9
      // schedule: 150 ms + 300 ms
      assert(sec >= 0.45, f"did not follow the 150/300 ms schedule: $sec%.2f s")
    } finally { ThrottleGate.reset(server.url); server.stop() }
  }

  test("429 exhausting maxAttempts surfaces as RateLimitedException") {
    val server = new QdrantWireServer(new InMemoryStore)
    try {
      val wire = new QdrantWireTransport(server.url)
      freshStore(wire)
      val t = RetryingTransport(wire, maxAttempts = 2, backoffMs = 10L)
      server.inject429RetryAfterSec = 0.01
      server.inject429Next.set(10)
      ThrottleGate.reset(server.url)
      val e = intercept[RateLimitedException] { t.count("rl") }
      assert(e.retryAfterMs.contains(10L))
    } finally { ThrottleGate.reset(server.url); server.stop() }
  }

  test("a throttle window caps the endpoint's concurrent calls JVM-wide") {
    val server = new QdrantWireServer(new InMemoryStore)
    try {
      val wire = new QdrantWireTransport(server.url)
      freshStore(wire)
      ThrottleGate.reset(server.url)
      // draw one 429: the endpoint is now throttled for 2 s
      server.inject429RetryAfterSec = 2.0
      server.inject429Next.set(1)
      intercept[RateLimitedException] { wire.count("rl") }
      // 8 "sliced walks" hammer during the window; the loopback serves
      // each request for 40 ms so overlap would be visible in maxInflight
      server.injectLatencyMs = 40
      server.resetInflight()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val futures = (0 until 8).map(_ => pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int = wire.count("rl")
      }))
      futures.foreach(f => assert(f.get() == 5))
      pool.shutdown()
      assert(server.maxInflight <= ThrottleGate.throttledPermits,
        s"throttled endpoint served ${server.maxInflight} concurrent calls " +
          s"(cap ${ThrottleGate.throttledPermits})")
    } finally {
      server.injectLatencyMs = 0
      ThrottleGate.reset(server.url)
      server.stop()
    }
  }

  test("outside a throttle window the gate does not serialize anything") {
    val server = new QdrantWireServer(new InMemoryStore)
    try {
      val wire = new QdrantWireTransport(server.url)
      freshStore(wire)
      ThrottleGate.reset(server.url)
      server.injectLatencyMs = 40
      server.resetInflight()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val futures = (0 until 8).map(_ => pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int = wire.count("rl")
      }))
      futures.foreach(f => assert(f.get() == 5))
      pool.shutdown()
      assert(server.maxInflight > ThrottleGate.throttledPermits,
        s"unthrottled endpoint never overlapped past the cap " +
          s"(maxInflight ${server.maxInflight}) — gate is throttling idle traffic")
    } finally {
      server.injectLatencyMs = 0
      server.stop()
    }
  }

  test("a hostile Retry-After is capped, never slept verbatim") {
    val server = new QdrantWireServer(new InMemoryStore)
    try {
      val wire = new QdrantWireTransport(server.url)
      freshStore(wire)
      val t = RetryingTransport(wire, maxAttempts = 3, backoffMs = 10L,
        maxRetryAfterMs = 100L)
      server.inject429RetryAfterSec = 3600 // "come back in an hour"
      server.inject429Next.set(2)
      ThrottleGate.reset(server.url)
      val t0 = System.nanoTime()
      assert(t.count("rl") == 5)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 5.0, f"slept the hostile Retry-After verbatim: $sec%.1f s")
      assert(sec >= 0.2, f"did not wait the cap at all: $sec%.2f s")
    } finally { ThrottleGate.reset(server.url); server.stop() }
  }

  test("the throttle WINDOW is capped too - one bad header cannot gate a JVM for a day") {
    ThrottleGate.reset("cap-test")
    ThrottleGate.throttled("cap-test", 86400000L) // "Retry-After: 86400"
    val remaining = ThrottleGate.throttledUntil("cap-test") - System.currentTimeMillis()
    assert(remaining <= ThrottleGate.maxWindowMs + 1000,
      s"window of ${remaining} ms survived the cap")
    ThrottleGate.reset("cap-test")
  }
}