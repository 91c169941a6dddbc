package graft.connectors.pgwire

/** netem-style TCP latency injector for the wire-face probes: relays every
  * accepted connection to `targetPort`, adding a fixed one-way `delayMs`
  * in EACH direction (+2·delayMs per round trip) WITHOUT throttling
  * bandwidth — reads never block on the delay; chunks are timestamped on
  * arrival and released by a per-direction forwarder thread once their
  * deadline passes, so a pipelined stream keeps its full throughput and
  * only round trips pay. This is the regime the write-mode decision
  * needs: on loopback (RTT ≈ 0) per-statement protocols look artificially
  * cheap, and the documented reason COPY exists — fewer round trips — is
  * invisible. Probe tooling only; accepts any number of connections,
  * daemon threads throughout. */
final class LatencyProxy(targetPort: Int, delayMs: Long) extends AutoCloseable {
  private val server = new java.net.ServerSocket(
    0, 64, java.net.InetAddress.getByName("127.0.0.1"))
  val port: Int = server.getLocalPort
  @volatile private var closed = false

  private final case class Chunk(deadline: Long, data: Array[Byte])

  private def pump(name: String, in: java.io.InputStream,
                   out: java.io.OutputStream, onDone: () => Unit): Unit = {
    val q = new java.util.concurrent.LinkedBlockingQueue[Chunk]()
    val writer = new Thread(() => {
      try {
        var live = true
        while (live) {
          val c = q.take()
          if (c.data == null) { live = false; onDone() }
          else {
            val wait = c.deadline - System.currentTimeMillis()
            if (wait > 0) Thread.sleep(wait)
            out.write(c.data)
            out.flush()
          }
        }
      } catch { case _: Throwable => () }
    }, s"latency-proxy-w-$name")
    writer.setDaemon(true)
    writer.start()
    val reader = new Thread(() => {
      val buf = new Array[Byte](64 * 1024)
      try {
        var n = in.read(buf)
        while (n >= 0) {
          q.put(Chunk(System.currentTimeMillis() + delayMs,
            java.util.Arrays.copyOf(buf, n)))
          n = in.read(buf)
        }
      } catch { case _: Throwable => () }
      finally q.put(Chunk(0L, null))
    }, s"latency-proxy-r-$name")
    reader.setDaemon(true)
    reader.start()
  }

  private val acceptor = new Thread(() => {
    var id = 0
    try while (!closed) {
      val cli = server.accept()
      cli.setTcpNoDelay(true)
      val srv = new java.net.Socket("127.0.0.1", targetPort)
      srv.setTcpNoDelay(true)
      id += 1
      // half-close propagation: when one side's stream ends, shut down
      // the peer's matching direction so a FIN crosses the proxy like it
      // would a real network path
      pump(s"$id-c2s", cli.getInputStream, srv.getOutputStream,
        () => try srv.shutdownOutput() catch { case _: Throwable => () })
      pump(s"$id-s2c", srv.getInputStream, cli.getOutputStream,
        () => try cli.shutdownOutput() catch { case _: Throwable => () })
    } catch { case _: Throwable => () } // server.close() lands here
  }, "latency-proxy-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = {
    closed = true
    try server.close() catch { case _: Throwable => () }
  }
}
