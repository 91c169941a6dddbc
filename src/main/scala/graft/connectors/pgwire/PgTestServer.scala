package graft.connectors.pgwire

import scala.sys.process._
import scala.util.control.NonFatal

/** Throwaway local PostgreSQL bootstrap: `initdb` + `pg_ctl` under /tmp
  * as the `postgres` system user (the server refuses root), trust auth
  * on a loopback port — the live stand-in the pgvector wire face is
  * verified against (`PgLiveWireSpec`, the `q_migrate_pgwire` gate).
  * Returns None — and callers degrade or cancel — when the binaries or
  * the user are absent, so everything built on it stays
  * environment-portable. Purely local tooling: no network beyond
  * 127.0.0.1, nothing installed, the data dir removed on [[Running.stop]]. */
object PgTestServer {
  case class Running(port: Int, root: java.io.File, pgCtl: String) {
    def stop(): Unit = {
      try Seq("runuser", "-u", "postgres", "--", pgCtl,
        "-D", s"${root.getAbsolutePath}/data", "-m", "immediate", "stop").!(devNull)
      catch { case NonFatal(_) => () }
      try Seq("rm", "-rf", root.getAbsolutePath).!(devNull)
      catch { case NonFatal(_) => () }
    }
  }

  private val devNull = ProcessLogger(_ => (), _ => ())

  private def binDir: Option[java.io.File] =
    Option(new java.io.File("/usr/lib/postgresql").listFiles())
      .getOrElse(Array.empty).sortBy(_.getName).reverse
      .map(v => new java.io.File(v, "bin"))
      .find(b => new java.io.File(b, "initdb").canExecute &&
        new java.io.File(b, "pg_ctl").canExecute)

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** One attempt; any failure (no binaries, no postgres user, no runuser,
    * sandboxed exec) yields None. `extraServerOpts` are appended to the
    * postgres command line (`-c k=v` pairs — the TLS spec starts a
    * server with `ssl=on` + a self-signed cert this way). */
  def start(extraServerOpts: Seq[String] = Nil): Option[Running] = try {
    val bin = binDir.getOrElse(return None)
    if (Seq("id", "-u", "postgres").!(devNull) != 0) return None
    val root = java.nio.file.Files.createTempDirectory("graft-pgwire").toFile
    val data = new java.io.File(root, "data").getAbsolutePath
    if (Seq("chown", "-R", "postgres:postgres", root.getAbsolutePath).!(devNull) != 0) {
      root.delete(); return None
    }
    val initdb = Seq("runuser", "-u", "postgres", "--",
      s"${bin.getAbsolutePath}/initdb", "-D", data, "-A", "trust",
      "-U", "postgres", "--no-sync").!(devNull)
    if (initdb != 0) { Running(0, root, s"${bin.getAbsolutePath}/pg_ctl").stop(); return None }
    val port = freePort()
    val started = Seq("runuser", "-u", "postgres", "--",
      s"${bin.getAbsolutePath}/pg_ctl", "-D", data, "-w",
      "-o", (Seq(s"-p $port", s"-k ${root.getAbsolutePath}",
        "-c listen_addresses=127.0.0.1") ++ extraServerOpts).mkString(" "),
      "-l", s"${root.getAbsolutePath}/server.log", "start").!(devNull)
    val run = Running(port, root, s"${bin.getAbsolutePath}/pg_ctl")
    if (started != 0) { run.stop(); return None }
    Some(run)
  } catch { case NonFatal(_) => None }
}
