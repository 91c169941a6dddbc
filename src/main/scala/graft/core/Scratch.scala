package graft.core

import java.nio.file.{Files, Path}

/** Shutdown-hook-cleaned scratch directories for the streaming oracle
  * gates. The gate queries hand the driver a LAZY DataFrame over parquet
  * they just landed in a temp dir, so the dir cannot be deleted inside the
  * gate body — but without cleanup, repeated gate runs accumulate parquet
  * copies of the corpus in /tmp (round-18 ADVICE). One JVM-exit hook walks
  * every registered dir deepest-first; registration is idempotent and
  * thread-safe. */
object Scratch {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Create a temp directory that is recursively deleted at JVM exit. */
  def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    if (hookInstalled.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        registered.forEach { root =>
          try {
            val walk = Files.walk(root)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
            finally walk.close()
          } catch { case _: Exception => () } // best-effort: exit must not fail
        }
      }, "graft-scratch-cleanup"))
    }
    p.toString
  }
}
