package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncation point for iterative / staged operators.
  *
  * `localCheckpoint` stores blocks on executors only: fast (no DFS write)
  * and exactly right on `local[N]`, but on a real cluster an executor loss
  * mid-pipeline makes the data UNRECOVERABLE — the lineage is gone, so the
  * job dies instead of recomputing. At a 100 TB run that is a
  * restart-the-world failure mode for the long iterative ops (connected
  * components, Lloyd's rounds, staged dedup).
  *
  * Setting `spark.graft.checkpoint.dir` (any DFS path visible to every
  * executor — HDFS/S3/...) switches EVERY materialization point in the
  * library to reliable `Dataset.checkpoint()`: blocks are written to the
  * DFS, so lost executors recover by re-reading, not re-running. The flag
  * costs one distributed write per checkpoint — the standard durability
  * trade, opt-in because locally it only adds I/O.
  */
object Materialize {

  /** Session conf key: when set (non-empty), use reliable checkpoints. */
  val ConfKey = "spark.graft.checkpoint.dir"

  // last base dir applied per SparkContext (setCheckpointDir creates a
  // fresh UUID subdir per call — only re-apply when the base changes)
  private val applied = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize `df` eagerly and truncate its lineage: reliable
    * `checkpoint()` when [[ConfKey]] is set, `localCheckpoint()` otherwise. */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // synchronized + record-AFTER-success: a put-then-set let a
        // concurrent caller observe the dir as applied and checkpoint()
        // BEFORE setCheckpointDir ran ('Checkpoint directory has not been
        // set'), and a failing set poisoned the map so every later call
        // skipped it and failed with the same misleading error
        applied.synchronized {
          if (applied.get(sc.applicationId) != dir) {
            sc.setCheckpointDir(dir)
            applied.put(sc.applicationId, dir)
          }
        }
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }
}
