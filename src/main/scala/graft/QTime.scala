package graft

/** Optimization-round timing tool: per-query medians over N samples after
  * one untimed warm-up — the Bench measurement protocol without the full
  * board, for fast iteration on one query. Not a driver-contract main.
  *
  * Usage: runMain graft.QTime <sfDir> <samples> <q1> [q2 ...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.local("graft-qtime")
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries ++ Bench.benchOnly
    // JIT warm like Bench: repeated calibration until stable
    (1 to 8).foreach(_ => Bench.calibrate(spark))
    // SPARK_GRAFT_QTIME_STAGES=1: per-stage wall/tasks for the LAST sample
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, Long)]()
    if (sys.env.get("SPARK_GRAFT_QTIME_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          stages.put(i.stageId,
            (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
              i.numTasks, i.taskMetrics.executorRunTime))
        }
      })
    names.foreach { n =>
      val q = qs(n)
      try q(spark, sfDir).count() catch { case _: Throwable => () } // warm-up
      // failed samples are EXCLUDED from the stats (ADVICE r19): a throwing
      // query's tiny wall time would otherwise fold into the median and
      // report a flaky query as misleadingly fast
      var failed = 0
      val times = (1 to samples).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { q(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[qtime] $n sample failed: ${e.getMessage}")
            failed += 1; false }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }.sorted
      if (times.isEmpty) println(f"[qtime] $n%-28s ALL $failed%d SAMPLES FAILED")
      else {
        val med = times(times.length / 2)
        val iqr = times(times.length * 3 / 4) - times(times.length / 4)
        val tag = if (failed > 0) s"  FAILED $failed/$samples" else ""
        println(f"[qtime] $n%-28s median ${med}%.3f s  iqr ${iqr}%.3f  min ${times.head}%.3f$tag")
      }
      if (!stages.isEmpty) {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (ms, nt, run)) =>
          println(f"[qtime]   stage $id%4d wall ${ms}%6d ms  tasks=$nt%3d  taskRunSum ${run}%6d ms")
        }
        stages.clear()
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
