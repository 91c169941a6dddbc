package graft

/** Optimization-round measurement tool: dump `.explain("formatted")` for a
  * set of declared queries (plus the bench-only board) into a directory —
  * the before/after plan evidence for plans/r{N}/. Driver-contract mains
  * (Verify/Bench) are untouched; this is a diagnostics side door.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [q1 q2 ...]
  * With no query names: the Bench headline + pipelineHeadline boards.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "before"
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else Bench.headline ++ Bench.pipelineHeadline
    val spark = GraftSession.local("graft-plandump")
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries ++ Bench.benchOnly
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.distinct.foreach { n =>
      qs.get(n) match {
        case Some(q) =>
          try {
            val plan = q(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"[plandump] wrote $n")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
          }
        case None => System.err.println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
