package graft

/** Executes every gate query end-to-end at sf0.001 — `sbt test` alone now
  * catches a runtime regression in any inventory entry without waiting for
  * the round's Verify pass. (Value correctness is the DuckDB compare's
  * job; this guards execution.) */
class AllQueriesSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes") {
      val df = fn(spark, sf())
      assert(df.columns.nonEmpty)
      df.limit(1).count() // forces the plan through execution
    }
  }

  test("flagship entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
