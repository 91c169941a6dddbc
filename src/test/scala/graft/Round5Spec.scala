package graft

import org.apache.spark.sql.functions._
import graft.ops.Clustering

/** Round-5 additions. */

/** The fused nearest-center kernel must be BIT-IDENTICAL to the
  * crossJoin+min(struct) plan it replaced — same l2 accumulation order,
  * same lowest-id tie-break — and must actually compile under codegen. */
class FusedAssignSpec extends SparkSpec {
  import spark.implicits._

  test("assign == assignViaShuffle bit-for-bit on real embeddings") {
    val e = Tables(spark, sf(), "embeddings")
    val centers = Clustering.initCenters(e, 8)
    val fused = Clustering.assign(e, centers)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val shuffled = Clustering.assignViaShuffle(e, centers)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(fused.length == shuffled.length && fused.length > 0)
    fused.zip(shuffled).foreach { case (f, s) => assert(f == s) }
  }

  test("ties break to the lowest center id, like min(struct)") {
    // two centers at the SAME point: every vector is equidistant to both
    val emb = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val centers = Seq((7L, Seq(0.5, 0.5)), (3L, Seq(0.5, 0.5)))
      .toDF("center_id", "center")
    val got = Clustering.assign(emb, centers)
      .select("cluster_id").as[Long].collect()
    assert(got.forall(_ == 3L))
  }

  test("NearestCenterExpr generated code compiles (no interpreted fallback)") {
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val e = Tables(spark, sf(), "embeddings")
      val rows = Clustering.assign(e, Clustering.initCenters(e, 4))
        .limit(5).collect()
      assert(rows.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("assign plan is a pure map: no join, no exchange") {
    val e = Tables(spark, sf(), "embeddings")
    val plan = Clustering.assign(e, Clustering.initCenters(e, 8))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
  }
}
