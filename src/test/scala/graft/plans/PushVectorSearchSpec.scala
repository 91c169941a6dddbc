package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Canonical

class PushVectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private def load(coll: String, n: Int): Unit = {
    val rnd = new scala.util.Random(5)
    (0 until n).map(i => (i.toString, Seq.fill(8)(rnd.nextFloat()), Map.empty[String, String]))
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
      .write.format("graft-qdrant").option("collection", coll)
      .option("recreate", "true").option("page_size", "500").mode("overwrite").save()
  }

  private val qv: Seq[Float] = {
    val rnd = new scala.util.Random(17)
    Seq.fill(8)(rnd.nextFloat())
  }

  private def topk(coll: String) =
    spark.read.format("graft-qdrant").option("collection", coll).load()
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc)
      .limit(7)
      .select(Canonical.ID)

  test("ORDER BY cosine DESC LIMIT k rewrites into a native search scan") {
    load("pvs", 3000)
    val df = topk("pvs")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("search=topk(k=7"), physical)
  }

  test("rewritten plan returns the exact same top-k as a non-pushable plan") {
    load("pvs2", 3000)
    val pushed = topk("pvs2").as[String].collect().toSeq
    // computing the same thing outside the rewrite window (distinct+sort
    // breaks the Limit(Sort(relation)) pattern) -> exact reference answer
    val exact = spark.read.format("graft-qdrant").option("collection", "pvs2").load()
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .select(col(Canonical.ID), col("score")).distinct()
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(7)
      .select(Canonical.ID).as[String].collect().toSeq
    assert(pushed == exact)
  }

  test("an intervening Filter disables the rewrite (conservative correctness)") {
    load("pvs3", 1000)
    val df = spark.read.format("graft-qdrant").option("collection", "pvs3").load()
      .filter(col(Canonical.ID) =!= "climate") // non-pushable shape guard irrelevant; any Filter
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(5)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("search=topk"), physical)
    assert(df.count() == 5)
  }
}
