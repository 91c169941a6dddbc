package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic across runs and partitionings") {
    val df = (1 to 500).map(i => (i.toLong, (i % 7 + 1).toDouble)).toDF("id", "w")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, "w", k = 50, idCol = "id")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val a = ids(df)
    assert(a == ids(df.repartition(13)))
    assert(a.length == 50 && a.distinct.length == 50)
  }

  test("inclusion probability tracks the weight (9x overrepresentation)") {
    // 500 heavy (w=9) + 500 light (w=1) rows; k=100 at a 10% sampling
    // fraction should pick heavies at ~9:1 odds — E[heavy] ≈ 90
    val df = (1 to 1000).map(i => (i.toLong, if (i % 2 == 0) 9.0 else 1.0)).toDF("id", "w")
    val heavy = Sampling.weightedSample(df, "w", k = 100, idCol = "id")
      .filter(col("w") === 9.0).count()
    assert(heavy > 75 && heavy < 99, s"got $heavy/100 heavy rows, expected ~90")
  }

  test("k beyond the population returns everything; non-positive weights drop") {
    val df = Seq((1L, 1.0), (2L, 0.0), (3L, -2.0), (4L, 5.0)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "w", k = 10, idCol = "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("schema passes through unchanged (no helper columns leak)") {
    val df = Seq((1L, 2.0, "x")).toDF("id", "w", "payload")
    val out = Sampling.weightedSample(df, "w", k = 1, idCol = "id")
    assert(out.columns.toSeq == Seq("id", "w", "payload"))
  }
}
