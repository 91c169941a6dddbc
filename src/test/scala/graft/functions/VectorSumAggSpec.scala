package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorSumAggSpec extends SparkSpec {
  import spark.implicits._

  test("vec_sum sums element-wise across partitions (merge path)") {
    val df = Seq(
      ("a", Seq(1f, 2f)), ("a", Seq(3f, 4f)), ("a", Seq(5f, 6f)),
      ("b", Seq(10f, 20f)))
      .toDF("k", "v").repartition(3)
    val out = df.groupBy("k").agg(VectorAggFunctions.vecSum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(9.0, 12.0))
    assert(out("b") == Seq(10.0, 20.0))
  }

  test("vec_sum skips null vectors; all-null group yields null") {
    val df = Seq(("a", Some(Seq(1f, 1f))), ("a", None), ("c", None))
      .toDF("k", "v")
    val rows = df.groupBy("k").agg(VectorAggFunctions.vecSum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1)))).toMap
    assert(rows("a").contains(Seq(1.0, 1.0)))
    assert(rows("c").isEmpty)
  }

  test("vecCentroid equals the posexplode formulation on real embeddings") {
    val emb = graft.Tables(spark, sf(), "embeddings")
    val viaAgg = emb.groupBy("label")
      .agg(VectorAggFunctions.vecCentroid(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("pos", "cv")))
      .select(col("label"), col("pos"), round(col("cv"), 9).as("cv"))
    val viaExplode = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v").cast("double")), 9).as("cv"))
    val a = viaAgg.orderBy("label", "pos").collect().map(_.toString).toSeq
    val b = viaExplode.orderBy("label", "pos").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("binary vectors: sign-bit packing + hamming distance") {
    val df = Seq((Seq(1f, -1f, 2f, -2f, 3f, -3f, 4f, -4f, 5f),
      Seq(1f, 1f, 2f, -2f, -3f, -3f, 4f, -4f, -5f))).toDF("a", "b")
    val r = df.select(
      BinaryVectors.pack(col("a")).as("pa"),
      BinaryVectors.hamming(BinaryVectors.pack(col("a")), BinaryVectors.pack(col("b"))).as("d"))
      .head()
    // a bits: 1,0,1,0,1,0,1,0 | 1  -> bytes [0b01010101, 0b00000001]
    assert(r.getAs[Array[Byte]]("pa").toSeq == Seq(0x55.toByte, 0x01.toByte))
    // b bits: 1,1,1,0,0,0,1,0 | 0  -> diffs at positions 1,4,8 -> hamming 3
    assert(r.getInt(1) == 3)
  }

  test("vec_sum is callable from SQL via the extension registry") {
    graft.Tables(spark, sf(), "embeddings").createOrReplaceTempView("emb_vs")
    val n = spark.sql(
      "SELECT label, vec_sum(embedding) AS s FROM emb_vs GROUP BY label")
      .filter(size(col("s")) === 64).count()
    assert(n == 10)
  }
}
