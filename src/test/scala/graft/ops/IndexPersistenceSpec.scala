package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class IndexPersistenceSpec extends SparkSpec {

  private def emb = Tables(spark, sf(), "embeddings")
  private def queries = emb.filter(col("vec_id") < 5)

  private def results(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("save + load round-trips the index and reproduces the search exactly") {
    val (index, coded) = Quantization.buildIvfPqIndex(emb, nCells = 8, m = 8, ksub = 16)
    val fresh = results(Quantization.searchIvfPq(index, coded, queries, k = 3, nProbe = 8))

    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Quantization.saveIvfPqIndex(dir, index, coded)
    val (loaded, codedBack) = Quantization.loadIvfPqIndex(spark, dir)

    assert(loaded.cells.map(_.toSeq).toSeq == index.cells.map(_.toSeq).toSeq)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      index.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val reloaded = results(Quantization.searchIvfPq(loaded, codedBack, queries, k = 3, nProbe = 8))
    assert(reloaded == fresh, "search over the persisted index must be bit-identical")
  }

  test("loaded index supports exact re-rank against the original collection") {
    val (index, coded) = Quantization.buildIvfPqIndex(emb, nCells = 8, m = 8, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-rr").toString
    Quantization.saveIvfPqIndex(dir, index, coded)
    val (loaded, codedBack) = Quantization.loadIvfPqIndex(spark, dir)

    val rr = Quantization.searchIvfPq(loaded, codedBack, queries, k = 3, nProbe = 8,
      reRank = 499, reRankVectors = Some(emb))
    // exhaustive probe + exhaustive exact re-rank must equal exact-l2 top-k
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d").asc, col("cand_id").asc)
    val truth = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("d", graft.functions.VectorExpressions.l2(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rr.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth)
  }

  test("ivfPqTopK delegates to build + search (same results as before the split)") {
    val direct = results(Quantization.ivfPqTopK(emb, queries, k = 3,
      nCells = 8, nProbe = 8, m = 8, ksub = 16))
    val (index, coded) = Quantization.buildIvfPqIndex(emb, nCells = 8, m = 8, ksub = 16)
    val split = results(Quantization.searchIvfPq(index, coded, queries, k = 3, nProbe = 8))
    assert(direct == split)
  }

  test("search refuses re-rank without the vector collection") {
    val (index, coded) = Quantization.buildIvfPqIndex(emb, nCells = 4, m = 8, ksub = 8)
    intercept[IllegalArgumentException] {
      Quantization.searchIvfPq(index, coded, queries, k = 3, nProbe = 4, reRank = 10)
    }
  }
}
