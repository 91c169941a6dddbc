package graft.tools

import org.apache.spark.sql.functions._

/** One-off generator for the committed benchmark-eval fixtures the
  * `decontaminated_corpus.json` example config points at: a tiny
  * benchmark text parquet plus its embeddings under the SAME
  * hashed-token kernel `chunk_embed` uses — so a corpus document that
  * contains a benchmark item is caught by BOTH gates (shingle
  * containment lexically, cosine-1 chunks semantically). Re-run
  * (`sbt "Test/runMain graft.tools.GenBenchmarkFixtures"`) only when the
  * fixture contract changes. */
object GenBenchmarkFixtures {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-gen-benchmark")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val texts = Seq(
      (1L, "what is the capital of france the capital of france is paris"),
      (2L, "translate the following sentence into german the weather is nice today"),
      (3L, "solve for x if two x plus three equals eleven then x equals four"))
    val docs = texts.toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite")
      .parquet("examples/data/benchmark_eval.parquet")
    docs.select(col("doc_id").as("vec_id"),
        transform(graft.functions.TextFunctions.hashedTokenEmbedding(col("text"), 64),
          _.cast("float")).as("embedding"))
      .coalesce(1).write.mode("overwrite")
      .parquet("examples/data/benchmark_eval_vectors.parquet")
    println("[gen-benchmark] wrote examples/data/benchmark_eval{,_vectors}.parquet")
    spark.stop()
    sys.exit(0)
  }
}
