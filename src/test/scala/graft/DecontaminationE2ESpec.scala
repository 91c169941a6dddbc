package graft

import org.apache.spark.sql.functions._
import graft.connectors.vectorstore._
import graft.model.Canonical

/** The round's pieces as ONE story: a crawl parquet with planted
  * benchmark leakage, config-driven migration through BOTH
  * decontamination pipeline verbs (lexical before chunking, semantic
  * after — the shipped example's recipe), published into a Pinecone-wire
  * target in `atomic` mode, which on this backend is the namespace-
  * pointer flip. The published collection must hold the clean chunks,
  * none of the benchmark's, and the publish must have ridden the pointer
  * verb — the "user of the reference switches to this engine" path, end
  * to end on the wire. */
class DecontaminationE2ESpec extends SparkSpec {
  import spark.implicits._

  test("migrate -> decontaminate (both gates) -> atomic pointer-flip publish") {
    val server = new PineconeWireServer(new InMemoryStore)
    try {
      // crawl: two docs verbatim from the committed benchmark fixtures,
      // three clean docs long enough to clear the quality/shingle floor
      val crawl = Seq(
        (1L, "what is the capital of france the capital of france is paris"),
        (2L, "solve for x if two x plus three equals eleven then x equals four"),
        (10L, "spark builds a logical plan first and the optimizer rewrites it into physical operators"),
        (11L, "parquet files carry min max statistics per row group which scans use for pruning"),
        (12L, "broadcast joins ship the small side to every executor avoiding a shuffle of the fact table"))
        .toDF("doc_id", "text")
      val srcDir = java.nio.file.Files.createTempDirectory("decon_e2e").toString
      crawl.write.parquet(s"$srcDir/crawl.parquet")

      val cfg = graft.config.MigrationConfig.fromJson(
        s"""{"source": {"type": "parquet", "connection": {"path": "$srcDir"},
           |            "query": {"table_name": "crawl", "id_column": "doc_id",
           |                      "metadata_columns": ["text"]}},
           | "pipeline": [
           |   {"transform": "decontaminate",
           |    "eval_path": "examples/data/benchmark_eval.parquet", "ngram": 8},
           |   {"transform": "chunk_embed", "width": 64, "stride": 48, "dim": 64},
           |   {"transform": "semantic_decontaminate",
           |    "eval_path": "examples/data/benchmark_eval_vectors.parquet",
           |    "threshold": 0.95}],
           | "target": {"type": "pinecone",
           |            "connection": {"url": "${server.url}", "namespace": "prod"},
           |            "load": {"collection": "clean", "recreate": true,
           |                     "dimension": 64, "atomic": "true"}}}""".stripMargin)
      val report = new graft.core.Migrator(spark).run(cfg)
      assert(report.success, report.error)

      // read back through the DSv2 scan (pointer resolution transparent)
      val back = spark.read.format("graft-pinecone").option("url", server.url)
        .option("collection", "clean").option("namespace", "prod").load()
        .select(col(Canonical.ID),
          element_at(col(Canonical.METADATA), "parent_id").as("parent"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(back.nonEmpty, "clean chunks must have been published")
      val parents = back.map(_._2).toSet
      assert(parents == Set("10", "11", "12"),
        s"benchmark leakage survived into the published target: $parents")

      // the publish rode the namespace-pointer flip, not a copy
      assert(server.bodiesOf("POST /vectors/upsert").exists(_.contains("__graft_ptr::prod")),
        "atomic publish did not ride the pointer verb")
      val t = new PineconeWireTransport(server.url)
      assert(t.listCollections() == Seq("clean::prod"), t.listCollections().toString)
    } finally server.stop()
  }
}
