package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("parses the reference config shape") {
    val cfg = MigrationConfig.fromJson(
      """{
        |  "source": {
        |    "type": "pgvector",
        |    "connection": {"host": "localhost", "port": "5432", "database": "vectordb"},
        |    "query": {"table_name": "embeddings", "id_column": "id",
        |              "vector_column": "embedding", "metadata_columns": ["name", "cat"],
        |              "limit": 100, "offset": 5, "filter_condition": "cat = 'a'"}
        |  },
        |  "target": {
        |    "type": "qdrant",
        |    "connection": {"url": "http://localhost:6333"},
        |    "load": {"collection_name": "vectors", "recreate_collection": true,
        |             "distance": "Cosine", "batch_size": 500}
        |  }
        |}""".stripMargin)
    assert(cfg.source.kind == "pgvector")
    val q = cfg.source.query.get
    assert(q.collection == "embeddings" && q.idColumn == "id")
    assert(q.vectorColumn.contains("embedding"))
    assert(q.metadataColumns == Seq("name", "cat"))
    assert(q.limit.contains(100L) && q.offset.contains(5L))
    assert(q.filter.contains("cat = 'a'"))
    val l = cfg.target.load.get
    assert(l.collection == "vectors" && l.recreate && l.distance == "Cosine" && l.batchSize == 500)
    assert(l.parallelism.isEmpty) // absent -> no repartition
  }

  test("load.parallelism parses and stays out of the passthrough options") {
    val cfg = MigrationConfig.fromJson(
      """{"source": {"type": "memory", "connection": {},
        |            "query": {"collection": "c"}},
        | "target": {"type": "memory", "connection": {},
        |            "load": {"collection": "d", "parallelism": 8,
        |                     "shard_key": "s"}}}""".stripMargin)
    val l = cfg.target.load.get
    assert(l.parallelism.contains(8))
    assert(l.options == Map("shard_key" -> "s"), l.options.toString)
  }

  test("tolerates the docker example's *_params key variant") {
    // examples/pgvector_to_milvus_docker_config.json uses connection_params/
    // query_params/load_params, which the reference silently ignores — we accept both
    val cfg = MigrationConfig.fromJson(
      """{"source": {"type": "milvus", "connection_params": {"host": "h"},
        |            "query_params": {"collection_name": "c"}},
        | "target": {"type": "parquet", "connection_params": {"path": "/tmp"},
        |            "load_params": {"table_name": "t"}}}""".stripMargin)
    assert(cfg.source.connection == Map("host" -> "h"))
    assert(cfg.source.query.get.collection == "c")
    assert(cfg.target.load.get.collection == "t")
  }

  test("qdrant structured filters stay JSON") {
    val cfg = MigrationConfig.fromJson(
      """{"source": {"type": "qdrant", "connection": {},
        |            "query": {"collection_name": "c",
        |                      "filter": {"must": [{"key": "cat", "match": {"value": "x"}}]}}},
        | "target": {"type": "memory", "connection": {}, "load": {"collection": "out"}}}""".stripMargin)
    val f = cfg.source.query.get.filter.get
    assert(f.contains("\"must\"") && f.contains("\"cat\""))
  }

  test("missing blocks and types raise ConfigException like the reference's ValueError") {
    assertThrows[ConfigException](MigrationConfig.fromJson("""{"target": {"type": "x"}}"""))
    assertThrows[ConfigException](MigrationConfig.fromJson("""{"source": {"type": "x"}}"""))
    assertThrows[ConfigException](MigrationConfig.fromJson("""{"source": {}, "target": {"type":"x"}}"""))
    assertThrows[ConfigException](MigrationConfig.fromJson("not json"))
  }

  test("parses every shipped reference example config verbatim (drop-in compat)") {
    val dir = new java.io.File("/root/reference/examples")
    val examples = dir.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)
    assert(examples.length >= 6)
    examples.foreach { f =>
      val cfg = MigrationConfig.fromFile(f.getAbsolutePath)
      assert(cfg.source.kind.nonEmpty && cfg.target.kind.nonEmpty, f.getName)
    }
    // spot-check the richest one: numeric ports, null api_key, nested hnsw
    val q = MigrationConfig.fromFile("/root/reference/examples/pgvector_to_qdrant_config.json")
    assert(q.source.connection("port") == "5432") // numeric value stringified
    assert(q.source.query.get.filter.contains("category = 'product'"))
    assert(q.target.load.get.batchSize == 500)
    assert(q.target.load.get.distance == "cosine") // normalized at the sink
    assert(q.target.load.get.options.get("hnsw_m").contains("16")) // nested flatten
    assert(q.target.load.get.options.get("hnsw_ef_construct").contains("100"))
    assert(!q.target.connection.contains("api_key")) // null dropped
    // the docker example's *_params variant parses too
    val d = MigrationConfig.fromFile(
      "/root/reference/examples/pgvector_to_milvus_docker_config.json")
    assert(d.source.kind == "pgvector" && d.target.kind == "milvus")
  }

  test("defaults: limit absent, batch 100, distance Cosine") {
    val cfg = MigrationConfig.fromJson(
      """{"source": {"type": "memory", "connection": {}, "query": {"collection": "a"}},
        | "target": {"type": "memory", "connection": {}, "load": {"collection": "b"}}}""".stripMargin)
    assert(cfg.source.query.get.limit.isEmpty)
    assert(cfg.target.load.get.batchSize == 100)
    assert(cfg.target.load.get.distance == "Cosine")
  }

  test("explicit JSON null values mean absent, never the literal string \"null\"") {
    // {"vector_column": null} used to become Some("null") and the
    // connector selected a column literally named 'null'
    val cfg = MigrationConfig.fromJson(
      """{"source": {"type": "memory", "connection": {},
        |            "query": {"collection": "a", "vector_column": null,
        |                      "id_column": null}},
        | "target": {"type": "memory", "connection": {}, "load": {"collection": "b"}}}"""
        .stripMargin)
    assert(cfg.source.query.get.vectorColumn.contains("vector")) // default, not "null"
    assert(cfg.source.query.get.idColumn == "id")
  }

  test("mix_token_budget params fail as ConfigException naming the param, never MatchError") {
    import graft.core.TransformPipeline
    import graft.config.TransformStep
    val bad = intercept[ConfigException] {
      TransformPipeline.resolve(TransformStep("mix_token_budget",
        Map("shares" -> "web:0.6,books:0.4", "total_tokens" -> "1000")))
    }
    assert(bad.getMessage.contains("shares"), bad.getMessage)
    val badTotal = intercept[ConfigException] {
      TransformPipeline.resolve(TransformStep("mix_token_budget",
        Map("shares" -> "web=0.6", "total_tokens" -> "1e9")))
    }
    assert(badTotal.getMessage.contains("total_tokens"), badTotal.getMessage)
  }

  test("pipeline block: string steps, object steps with inline params, errors") {
    val cfg = MigrationConfig.fromJson(
      """{"source": {"type": "memory", "connection": {}, "query": {"collection": "a"}},
        | "target": {"type": "memory", "connection": {}, "load": {"collection": "b"}},
        | "pipeline": ["normalize_vectors",
        |              {"transform": "quality_gate", "min_score": 0.5},
        |              {"transform": "chunk_embed", "width": 32, "stride": 16}]}""".stripMargin)
    assert(cfg.pipeline.map(_.name) ==
      Seq("normalize_vectors", "quality_gate", "chunk_embed"))
    assert(cfg.pipeline(1).params == Map("min_score" -> "0.5"))
    assert(cfg.pipeline(2).params == Map("width" -> "32", "stride" -> "16"))
    // absent block → empty pipeline
    assert(MigrationConfig.fromJson(
      """{"source": {"type": "memory", "connection": {}, "query": {"collection": "a"}},
        | "target": {"type": "memory", "connection": {}, "load": {"collection": "b"}}}"""
        .stripMargin).pipeline.isEmpty)
    // malformed step aborts parse
    intercept[ConfigException] {
      MigrationConfig.fromJson(
        """{"source": {"type": "memory", "connection": {}, "query": {"collection": "a"}},
          | "target": {"type": "memory", "connection": {}, "load": {"collection": "b"}},
          | "pipeline": [{"min_score": 0.5}]}""".stripMargin)
    }
  }

  test("TransformPipeline: unknown names and bad params fail at resolve time") {
    intercept[ConfigException] {
      graft.core.TransformPipeline.resolve(TransformStep("no_such_op"))
    }
    intercept[ConfigException] {
      graft.core.TransformPipeline.resolve(
        TransformStep("chunk_embed", Map("width" -> "not_a_number")))
    }
    intercept[ConfigException] {
      graft.core.TransformPipeline.resolve(
        TransformStep("class", Map("class_name" -> "does.not.Exist")))
    }
    // a valid chain composes
    assert(graft.core.TransformPipeline.compose(Seq(
      TransformStep("quality_gate"), TransformStep("exact_dedup"),
      TransformStep("chunk_embed"))).isDefined)
    assert(graft.core.TransformPipeline.compose(Nil).isEmpty)
  }

  test("metadata_columns: scalar means one column, null means none, junk is loud") {
    def cfg(mc: String) = MigrationConfig.fromJson(
      s"""{"source": {"type": "parquet", "connection": {"path": "/x"},
         |  "query": {"collection_name": "t", $mc "id_column": "id"}},
         | "target": {"type": "parquet", "connection": {"path": "/y"},
         |  "load": {"collection_name": "u"}}}""".stripMargin)
    // a bare string is ONE column — Jackson's elements() on a TextNode is
    // empty, so this used to silently parse as NO metadata columns and the
    // migration dropped every metadata value without a word
    assert(cfg(""""metadata_columns": "lang",""").source.query.get
      .metadataColumns == Seq("lang"))
    assert(cfg(""""metadata_columns": ["lang", "cat"],""").source.query.get
      .metadataColumns == Seq("lang", "cat"))
    assert(cfg(""""metadata_columns": null,""").source.query.get
      .metadataColumns == Nil)
    assert(cfg("").source.query.get.metadataColumns == Nil)
    val e = intercept[ConfigException] { cfg(""""metadata_columns": 7,""") }
    assert(e.getMessage.contains("string array"))
  }

  test("numeric fields reject non-numeric values instead of coercing to 0") {
    def cfg(extra: String) = MigrationConfig.fromJson(
      s"""{"source": {"type": "parquet", "connection": {"path": "/x"},
         |  "query": {"collection_name": "t", $extra "id_column": "id"}},
         | "target": {"type": "parquet", "connection": {"path": "/y"},
         |  "load": {"collection_name": "u"}}}""".stripMargin)
    // "abc" used to asLong() to 0 — limit 0 = a migration that silently
    // extracts NOTHING and reports success
    val e = intercept[ConfigException] { cfg(""""limit": "abc",""") }
    assert(e.getMessage.contains("limit"))
    // numeric strings stay accepted (configs in the wild carry both)
    assert(cfg(""""limit": "250",""").source.query.get.limit.contains(250L))
    assert(cfg(""""limit": 250,""").source.query.get.limit.contains(250L))
    // fractional NUMBERS reject like fractional strings (2.5 used to
    // silently truncate to 2 via asLong while "2.5" errored); integral
    // floats and out-of-range big integers follow the same rule
    val ef = intercept[ConfigException] { cfg(""""limit": 2.5,""") }
    assert(ef.getMessage.contains("limit") && ef.getMessage.contains("integer"),
      ef.getMessage)
    assert(cfg(""""limit": 250.0,""").source.query.get.limit.contains(250L))
    intercept[ConfigException] { cfg(""""limit": 99999999999999999999999999,""") }
    intercept[ConfigException] {
      MigrationConfig.fromJson(
        """{"source": {"type": "parquet", "connection": {"path": "/x"},
          |  "query": {"collection_name": "t"}},
          | "target": {"type": "parquet", "connection": {"path": "/y"},
          |  "load": {"collection_name": "u", "batch_size": "fast"}}}""".stripMargin)
    }
  }
}
