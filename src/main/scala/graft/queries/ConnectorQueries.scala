package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.config.QuerySpec
import graft.connectors.{ConnectorRegistry, ParquetConnector}
import graft.model.Canonical

/** Connector-path queries: the reference's scan surface (S1–S3 with P1–P3
  * pushdown) driven through the engine's actual connectors, checked against
  * plain-SQL oracles. Each query loads the fixture into the emulated
  * backend (idempotent upsert) and reads it back through the DSv2 scan with
  * a backend-native filter — so the driver's gate covers the full
  * config → connector → pushdown → canonical-DataFrame path.
  */
object ConnectorQueries {

  /** embeddings fixture → canonical rows in the vector store, keyed by
    * collection; idempotent (overwrite) so repeated runs are stable. */
  private def loadFixture(s: SparkSession, dir: String, fmt: String, coll: String): Unit = {
    Canonical.from(Tables(s, dir, "embeddings"),
      idCol = "vec_id", vectorCol = Some("embedding"), metadataCols = Seq("label"))
      .write.format(fmt).option("collection", coll).option("recreate", "true")
      .mode("overwrite").save()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1-path: parquet connector scan with projection/filter/limit pushdown
    "q_connector_scan" -> ((s, dir) =>
      new ParquetConnector().read(s, Map("path" -> dir), QuerySpec(
        collection = "embeddings", idColumn = "vec_id", vectorColumn = Some("embedding"),
        metadataColumns = Seq("label"), filter = Some("label >= 8")))
        .select(col(Canonical.ID), element_at(col(Canonical.METADATA), "label").as("label"))),

    // S2-path: Qdrant DSv2 scan, JSON structured filter pushed down
    "q_connector_qdrant" -> ((s, dir) => {
      loadFixture(s, dir, "graft-qdrant", "gate_q")
      ConnectorRegistry("qdrant").read(s, Map.empty, QuerySpec(
        collection = "gate_q",
        filter = Some("""{"must":[{"key":"label","range":{"gte":5}},
                        |         {"must_not":[{"key":"label","match":{"value":7}}]}]}""".stripMargin)))
        .select(col(Canonical.ID), element_at(col(Canonical.METADATA), "label").as("label"))
    }),

    // S3-path: Milvus DSv2 scan, boolean-expression filter pushed down
    "q_connector_milvus" -> ((s, dir) => {
      loadFixture(s, dir, "graft-milvus", "gate_m")
      ConnectorRegistry("milvus").read(s, Map.empty, QuerySpec(
        collection = "gate_m",
        filter = Some("label >= 3 && label < 6 || label == 9")))
        .select(col(Canonical.ID), element_at(col(Canonical.METADATA), "label").as("label"))
    }),

    // S4-path: Pinecone (implemented; empty module in the reference)
    "q_connector_pinecone" -> ((s, dir) => {
      loadFixture(s, dir, "graft-pinecone", "gate_p::ns")
      // no limit here: the store's insertion order is task-commit order, so
      // a pushed limit would be a nondeterministic subset (pushed-limit
      // behavior is spec-tested instead, VectorStoreSpec)
      ConnectorRegistry("pinecone").read(s, Map("namespace" -> "ns"), QuerySpec(
        collection = "gate_p",
        filter = Some("""{"must":[{"key":"label","match":{"value":1}}]}""")))
        .select(col(Canonical.ID), element_at(col(Canonical.METADATA), "label").as("label"))
    }),

    "q_connector_search" -> ((s, dir) => searchQuery(s, dir)),

    // M4 end-to-end: the full config-driven pipeline (read → transform →
    // write) through Migrator, then the target collection read back — the
    // reference's whole program as one checkable query
    "q_migrate_e2e" -> ((s, dir) => {
      val cfg = graft.config.MigrationConfig.fromJson(
        s"""{"source": {"type": "parquet", "connection": {"path": "$dir"},
           |            "query": {"table_name": "embeddings", "id_column": "vec_id",
           |                      "vector_column": "embedding",
           |                      "metadata_columns": ["label"]}},
           | "target": {"type": "memory", "connection": {},
           |            "load": {"collection": "gate_mig", "recreate": true}}}""".stripMargin)
      val report = new graft.core.Migrator(s).run(cfg,
        transform = Some(graft.ops.Transforms.addSourceTracking("pgvector", "t0")))
      require(report.success, report.error)
      graft.connectors.ConnectorRegistry("memory")
        .read(s, Map.empty, QuerySpec(collection = "gate_mig"))
        .select(col(Canonical.ID),
          element_at(col(Canonical.METADATA), "label").as("label"),
          element_at(col(Canonical.METADATA), "source_db").as("source_db"))
    })
  )

  /** Native-search pushdown: ORDER BY cosine DESC LIMIT k over the DSv2
    * relation — [[graft.plans.PushVectorSearch]] rewrites it so each scan
    * partition emits only its local top-k. */
  def searchQuery(s: SparkSession, dir: String): DataFrame = {
    loadFixture(s, dir, "graft-qdrant", "gate_srch")
    val qv = Canonical.from(Tables(s, dir, "embeddings"),
      idCol = "vec_id", vectorCol = Some("embedding"), metadataCols = Nil)
      .filter(col(Canonical.ID) === "0").select(col(Canonical.VECTOR))
      .head().getSeq[Float](0).toSeq
    val df = s.read.format("graft-qdrant").option("collection", "gate_srch").load()
    df.withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc)
      .limit(10)
      .select(col(Canonical.ID), round(col("score"), 6).as("score"))
  }

  def oracleSql: Map[String, String] = Map(
    "q_connector_search" ->
      ("WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) v FROM embeddings WHERE vec_id = 0), " +
        "c AS (SELECT CAST(vec_id AS VARCHAR) AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        "s AS (SELECT id, list_dot_product(e, v)/(sqrt(list_dot_product(e, e))*sqrt(list_dot_product(v, v))) AS sc " +
        "FROM c, qv) " +
        "SELECT id, round(sc, 6) AS score FROM s ORDER BY sc DESC, id ASC LIMIT 10"),
    "q_connector_scan" ->
      ("SELECT CAST(vec_id AS VARCHAR) AS id, CAST(label AS VARCHAR) AS label " +
        "FROM embeddings WHERE label >= 8"),
    "q_connector_qdrant" ->
      ("SELECT CAST(vec_id AS VARCHAR) AS id, CAST(label AS VARCHAR) AS label " +
        "FROM embeddings WHERE label >= 5 AND NOT label = 7"),
    "q_connector_milvus" ->
      ("SELECT CAST(vec_id AS VARCHAR) AS id, CAST(label AS VARCHAR) AS label " +
        "FROM embeddings WHERE (label >= 3 AND label < 6) OR label = 9"),
    "q_connector_pinecone" ->
      ("SELECT CAST(vec_id AS VARCHAR) AS id, CAST(label AS VARCHAR) AS label " +
        "FROM embeddings WHERE label = 1"),
    "q_migrate_e2e" ->
      ("SELECT CAST(vec_id AS VARCHAR) AS id, CAST(label AS VARCHAR) AS label, " +
        "'pgvector' AS source_db FROM embeddings")
  )
}
