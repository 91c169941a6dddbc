package graft.connectors

import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.config.QuerySpec
import graft.connectors.vectorstore.{CollectionConfig, VSRecord, VectorStore}
import graft.model.Canonical

/** Registry dispatch (M2) + schema introspection (M1) parity. */
class ConnectorSpec extends SparkSpec {

  test("registry: case-insensitive lookup, unknown type errors with valid list") {
    assert(ConnectorRegistry("PGVector").name == "pgvector")
    assert(ConnectorRegistry("QDRANT").name == "qdrant")
    assert(ConnectorRegistry.get("nope").isEmpty)
    val e = intercept[graft.config.ConfigException](ConnectorRegistry("nope"))
    assert(e.getMessage.contains("memory") && e.getMessage.contains("milvus"))
  }

  test("registry: programmatic registration (library surface parity)") {
    val custom = new MemoryConnector { override def name: String = "custom-backend" }
    ConnectorRegistry.register(custom)
    assert(ConnectorRegistry("Custom-Backend").name == "custom-backend")
  }

  test("memory connector schemaInfo infers dim + distance (get_schema_info parity)") {
    MemoryStore.put("si", Seq(
      Row("1", Seq(1f, 2f, 3f), Map("k" -> "v"))), Map("distance" -> "Dot"))
    val info = new MemoryConnector().schemaInfo(spark, Map.empty, "si")
    assert(info.vectorDim.contains(3))
    assert(info.distance.contains("Dot"))
    assert(info.schema == Canonical.schema)
  }

  test("vectorstore schemaInfo reads collection config then samples for dim") {
    VectorStore.createCollection("si2", CollectionConfig(distance = "Euclid", dim = 0),
      recreate = true)
    VectorStore.upsert("si2", Seq(VSRecord("a", Array(1f, 2f), Map.empty)))
    val info = ConnectorRegistry("qdrant").schemaInfo(spark, Map.empty, "si2")
    assert(info.vectorDim.contains(2)) // dim=0 declared -> sampled from first record
    assert(info.distance.contains("Euclid"))
  }

  test("parquet connector schemaInfo reports the file schema") {
    val info = new ParquetConnector().schemaInfo(spark, Map("path" -> sf()), "embeddings")
    assert(info.schema.fieldNames.toSeq == Seq("vec_id", "embedding", "label"))
  }

  test("parquet read applies defaults: no limit, full scan (pgvector default parity)") {
    val df = new ParquetConnector().read(spark, Map("path" -> sf()),
      QuerySpec(collection = "embeddings", idColumn = "vec_id",
        vectorColumn = Some("embedding"), metadataColumns = Seq("label")))
    assert(df.count() == 500)
    // same names and types; nullability flags may differ per source
    assert(df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ==
      Canonical.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
  }
}
