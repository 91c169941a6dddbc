package graft.connectors

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.config.QuerySpec

class PgVectorSpec extends SparkSpec {
  import spark.implicits._

  test("pgvector text codec round-trips random float vectors (property-style)") {
    val rnd = new scala.util.Random(0)
    val vecs = Seq.fill(50)(Seq.fill(8)(rnd.nextFloat() * 2e6f - 1e6f))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val out = df
      .select(PgVectorCodec.textToVector(PgVectorCodec.vectorToText(col("v"))).as("v"))
      .as[Seq[Float]].collect()
    assert(out.toSeq == vecs)
  }

  test("codec text format matches pgvector literals") {
    val df = Seq(Tuple1(Seq(0.5f, -1.25f, 3.0f))).toDF("v")
    val s = df.select(PgVectorCodec.vectorToText(col("v"))).as[String].head()
    assert(s == "[0.5,-1.25,3.0]")
    val back = df.sparkSession.sql("SELECT ' [0.5, -1.25, 3.0] ' AS t")
      .select(PgVectorCodec.textToVector(col("t")).as("v")).as[Seq[Float]].head()
    assert(back == Seq(0.5f, -1.25f, 3.0f))
  }

  test("codec handles null and empty") {
    val res = spark.sql("SELECT CAST(NULL AS STRING) AS t UNION ALL SELECT ''")
      .select(PgVectorCodec.textToVector(col("t")).as("v")).as[Option[Seq[Float]]].collect()
    assert(res.forall(_.isEmpty))
  }

  test("buildSelect reproduces the reference's scan SQL (adapters/pgvector.py:94-108)") {
    val c = new PgVectorConnector()
    val sql = c.buildSelect(QuerySpec(
      collection = "items", idColumn = "id", vectorColumn = Some("embedding"),
      metadataColumns = Seq("name", "category"),
      limit = Some(100), offset = Some(10), filter = Some("category = 'x'")))
    assert(sql == "SELECT id, embedding::text AS embedding, name, category FROM items" +
      " WHERE category = 'x' LIMIT 100 OFFSET 10")
  }

  test("buildSelect rejects SQL-injection identifiers (reference defect fixed)") {
    val c = new PgVectorConnector()
    assertThrows[IllegalArgumentException] {
      c.buildSelect(QuerySpec(collection = "items; DROP TABLE x", idColumn = "id",
        vectorColumn = None, metadataColumns = Nil))
    }
  }

  test("catalogPredicate matches Postgres case folding and schema qualifiers") {
    val c = new PgVectorConnector()
    val Visible = " AND table_schema = ANY (current_schemas(false))"
    // the unquoted JDBC write path case-folds: the probe must match the
    // folded name too, or an existing 'MyTable' target reads as absent and
    // the incremental migrator full-copy re-appends
    // unqualified names are additionally pinned to VISIBLE schemas — a
    // same-named relation in an unrelated schema must not read as present
    assert(c.catalogPredicate("MyTable") ==
      "table_name IN ('MyTable', 'mytable')" + Visible)
    assert(c.catalogPredicate("items") == "table_name IN ('items')" + Visible)
    assert(c.catalogPredicate("Analytics.Embeddings") ==
      "table_name IN ('Embeddings', 'embeddings') " +
        "AND table_schema IN ('Analytics', 'analytics')")
    // still ident-whitelisted before interpolation
    assertThrows[IllegalArgumentException] {
      c.catalogPredicate("x'; DROP TABLE y--")
    }
    // cross-database references and trailing-dot typos are rejected, not
    // silently truncated into a different table's predicate
    assertThrows[IllegalArgumentException] {
      c.catalogPredicate("mydb.analytics.embeddings")
    }
    assertThrows[IllegalArgumentException] { c.catalogPredicate("items.") }
    // schemaInfo's two-step resolution uses single-name modes
    assert(c.catalogPredicate("MyTable", "verbatim") ==
      "table_name IN ('MyTable')" + Visible)
    assert(c.catalogPredicate("MyTable", "folded") ==
      "table_name IN ('mytable')" + Visible)
    // column introspection pins the FIRST visible schema holding the
    // table (search_path resolution order), not any-visible membership —
    // a same-named table in two visible schemas must not interleave
    val first = c.catalogPredicate("MyTable", "verbatim", firstVisibleOnly = true)
    assert(first.startsWith("table_name IN ('MyTable') AND table_schema = (SELECT"))
    assert(first.contains("WITH ORDINALITY") && first.contains("ORDER BY s.ord LIMIT 1"))
    assert(first.contains("t2.table_name IN ('MyTable')"))
    // qualified references are unaffected by the flag
    assert(c.catalogPredicate("a.b", "verbatim", firstVisibleOnly = true) ==
      "table_name IN ('b') AND table_schema IN ('a')")
  }
}
