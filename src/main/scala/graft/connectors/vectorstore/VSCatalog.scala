package graft.connectors.vectorstore

import java.util
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.model.Canonical

/** DSv2 [[TableCatalog]] over a vector store: collections become
  * SQL-addressable tables, so `SELECT … FROM vs.collection`,
  * `CREATE TABLE vs.c (…) TBLPROPERTIES('distance'='Cosine')`,
  * `INSERT INTO vs.c SELECT …` and `DROP TABLE vs.c` all work from plain
  * `spark.sql` — the analog of pointing a SQL warehouse at the backend the
  * reference reaches only through per-adapter client code
  * (`adapters/qdrant.py`, `adapters/milvus.py`).
  *
  * Register per session:
  * {{{
  * spark.conf.set("spark.sql.catalog.vs", classOf[VSCatalog].getName)
  * spark.conf.set("spark.sql.catalog.vs.backend", "qdrant")   // default
  * }}}
  * Catalog options (everything after the catalog prefix) are forwarded to
  * every table, so e.g. `spark.sql.catalog.vs.page_size` tunes scans. The
  * tables are the same [[VSTable]] the path-based API serves: pushdown,
  * native search, COUNT(*) pushdown and write rules all apply to SQL.
  */
class VSCatalog extends TableCatalog {

  private var catalogName: String = _
  private var provider: VectorStoreProvider = _
  private var catalogOptions: CaseInsensitiveStringMap = _
  private var spec: TransportSpec = TransportSpec.Local
  /** The catalog's own endpoint (`spark.sql.catalog.vs.url` etc.) — each
    * registered catalog talks to ITS backend, so two catalogs on two urls
    * migrate between real endpoints in one INSERT…SELECT. */
  private def store: VectorStoreTransport = VectorStore.resolve(spec)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    catalogOptions = options
    val backend = Option(options.get("backend")).map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("qdrant")
    spec = TransportSpec.fromOptions(k => Option(options.get(k)), backend)
    provider = backend match {
      case "qdrant" => new QdrantProvider
      case "milvus" => new MilvusProvider
      case "pinecone" => new PineconeProvider
      case other => throw new IllegalArgumentException(
        s"unknown backend '$other' for catalog $name (qdrant|milvus|pinecone)")
    }
  }

  override def name(): String = catalogName

  /** Tables are single-level; a namespace part is joined into the Pinecone
    * `index::namespace` address the providers already understand. */
  private def collection(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("::")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString("::") + "::"
    store.listCollections()
      .filter(_.startsWith(prefix))
      .map(c => Identifier.of(namespace, c.stripPrefix(prefix)))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    store.exists(collection(ident))

  override def loadTable(ident: Identifier): Table = {
    val coll = collection(ident)
    if (!store.exists(coll)) throw new NoSuchTableException(ident)
    provider.getTable(null, Array.empty, tableProps(coll, util.Map.of()))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val coll = collection(ident)
    if (store.exists(coll)) throw new TableAlreadyExistsException(ident)
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException("vector-store tables are unpartitioned")
    val vectorType =
      Option(properties.get("vector_type")).map(_.toUpperCase(java.util.Locale.ROOT)).map { vt =>
        // unknown values must throw, not silently select the float face
        require(vt == VectorTypes.Float || vt == VectorTypes.Binary,
          s"unknown vector_type: ${properties.get("vector_type")} " +
            s"(valid: ${VectorTypes.Float}, ${VectorTypes.Binary})")
        vt
      }.getOrElse {
        // infer the collection face from the declared vector column type
        schema.fields.find(_.name == Canonical.VECTOR).map(_.dataType) match {
          case Some(org.apache.spark.sql.types.BinaryType) => VectorTypes.Binary
          case _ => VectorTypes.Float
        }
      }
    val canonical =
      if (vectorType == VectorTypes.Binary) Canonical.binarySchema else Canonical.schema
    // simpleString erases nullability — DDL-declared columns are nullable,
    // canonical containsNull differs, and neither matters for storage
    if (schema.simpleString != canonical.simpleString)
      throw new IllegalArgumentException(
        s"vector-store tables use the canonical schema ${canonical.simpleString}; got " +
          schema.simpleString)
    // the SAME alias-tolerant rule as the DataFrame write face — exact-
    // match here and alias-tolerant there would make `CREATE TABLE ...
    // ('distance'='cosine')` fail while df.write option("distance",
    // "cosine") succeeds on the same backend
    val binaryVec = vectorType == VectorTypes.Binary
    // capability check BEFORE createCollection: the write face would
    // reject binary on this backend anyway, but only after the catalog
    // had already created the collection — an orphan that makes the
    // corrected re-CREATE fail with TableAlreadyExists
    if (binaryVec && !provider.rules.binaryVectors)
      throw new IllegalArgumentException(
        s"${provider.shortName()} does not support BINARY_VECTOR collections")
    val distance = VSDistances.requireAllowed(
      Option(properties.get("distance")).getOrElse(if (binaryVec) "Hamming" else "Cosine"),
      provider.rules, binaryVec)
    store.createCollection(coll, CollectionConfig(
      distance = distance,
      dim = Option(properties.get("dim")).map(_.toInt).getOrElse(0),
      vectorType = vectorType), recreate = false)
    provider.getTable(null, Array.empty, tableProps(coll, properties))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE is not supported for vector stores")

  override def dropTable(ident: Identifier): Boolean = {
    val coll = collection(ident)
    val existed = store.exists(coll)
    if (existed) store.drop(coll)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported for vector stores")

  /** Catalog options + DDL properties + the collection address, as the
    * provider's option map (DDL properties win over catalog defaults). */
  private def tableProps(coll: String,
                         ddl: util.Map[String, String]): util.Map[String, String] = {
    val m = new util.HashMap[String, String](catalogOptions.asCaseSensitiveMap())
    m.remove("backend")
    m.putAll(ddl)
    m.put("collection", coll)
    m
  }
}
