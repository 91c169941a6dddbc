package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Thrown on malformed configs — the engine's analog of the reference's
  * `ValueError`s in `cli/migrate.py:46-57`. */
final class ConfigException(msg: String) extends IllegalArgumentException(msg)

/** Source-side scan spec: the reference's `query` block
  * (`README.md:39-47`, consumed at `core/migrator.py:67-69`). All fields
  * optional — each connector applies its own defaults, mirroring the
  * per-adapter defaults (pgvector unlimited, Qdrant limit 1000, Milvus 100).
  */
case class QuerySpec(
    collection: String,
    idColumn: String = "id",
    vectorColumn: Option[String] = Some("vector"),
    metadataColumns: Seq[String] = Nil,
    limit: Option[Long] = None,
    offset: Option[Long] = None,
    filter: Option[String] = None)

/** Sink-side load spec: the reference's `load` block (`README.md:48-56`),
  * unified across backends (the reference's Milvus sink deviates from the
  * ABC — `adapters/milvus.py:132` vs `core/adapter.py:45` — we do not). */
case class LoadSpec(
    collection: String,
    idColumn: String = "id",
    vectorColumn: String = "vector",
    recreate: Boolean = false,
    batchSize: Int = 100,
    distance: String = "Cosine",
    dimension: Option[Int] = None,
    /** Repartition the frame to this many partitions before the write.
      * The knob that matters when the SOURCE cannot parallelize — a
      * cursor-paged wire scan (Qdrant/Pinecone) reads as ONE sequential
      * walk, so without it the transform + write would also run on one
      * task; one shuffle fans the rest of the pipeline back out. */
    parallelism: Option[Int] = None,
    options: Map[String, String] = Map.empty)

case class EndpointConfig(
    kind: String,
    connection: Map[String, String],
    query: Option[QuerySpec],
    load: Option[LoadSpec])

/** One step of a declarative transform pipeline: a registry name (see
  * [[graft.core.TransformPipeline]]) plus string params. In JSON, a step
  * is either a bare string (`"normalize_vectors"`) or an object whose
  * non-`transform` keys are the params
  * (`{"transform": "chunk_embed", "width": 64}`). */
case class TransformStep(name: String, params: Map[String, String] = Map.empty)

case class MigrationConfig(source: EndpointConfig, target: EndpointConfig,
                           /** Declarative transform chain, applied in
                             * order between read and write — the config
                             * face of the `--transform` hook, so a data
                             * team's whole recipe (gate → dedup → chunk →
                             * embed → layout) is one reviewable JSON
                             * block. */
                           pipeline: Seq[TransformStep] = Nil)

/** JSON config parser, drop-in compatible with the reference's shape
  * (`cli/migrate.py:167-196`) including the `*_params` key variant used by
  * the docker example config (`examples/pgvector_to_milvus_docker_config
  * .json`) that the reference documents but never reads — we accept both.
  */
object MigrationConfig {
  private val mapper = new ObjectMapper()

  def fromFile(path: String): MigrationConfig = {
    // Files.readString, not scala.io.Source: Source leaks the handle (no
    // close on this path) and decodes with the PLATFORM default charset —
    // a windows-1252 JVM would mojibake UTF-8 collection names/filters
    val text = try java.nio.file.Files.readString(
      java.nio.file.Path.of(path), java.nio.charset.StandardCharsets.UTF_8)
    catch { case e: java.io.IOException => throw new ConfigException(s"cannot read config: $e") }
    fromJson(text)
  }

  def fromJson(text: String): MigrationConfig = {
    val root = try mapper.readTree(text)
    catch { case e: Exception => throw new ConfigException(s"invalid JSON: ${e.getMessage}") }
    if (root == null || !root.isObject) throw new ConfigException("config must be a JSON object")
    MigrationConfig(endpoint(root, "source"), endpoint(root, "target"),
      pipeline = parsePipeline(root))
  }

  private def parsePipeline(root: JsonNode): Seq[TransformStep] =
    Option(root.get("pipeline")).map { arr =>
      if (!arr.isArray) throw new ConfigException("'pipeline' must be an array of steps")
      arr.elements().asScala.map { n =>
        if (n.isTextual) TransformStep(n.asText())
        else if (n.isObject) {
          val name = Option(n.get("transform")).orElse(Option(n.get("name")))
            .map(_.asText()).getOrElse(
              throw new ConfigException("pipeline step needs a 'transform' name"))
          TransformStep(name, strMap(n) - "transform" - "name")
        } else throw new ConfigException(s"bad pipeline step: $n")
      }.toSeq
    }.getOrElse(Nil)

  private def endpoint(root: JsonNode, side: String): EndpointConfig = {
    val node = Option(root.get(side))
      .getOrElse(throw new ConfigException(s"missing required '$side' block"))
    val kind = Option(node.get("type")).map(_.asText())
      .getOrElse(throw new ConfigException(s"'$side' block missing 'type'"))
    // tolerate both `connection` and `connection_params` (ditto query/load)
    def block(name: String): Option[JsonNode] =
      Option(node.get(name)).orElse(Option(node.get(s"${name}_params")))
    val conn = block("connection").map(strMap(_)).getOrElse(Map.empty)
    val query = block("query").map(parseQuery)
    val load = block("load").map(parseLoad)
    EndpointConfig(kind, conn, query, load)
  }

  /** Flatten a JSON object to string values: scalars via asText (numbers
    * like `"port": 5432` included), nulls dropped, nested objects
    * flattened with a `parent_` prefix (`hnsw_config: {m: 16}` →
    * `hnsw_m -> "16"`, the shape `examples/pgvector_to_qdrant_config.json`
    * uses). */
  private def strMap(n: JsonNode, prefix: String = ""): Map[String, String] =
    n.properties().asScala.flatMap { e =>
      val key = prefix + e.getKey
      val v = e.getValue
      if (v.isNull) Nil
      else if (v.isObject) strMap(v, key.stripSuffix("_config") + "_")
      else if (v.isArray)
        // ArrayNode.asText() is "" — a silently emptied param is worse
        // than a loud config error naming the key
        throw new ConfigException(
          s"'$key' is a JSON array — connection/load/step params take " +
            "scalar values (lists are not part of the reference's shape)")
      else Seq(key -> v.asText())
    }.toMap

  /** String list, tolerating a bare scalar as a one-element list — Jackson's
    * `elements()` on a TextNode is EMPTY, so `"metadata_columns": "lang"`
    * (the classic hand-written-config mistake) used to silently parse as
    * NO metadata columns and the migration dropped every metadata value
    * without a word. Anything else (numbers, objects) is a loud error. */
  private def strSeq(n: JsonNode): Seq[String] =
    if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
    else if (n.isTextual) Seq(n.asText())
    else throw new ConfigException(s"expected a string array, got: $n")

  /** Numeric field, loudly: Jackson coerces non-numeric nodes to 0
    * (`"limit": "abc"` → asLong 0 = "extract nothing"; `"batch_size":
    * {"n":5}` → 0 = grouped(0) crash far from the config). Numbers and
    * numeric STRINGS pass (the reference's configs carry both). */
  private def numLong(n: JsonNode, key: String): Long =
    if (n.isNumber) {
      // reject-don't-coerce applies to fractions too: asLong truncates
      // `"limit": 2.5` to 2 while the same value as a STRING errors —
      // integral-valued floats (2.0) pass, anything lossy is loud.
      // canConvertToLong additionally rejects out-of-range big integers.
      if (!n.canConvertToExactIntegral || !n.canConvertToLong)
        throw new ConfigException(s"'$key' must be an integer, got: $n")
      n.asLong()
    }
    else if (n.isTextual && n.asText().trim.toLongOption.isDefined) n.asText().trim.toLong
    else throw new ConfigException(s"'$key' must be a number, got: $n")

  private def numInt(n: JsonNode, key: String): Int = {
    val l = numLong(n, key)
    if (l < Int.MinValue || l > Int.MaxValue)
      throw new ConfigException(s"'$key' out of int range: $l")
    l.toInt
  }

  private def text(n: JsonNode, keys: String*): Option[String] =
    // filter JSON null NODES: {"vector_column": null} means "none", and an
    // unfiltered NullNode.asText() is the literal string "null" — which
    // would make the connector select a column named 'null'
    keys.iterator.flatMap(k => Option(n.get(k))).filterNot(_.isNull)
      .map(_.asText()).nextOption()

  private def parseQuery(n: JsonNode): QuerySpec = QuerySpec(
    // backends name the scan target differently: table_name (pgvector),
    // collection_name (qdrant/milvus), index_name (pinecone)
    collection = text(n, "collection_name", "table_name", "index_name", "collection", "table")
      .getOrElse(throw new ConfigException("query block needs a collection/table/index name")),
    idColumn = text(n, "id_column").getOrElse("id"),
    vectorColumn = text(n, "vector_column").orElse(Some("vector")),
    metadataColumns = Option(n.get("metadata_columns"))
      .filterNot(_.isNull).map(strSeq).getOrElse(Nil),
    // filterNot(isNull) everywhere a generated config may carry an explicit
    // JSON null: NullNode coerces to 0 (limit 0 -> "no data extracted") or
    // the literal string "null" — "absent" is the only sane reading
    limit = Option(n.get("limit")).filterNot(_.isNull).map(numLong(_, "limit")),
    offset = Option(n.get("offset")).filterNot(_.isNull).map(numLong(_, "offset")),
    filter = Seq("filter_condition", "filter_expr", "filter").iterator
      .flatMap(k => Option(n.get(k))).filterNot(_.isNull)
      // Qdrant filters are JSON objects, pgvector/milvus are strings
      .map(fn => if (fn.isTextual) fn.asText() else fn.toString)
      .nextOption())

  private def parseLoad(n: JsonNode): LoadSpec = LoadSpec(
    collection = text(n, "collection_name", "table_name", "index_name", "collection", "table")
      .getOrElse(throw new ConfigException("load block needs a collection/table/index name")),
    idColumn = text(n, "id_column").getOrElse("id"),
    vectorColumn = text(n, "vector_column").getOrElse("vector"),
    recreate = Seq("recreate_table", "recreate_collection", "create_index", "recreate")
      .exists(k => Option(n.get(k)).exists(_.asBoolean(false))),
    batchSize = Option(n.get("batch_size")).filterNot(_.isNull)
      .map(numInt(_, "batch_size")).getOrElse(100),
    distance = text(n, "distance", "metric").getOrElse("Cosine"),
    dimension = Option(n.get("dimension")).filterNot(_.isNull)
      .map(numInt(_, "dimension")),
    parallelism = Option(n.get("parallelism")).filterNot(_.isNull)
      .map(numInt(_, "parallelism")),
    options = strMap(n) -- Set("collection_name", "table_name", "index_name", "collection",
      "table", "id_column", "vector_column", "recreate_table", "recreate_collection",
      "create_index", "recreate", "batch_size", "distance", "metric", "dimension",
      "parallelism"))
}
