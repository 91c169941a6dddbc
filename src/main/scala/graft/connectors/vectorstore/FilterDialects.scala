package graft.connectors.vectorstore

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import scala.jdk.CollectionConverters._

/** Backend filter dialects, both directions:
  *
  *  - `parse`: backend-native filter (config `query.filter`) → Spark Column,
  *    replacing the reference's pass-the-string-through model
  *    (`adapters/pgvector.py:99`, `adapters/qdrant.py:105`,
  *    `adapters/milvus.py:102`) with a parsed, optimizable predicate.
  *  - `render`: Catalyst pushdown [[Filter]]s → backend filter syntax, the
  *    DSv2 `SupportsPushDownFilters` side the reference never had.
  *
  * Predicates reference the canonical columns: `id`, or `metadata.<key>`
  * (rendered per backend's addressing: payload keys for Qdrant, scalar
  * fields for Milvus, SQL columns for pgvector).
  */
trait FilterDialect extends Serializable {
  def name: String
  /** Backend-native filter string → Spark Column over canonical schema. */
  def parse(filter: String): Column
  /** Catalyst pushdown filter → backend-native syntax; None = unsupported
    * (Spark re-applies it post-scan — an upgrade on the reference, which
    * cannot evaluate anything engine-side). */
  def render(f: Filter): Option[String]

  /** The attribute the engine's parallel cursor slices may range-filter to
    * address a record's numeric identity server-side, or None when the
    * backend has no such face (metadata-only filter languages, or APIs
    * that cannot range-filter any id-valued field). Qdrant cannot filter
    * POINT ids by range, so its writer mirrors numeric ids into the
    * reserved `__gid` numeric payload field and slices address that —
    * real payload range filters, wire-honest end to end. */
  def idSliceAttribute: Option[String] = None

  /** AND-combine several rendered filters into ONE backend predicate —
    * what actually travels on the wire (scroll/search filter body).
    * Default joins with the expression languages' `AND`; the Qdrant
    * dialect overrides with a `must` clause list. */
  def combine(rendered: Seq[String]): Option[String] =
    rendered.reduceOption((a, b) => s"($a) AND ($b)")
}

private object DialectUtil {
  import graft.model.Canonical

  private val MetaPrefix = Canonical.METADATA + "."

  /** Backend filter languages can address the id or a metadata KEY — not
    * the bare map/vector columns. Renderers must refuse anything else
    * (e.g. Spark's inferred `IsNotNull(metadata)` on the map column),
    * otherwise the reader would treat "metadata" as a key lookup and
    * filter every record out. */
  def addressable(name: String): Boolean =
    name == Canonical.ID || name.startsWith(MetaPrefix)

  /** The bare canonical map/vector columns, which no backend filter
    * language can address — shared with [[SqlWhereDialect.sqlAddressable]]
    * so the two guards cannot desynchronize under a canonical rename. */
  def bareCanonical(name: String): Boolean =
    name == Canonical.METADATA || name == Canonical.VECTOR

  /** Canonical column for an attribute name: `id` stays, anything else is a
    * metadata key lookup. */
  def attr(name: String): Column =
    if (name == Canonical.ID) col(Canonical.ID)
    else element_at(col(Canonical.METADATA), stripMeta(name))

  def stripMeta(name: String): String =
    if (name.startsWith(MetaPrefix)) name.substring(MetaPrefix.length) else name

  def litStr(v: Any): String = v match {
    case s: String => s"'${s.replace("'", "''")}'"
    case other => String.valueOf(other)
  }

  /** Metadata values are strings in canonical shape; compare numerically
    * when the literal is numeric. */
  def cmp(name: String, v: Any): (Column, Column) = v match {
    case n: Number => (attr(name).cast("double"), lit(n.doubleValue()))
    case other => (attr(name), lit(String.valueOf(other)))
  }
}

/** SQL WHERE dialect (pgvector): `parse` delegates to Spark's SQL parser —
  * the filter is a SQL boolean expression over id/metadata keys. */
class SqlWhereDialect extends FilterDialect {
  import DialectUtil._
  override def name: String = "sql"

  override def parse(filter: String): Column = expr(filter)

  /** SQL-land addressability: unlike the structured dialects, metadata
    * keys here are real SQL COLUMNS (the pgvector model), so any bare
    * column name is addressable — EXCEPT the canonical map/vector columns
    * themselves. Spark infers `IsNotNull(metadata)` on the map column,
    * and rendering it as a column reference would scan a column that
    * does not exist backend-side (the silent zero-row mode the three
    * structured dialects guard with [[DialectUtil.addressable]]). */
  private def sqlAddressable(name: String): Boolean = !bareCanonical(name)

  override def render(f: Filter): Option[String] = f match {
    case EqualTo(a, v) if sqlAddressable(a) => Some(s"${stripMeta(a)} = ${litStr(v)}")
    case GreaterThan(a, v) if sqlAddressable(a) => Some(s"${stripMeta(a)} > ${litStr(v)}")
    case GreaterThanOrEqual(a, v) if sqlAddressable(a) => Some(s"${stripMeta(a)} >= ${litStr(v)}")
    case LessThan(a, v) if sqlAddressable(a) => Some(s"${stripMeta(a)} < ${litStr(v)}")
    case LessThanOrEqual(a, v) if sqlAddressable(a) => Some(s"${stripMeta(a)} <= ${litStr(v)}")
    case In(a, vs) if sqlAddressable(a) => Some(s"${stripMeta(a)} IN (${vs.map(litStr).mkString(", ")})")
    case IsNull(a) if sqlAddressable(a) => Some(s"${stripMeta(a)} IS NULL")
    case IsNotNull(a) if sqlAddressable(a) => Some(s"${stripMeta(a)} IS NOT NULL")
    case StringStartsWith(a, p) if sqlAddressable(a) => Some(s"${stripMeta(a)} LIKE ${litStr(p + "%")}")
    case And(l, r) => for { ls <- render(l); rs <- render(r) } yield s"($ls AND $rs)"
    case Or(l, r) => for { ls <- render(l); rs <- render(r) } yield s"($ls OR $rs)"
    case Not(c) => render(c).map(s => s"NOT ($s)")
    case _ => None
  }
}

/** Qdrant structured-filter dialect: JSON `{"must":[{"key":k,"match":
  * {"value":v}}], "should":[...], "must_not":[...]}` with `match`/`range`
  * conditions — the shape the reference forwards verbatim
  * (`adapters/qdrant.py:84,105`; example in
  * `examples/qdrant_to_pgvector_config.json`). */
class QdrantFilterDialect extends FilterDialect {
  import DialectUtil._
  override def name: String = "qdrant"
  @transient private lazy val mapper = new ObjectMapper()

  /** Cursor slices range-filter the reserved numeric `__gid` payload field
    * the Qdrant writer mirrors numeric ids into ([[QdrantWireTransport
    * .upsert]]) — real Qdrant evaluates numeric payload ranges, point-id
    * ranges do not exist on its wire. */
  override def idSliceAttribute: Option[String] = Some("metadata.__gid")

  /** Each rendered filter is already a complete clause object, so the AND
    * of several is a `must` list of them. */
  override def combine(rendered: Seq[String]): Option[String] =
    if (rendered.length <= 1) rendered.headOption
    else Some(rendered.mkString("""{"must":[""", ",", "]}"))

  override def parse(filter: String): Column = {
    val root = mapper.readTree(filter)
    parseClauseList(root)
  }

  /** Clause lists must BE lists: Jackson's `elements()` on a scalar is
    * empty, so `{"must": "lang=en"}` (a malformed hand-written filter)
    * would silently parse as NO constraints — a subset migration quietly
    * copying the whole collection. Real Qdrant 400s on the shape. */
  private def jarr(n: JsonNode, what: String): Seq[JsonNode] = {
    if (!n.isArray) throw new IllegalArgumentException(
      s"qdrant filter: '$what' must be an array, got: $n")
    n.elements().asScala.toSeq
  }

  private def parseClauseList(n: JsonNode): Column = {
    def conds(key: String): Seq[Column] =
      Option(n.get(key)).map(v => jarr(v, key).map(parseCond)).getOrElse(Nil)
    val must = conds("must")
    val should = conds("should")
    val mustNot = conds("must_not")
    val parts =
      (if (must.nonEmpty) Seq(must.reduce(_ && _)) else Nil) ++
        (if (should.nonEmpty) Seq(should.reduce(_ || _)) else Nil) ++
        (if (mustNot.nonEmpty) Seq(!mustNot.reduce(_ || _)) else Nil)
    if (parts.isEmpty) lit(true) else parts.reduce(_ && _)
  }

  private def parseCond(c: JsonNode): Column = {
    if (c.has("must") || c.has("should") || c.has("must_not")) return parseClauseList(c)
    // condition-shape checks shared with the server-side decoder
    // (WireFilters) so the two qdrant parsers cannot drift
    if (c.has("is_null")) return attr(WireFilters.keyOf(c, "is_null")).isNull
    if (c.has("is_empty")) return attr(WireFilters.keyOf(c, "is_empty")).isNull
    if (c.has("has_id")) // documented point-id membership condition
      return attr("id").isInCollection(
        jarr(c.get("has_id"), "has_id").map(_.asText()))
    val key = Option(c.get("key")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(s"qdrant condition missing key: $c"))
    if (c.has("match")) {
      val m = c.get("match")
      if (m.has("any")) {
        val vals = jarr(m.get("any"), "match.any")
        return if (vals.forall(_.isNumber))
          attr(key).cast("double").isInCollection(vals.map(_.asDouble()))
        else attr(key).isInCollection(vals.map(_.asText()))
      }
      val v = WireFilters.matchValue(c, m)
      if (v.isNumber) attr(key).cast("double") === v.asDouble() else attr(key) === v.asText()
    } else if (c.has("range")) {
      val r = c.get("range")
      Seq("gt" -> ((a: Column, b: Double) => a > b), "gte" -> ((a: Column, b: Double) => a >= b),
        "lt" -> ((a: Column, b: Double) => a < b), "lte" -> ((a: Column, b: Double) => a <= b))
        .flatMap { case (k, op) =>
          Option(r.get(k)).map(v => op(attr(key).cast("double"), v.asDouble())) }
        .reduceOption(_ && _).getOrElse(lit(true))
    } else throw new IllegalArgumentException(s"unsupported qdrant condition: $c")
  }

  /** JSON string escape — the rendered filter now actually TRAVELS as a
    * parsed scroll/search body, so values and keys must survive
    * `mapper.readTree` (quotes, backslashes, control chars). */
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  private def jkey(a: String): String = jstr(stripMeta(a))

  /** Point-id literal for a `has_id` list: canonical uints ride as JSON
    * numbers, everything else as strings — the same round-trip rule as
    * the wire client's point ids. */
  private def idVal(v: Any): String = {
    val s = String.valueOf(v)
    s.toLongOption.filter(l => l >= 0 && l.toString == s)
      .map(_.toString).getOrElse(jstr(s))
  }

  override def render(f: Filter): Option[String] = f match {
    case _ if f.references.exists(!addressable(_)) => None
    // Point ids are NOT payload: real Qdrant addresses them only through
    // the documented has_id condition (equality/membership). Id RANGES do
    // not exist on its wire (the parallel cursor slices use the __gid
    // payload mirror instead), and is_null on a missing payload key
    // MATCHES in real Qdrant — so a pushed IsNotNull(id) rendered as
    // must_not(is_null) would return ZERO rows on a real cluster. All
    // such shapes return None and Spark evaluates them client-side.
    case EqualTo("id", v) =>
      Some(s"""{"must":[{"has_id":[${idVal(v)}]}]}""")
    case In("id", vs) if vs.nonEmpty =>
      Some(s"""{"must":[{"has_id":[${vs.map(idVal).mkString(",")}]}]}""")
    case GreaterThan("id", _) | GreaterThanOrEqual("id", _) |
         LessThan("id", _) | LessThanOrEqual("id", _) |
         IsNull("id") | IsNotNull("id") => None
    case EqualTo(a, v: String) =>
      Some(s"""{"must":[{"key":${jkey(a)},"match":{"value":${jstr(v)}}}]}""")
    case EqualTo(a, v: Number) =>
      Some(s"""{"must":[{"key":${jkey(a)},"match":{"value":$v}}]}""")
    case GreaterThan(a, v: Number) =>
      Some(s"""{"must":[{"key":${jkey(a)},"range":{"gt":$v}}]}""")
    case GreaterThanOrEqual(a, v: Number) =>
      Some(s"""{"must":[{"key":${jkey(a)},"range":{"gte":$v}}]}""")
    case LessThan(a, v: Number) =>
      Some(s"""{"must":[{"key":${jkey(a)},"range":{"lt":$v}}]}""")
    case LessThanOrEqual(a, v: Number) =>
      Some(s"""{"must":[{"key":${jkey(a)},"range":{"lte":$v}}]}""")
    case In(a, vs) if vs.nonEmpty =>
      val rendered = vs.map {
        case s: String => jstr(s)
        case other => String.valueOf(other)
      }.mkString(",")
      Some(s"""{"must":[{"key":${jkey(a)},"match":{"any":[$rendered]}}]}""")
    case IsNull(a) =>
      Some(s"""{"must":[{"is_null":{"key":${jkey(a)}}}]}""")
    case IsNotNull(a) =>
      Some(s"""{"must_not":[{"is_null":{"key":${jkey(a)}}}]}""")
    case And(l, r) => for { ls <- render(l); rs <- render(r) } yield
      s"""{"must":[$ls,$rs]}"""
    case Or(l, r) => for { ls <- render(l); rs <- render(r) } yield
      s"""{"should":[$ls,$rs]}"""
    case Not(c) => render(c).map(s => s"""{"must_not":[$s]}""")
    case _ => None
  }
}

/** Pinecone metadata-filter dialect: the Mongo-style JSON of the public
  * query API — `{"genre": {"$eq": "drama"}}`, `{"$and": [...]}`, with
  * `$eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$exists` operators. Filters address
  * METADATA ONLY (vector ids are not filterable on Pinecone's wire, so
  * id predicates return None and Spark evaluates them client-side).
  *
  * Emulation notes: `$ne`/`$nin` here require the key to be present
  * (missing-key records do not match), and `$exists: false` matches only
  * missing keys — a record whose key holds a non-numeric value where a
  * numeric range is expected simply fails the range, like the real
  * service's typed metadata. */
class PineconeFilterDialect extends FilterDialect {
  import DialectUtil._
  override def name: String = "pinecone"
  @transient private lazy val mapper = new ObjectMapper()

  /** Parallel cursor slices range-filter the reserved numeric `__gid`
    * metadata field the Pinecone writer mirrors numeric ids into
    * ([[PineconeWireTransport.upsert]]) — Pinecone's `/query` evaluates
    * numeric metadata `$gte`/`$lt` natively; vector ids are not
    * range-addressable on its wire. */
  override def idSliceAttribute: Option[String] = Some("metadata.__gid")

  override def combine(rendered: Seq[String]): Option[String] =
    if (rendered.length <= 1) rendered.headOption
    else Some(rendered.mkString("""{"$and":[""", ",", "]}"))

  // ------------------------------------------------------------- parse

  override def parse(filter: String): Column = parseNode(mapper.readTree(filter))

  private def parseNode(n: JsonNode): Column = {
    val parts = n.properties().asScala.map { e =>
      (e.getKey, e.getValue) match {
        case ("$and", arr) =>
          if (!arr.isArray || arr.isEmpty) throw new IllegalArgumentException(
            s"pinecone filter: '$$and' needs a non-empty array, got: $arr")
          arr.elements().asScala.map(parseNode).reduce(_ && _)
        case ("$or", arr) =>
          if (!arr.isArray || arr.isEmpty) throw new IllegalArgumentException(
            s"pinecone filter: '$$or' needs a non-empty array, got: $arr")
          arr.elements().asScala.map(parseNode).reduce(_ || _)
        case (key, v) if v.isObject => parseOps(key, v)
        case (key, v) => cmpEq(key, v) // implicit $eq shorthand
      }
    }.toSeq
    if (parts.isEmpty) lit(true) else parts.reduce(_ && _)
  }

  private def cmpEq(key: String, v: JsonNode): Column =
    if (v.isNumber) attr(key).cast("double") === v.asDouble()
    else if (v.isBoolean) attr(key) === v.asBoolean().toString
    else if (v.isTextual) attr(key) === v.asText()
    else throw new IllegalArgumentException(
      // a silently-coerced array/object (asText = "") would match NOTHING —
      // a config carrying the OLD Qdrant-style filter shape must fail
      // loudly here, not "succeed" having migrated zero rows
      s"pinecone filter value for '$key' must be a string/number/boolean, " +
        s"got: $v (Qdrant-style structured filters are not valid Pinecone " +
        "filters — use the Mongo-style operators)")

  private def parseOps(key: String, ops: JsonNode): Column =
    ops.properties().asScala.map { e =>
      // every operator validates its value SHAPE — a structured value
      // silently coerced via asText() would compare against "" and match
      // nothing (or nearly everything under $ne): the zero-row/-all-rows
      // failure must be a parse error, not a quiet result
      def requirePrim(v: JsonNode): JsonNode =
        if (v.isNumber || v.isTextual || v.isBoolean) v
        else throw new IllegalArgumentException(
          s"pinecone filter value for '$key'.${e.getKey} must be a " +
            s"string/number/boolean, got: $v")
      def num = {
        if (!e.getValue.isNumber) throw new IllegalArgumentException(
          s"pinecone filter '$key'.${e.getKey} needs a numeric value, got: ${e.getValue}")
        e.getValue.asDouble()
      }
      def numAttr = attr(key).cast("double")
      e.getKey match {
        case "$eq" => cmpEq(key, e.getValue)
        case "$ne" =>
          val v = requirePrim(e.getValue)
          if (v.isNumber) numAttr =!= v.asDouble() else attr(key) =!= v.asText()
        case "$gt" => numAttr > num
        case "$gte" => numAttr >= num
        case "$lt" => numAttr < num
        case "$lte" => numAttr <= num
        case "$in" | "$nin" =>
          if (!e.getValue.isArray) throw new IllegalArgumentException(
            s"pinecone filter '$key'.${e.getKey} needs an array value, got: ${e.getValue}")
          val vals = e.getValue.elements().asScala.toSeq.map(requirePrim)
          val in = if (vals.forall(_.isNumber))
            numAttr.isInCollection(vals.map(_.asDouble()))
          else attr(key).isInCollection(vals.map(_.asText()))
          if (e.getKey == "$in") in else !in
        case "$exists" =>
          if (e.getValue.asBoolean()) attr(key).isNotNull else attr(key).isNull
        case other => throw new IllegalArgumentException(
          s"unsupported pinecone filter operator: $other")
      }
    }.reduce(_ && _)

  // ------------------------------------------------------------ render

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  private def jkey(a: String): String = jstr(stripMeta(a))
  private def jval(v: Any): String = v match {
    case n: Number => String.valueOf(n)
    case other => jstr(String.valueOf(other))
  }

  override def render(f: Filter): Option[String] = f match {
    case _ if f.references.exists(a => !addressable(a) || a == "id") => None
    case EqualTo(a, v) => Some(s"""{${jkey(a)}:{"$$eq":${jval(v)}}}""")
    case GreaterThan(a, v: Number) => Some(s"""{${jkey(a)}:{"$$gt":$v}}""")
    case GreaterThanOrEqual(a, v: Number) => Some(s"""{${jkey(a)}:{"$$gte":$v}}""")
    case LessThan(a, v: Number) => Some(s"""{${jkey(a)}:{"$$lt":$v}}""")
    case LessThanOrEqual(a, v: Number) => Some(s"""{${jkey(a)}:{"$$lte":$v}}""")
    case In(a, vs) if vs.nonEmpty =>
      Some(s"""{${jkey(a)}:{"$$in":[${vs.map(jval).mkString(",")}]}}""")
    // the cursor planner's catch-all `NOT(a < x OR a >= y)` is true exactly
    // when `a` is missing/non-numeric — Pinecone's `$exists: false`
    case Not(Or(LessThan(a1, _), GreaterThanOrEqual(a2, _))) if a1 == a2 =>
      Some(s"""{${jkey(a1)}:{"$$exists":false}}""")
    case Not(EqualTo(a, v)) => Some(s"""{${jkey(a)}:{"$$ne":${jval(v)}}}""")
    case Not(In(a, vs)) if vs.nonEmpty =>
      Some(s"""{${jkey(a)}:{"$$nin":[${vs.map(jval).mkString(",")}]}}""")
    case And(l, r) => for { ls <- render(l); rs <- render(r) } yield
      s"""{"$$and":[$ls,$rs]}"""
    case Or(l, r) => for { ls <- render(l); rs <- render(r) } yield
      s"""{"$$or":[$ls,$rs]}"""
    case _ => None // $exists cannot express IsNull-on-present-key; no $not
  }
}

/** Milvus boolean-expression dialect: `field == value && other > 3`
  * (`adapters/milvus.py:101-111`). Recursive-descent parser for the
  * documented grammar subset: comparisons, `in`, `like`, `&&`/`and`,
  * `||`/`or`, `!`/`not`, parens. */
class MilvusExprDialect extends FilterDialect {
  import DialectUtil._
  override def name: String = "milvus"

  override def combine(rendered: Seq[String]): Option[String] =
    rendered.reduceOption((a, b) => s"($a && $b)")

  override def parse(filter: String): Column = new MilvusParser(filter).parseExpr()

  override def render(f: Filter): Option[String] = f match {
    case _ if f.references.exists(!addressable(_)) => None
    case EqualTo(a, v) => Some(s"${stripMeta(a)} == ${litStr(v)}")
    case GreaterThan(a, v) => Some(s"${stripMeta(a)} > ${litStr(v)}")
    case GreaterThanOrEqual(a, v) => Some(s"${stripMeta(a)} >= ${litStr(v)}")
    case LessThan(a, v) => Some(s"${stripMeta(a)} < ${litStr(v)}")
    case LessThanOrEqual(a, v) => Some(s"${stripMeta(a)} <= ${litStr(v)}")
    case In(a, vs) => Some(s"${stripMeta(a)} in [${vs.map(litStr).mkString(", ")}]")
    case And(l, r) => for { ls <- render(l); rs <- render(r) } yield s"($ls && $rs)"
    case Or(l, r) => for { ls <- render(l); rs <- render(r) } yield s"($ls || $rs)"
    case Not(c) => render(c).map(s => s"!($s)")
    case _ => None
  }
}

/** Tiny recursive-descent parser for Milvus filter expressions. */
private class MilvusParser(input: String) {
  import DialectUtil._
  private var pos = 0

  def parseExpr(): Column = {
    val c = parseOr()
    skipWs()
    require(pos >= input.length, s"trailing input at $pos in: $input")
    c
  }

  private def parseOr(): Column = {
    var left = parseAnd()
    while (eat("||") || eatWord("or")) left = left || parseAnd()
    left
  }

  private def parseAnd(): Column = {
    var left = parseNot()
    while (eat("&&") || eatWord("and")) left = left && parseNot()
    left
  }

  private def parseNot(): Column =
    if (eat("!") || eatWord("not")) !parseNot() else parsePrimary()

  private def parsePrimary(): Column = {
    skipWs()
    if (eat("(")) { val c = parseOr(); require(eat(")"), s"missing ) at $pos"); c }
    else parseComparison()
  }

  private def parseComparison(): Column = {
    val field = parseIdent()
    skipWs()
    if (eatWord("in")) {
      require(eat("["), s"expected [ after in at $pos")
      val vals = scala.collection.mutable.ArrayBuffer[Any]()
      while (!eat("]")) { vals += parseValue(); eat(",") }
      vals.headOption match {
        case Some(_: Double) => attr(field).cast("double")
          .isInCollection(vals.map(_.asInstanceOf[Double]).toSeq)
        case _ => attr(field).isInCollection(vals.map(String.valueOf(_)).toSeq)
      }
    } else if (eatWord("like")) {
      parseValue() match {
        case s: String => attr(field).like(s)
        case v => throw new IllegalArgumentException(s"like needs a string, got $v")
      }
    } else {
      val op = Seq("==", "!=", ">=", "<=", ">", "<").find(eat)
        .getOrElse(throw new IllegalArgumentException(s"expected comparison op at $pos in: $input"))
      parseValue() match {
        case d: Double =>
          val a = attr(field).cast("double")
          op match {
            case "==" => a === d; case "!=" => a =!= d; case ">" => a > d
            case ">=" => a >= d; case "<" => a < d; case "<=" => a <= d
          }
        case v =>
          val a = attr(field)
          val s = String.valueOf(v)
          op match {
            case "==" => a === s; case "!=" => a =!= s; case ">" => a > s
            case ">=" => a >= s; case "<" => a < s; case "<=" => a <= s
          }
      }
    }
  }

  private def parseIdent(): String = {
    skipWs()
    val start = pos
    while (pos < input.length && (input(pos).isLetterOrDigit || "._".contains(input(pos)))) pos += 1
    require(pos > start, s"expected identifier at $start in: $input")
    input.substring(start, pos)
  }

  private def parseValue(): Any = {
    skipWs()
    if (pos < input.length && (input(pos) == '"' || input(pos) == '\'')) {
      val quote = input(pos); pos += 1
      val start = pos
      while (pos < input.length && input(pos) != quote) pos += 1
      require(pos < input.length, s"unterminated string at $start")
      val s = input.substring(start, pos); pos += 1
      s
    } else {
      val start = pos
      while (pos < input.length && (input(pos).isDigit || "+-.eE".contains(input(pos)))) pos += 1
      require(pos > start, s"expected value at $start in: $input")
      input.substring(start, pos).toDouble
    }
  }

  private def skipWs(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1

  private def eat(tok: String): Boolean = {
    skipWs()
    if (input.startsWith(tok, pos)) { pos += tok.length; true } else false
  }

  private def eatWord(w: String): Boolean = {
    skipWs()
    val end = pos + w.length
    // boundary = identifier charset ('_'/'.' included): not_spam is a
    // field, not `not` + `_spam`
    def identChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'
    if (end <= input.length && input.substring(pos, end).equalsIgnoreCase(w) &&
      (end == input.length || !identChar(input(end)))) { pos = end; true }
    else false
  }
}
