package graft.connectors.vectorstore

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.sources._
import scala.jdk.CollectionConverters._

/** Server-side decoding of wire filter payloads back into DSv2 [[Filter]]
  * trees, so the loopback servers evaluate EXACTLY the engine's
  * [[FilterEval]] semantics — the emulated backend and the engine can
  * never disagree about what a filter matches.
  *
  * Scope: the syntax the engine's dialects RENDER (plus the documented
  * conjunction/disjunction forms). Anything else raises — a server that
  * silently ignored an unparseable filter would return unfiltered rows
  * and quietly break filtered-search semantics. */
object WireFilters {

  // ----------------------------------------------------------- Qdrant

  /** Qdrant structured-filter JSON → Filter. Accepts clause objects
    * (`must`/`should`/`must_not`) over `match` (value/text/any), `range`
    * (gt/gte/lt/lte), and `is_null`/`is_empty` conditions — the shapes
    * [[QdrantFilterDialect]] renders and parses. */
  def fromQdrantJson(node: JsonNode): Filter = clauseList(node)

  /** Clause lists must BE lists — `elements()` on a scalar is empty, so a
    * malformed `{"must": "x"}` would decode as match-ALL server-side (the
    * loopback would then hide the client bug real Qdrant 400s on). */
  private def jarr(n: JsonNode, what: String): Seq[JsonNode] = {
    if (!n.isArray) throw new IllegalArgumentException(
      s"qdrant filter: '$what' must be an array, got: $n")
    n.elements().asScala.toSeq
  }

  private def clauseList(n: JsonNode): Filter = {
    def conds(key: String): Seq[Filter] =
      Option(n.get(key)).map(v => jarr(v, key).map(cond)).getOrElse(Nil)
    val must = conds("must")
    val should = conds("should")
    val mustNot = conds("must_not")
    val parts =
      (if (must.nonEmpty) Seq(must.reduce(And(_, _))) else Nil) ++
        (if (should.nonEmpty) Seq(should.reduce(Or(_, _))) else Nil) ++
        (if (mustNot.nonEmpty) Seq(Not(mustNot.reduce(Or(_, _)))) else Nil)
    parts.reduceOption(And(_, _)).getOrElse(AlwaysTrue)
  }

  /** `{"is_null": {"key": k}}`-shaped conditions, loudly: a scalar or
    * key-less body (`{"is_null": "x"}` — the hand-written-config typo)
    * must raise the same parse error as the sibling branches, never NPE.
    * SHARED with [[QdrantFilterDialect.parseCond]] so the two qdrant
    * parsers (dialect Column side, server Filter side) cannot drift. */
  private[vectorstore] def keyOf(c: JsonNode, cond: String): String =
    Option(c.get(cond)).flatMap(n => Option(n.get("key"))).filterNot(_.isNull)
      .map(_.asText()).getOrElse(throw new IllegalArgumentException(
        s"""qdrant $cond condition needs {"key": ...}: $c"""))

  /** The `match` condition's scalar (`value` or legacy `text`), loudly —
    * shared with the dialect parser for the same no-drift reason. */
  private[vectorstore] def matchValue(c: JsonNode, m: JsonNode): JsonNode =
    Option(m.get("value")).orElse(Option(m.get("text")))
      .filterNot(_.isNull).getOrElse(throw new IllegalArgumentException(
        s"qdrant match condition needs value/text/any: $c"))

  private def cond(c: JsonNode): Filter = {
    if (c.has("must") || c.has("should") || c.has("must_not")) return clauseList(c)
    if (c.has("is_null")) return IsNull(keyOf(c, "is_null"))
    if (c.has("is_empty")) return IsNull(keyOf(c, "is_empty"))
    if (c.has("has_id")) // documented point-id membership condition
      return In("id", jarr(c.get("has_id"), "has_id")
        .map(v => (v.asText(): Any)).toArray)
    val key = Option(c.get("key")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException(s"qdrant condition missing key: $c"))
    if (c.has("match")) {
      val m = c.get("match")
      if (m.has("any")) {
        val vals = jarr(m.get("any"), "match.any").map(v =>
          if (v.isNumber) (v.asDouble(): Any) else (v.asText(): Any))
        In(key, vals.toArray)
      } else {
        val v = matchValue(c, m)
        if (v.isNumber) EqualTo(key, v.asDouble()) else EqualTo(key, v.asText())
      }
    } else if (c.has("range")) {
      val r = c.get("range")
      val ops = Seq[(String, Double => Filter)](
        "gt" -> (GreaterThan(key, _)), "gte" -> (GreaterThanOrEqual(key, _)),
        "lt" -> (LessThan(key, _)), "lte" -> (LessThanOrEqual(key, _)))
        .flatMap { case (k, f) => Option(r.get(k)).map(v => f(v.asDouble())) }
      ops.reduceOption(And(_, _)).getOrElse(AlwaysTrue)
    } else throw new IllegalArgumentException(s"unsupported qdrant condition: $c")
  }

  // --------------------------------------------------------- Pinecone

  /** Pinecone Mongo-style metadata filter JSON → Filter: `$and`/`$or`
    * lists, `{key: primitive}` shorthand, and per-key operator objects
    * (`$eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$exists`) — the
    * [[PineconeFilterDialect]] surface. `$ne`/`$nin` require the key to be
    * PRESENT (the dialect's Column semantics: a null comparison never
    * matches), hence the IsNotNull conjunct — [[FilterEval]]'s bare
    * `Not(EqualTo)` would match missing keys. */
  def fromPineconeJson(node: JsonNode): Filter = {
    val parts = node.properties().asScala.map { e =>
      (e.getKey, e.getValue) match {
        case ("$and", arr) =>
          if (!arr.isArray || arr.isEmpty) throw new IllegalArgumentException(
            s"pinecone filter: '$$and' needs a non-empty array, got: $arr")
          arr.elements().asScala.map(fromPineconeJson).reduce(And(_, _))
        case ("$or", arr) =>
          if (!arr.isArray || arr.isEmpty) throw new IllegalArgumentException(
            s"pinecone filter: '$$or' needs a non-empty array, got: $arr")
          arr.elements().asScala.map(fromPineconeJson).reduce(Or(_, _))
        case (key, v) if v.isObject => pineconeOps(key, v)
        case (key, v) => EqualTo(key, prim(v))
      }
    }.toSeq
    parts.reduceOption(And(_, _)).getOrElse(AlwaysTrue)
  }

  private def prim(v: JsonNode): Any =
    if (v.isNumber) v.asDouble() else if (v.isBoolean) v.asBoolean().toString
    else v.asText()

  private def pineconeOps(key: String, ops: JsonNode): Filter =
    ops.properties().asScala.map { e =>
      val v = e.getValue
      e.getKey match {
        case "$eq" => EqualTo(key, prim(v))
        case "$ne" => And(IsNotNull(key), Not(EqualTo(key, prim(v))))
        case "$gt" => GreaterThan(key, v.asDouble())
        case "$gte" => GreaterThanOrEqual(key, v.asDouble())
        case "$lt" => LessThan(key, v.asDouble())
        case "$lte" => LessThanOrEqual(key, v.asDouble())
        case "$in" => In(key, v.elements().asScala.map(prim).toArray)
        case "$nin" =>
          And(IsNotNull(key), Not(In(key, v.elements().asScala.map(prim).toArray)))
        case "$exists" => if (v.asBoolean()) IsNotNull(key) else IsNull(key)
        case other => throw new IllegalArgumentException(
          s"unsupported pinecone filter operator: $other")
      }
    }.reduceOption(And(_, _)).getOrElse(
      throw new IllegalArgumentException(s"empty operator object for key $key"))

  // ----------------------------------------------------------- Milvus

  /** Milvus boolean expression → Filter: comparisons, `in [..]`,
    * `&&`/`and`, `||`/`or`, `!`/`not`, parens — the
    * [[MilvusExprDialect]] surface. */
  def fromMilvusExpr(expr: String): Filter = new MilvusFilterParser(expr).parse()
}

/** Recursive-descent parser over the Milvus expression grammar, producing
  * DSv2 [[Filter]]s (the Column-producing twin lives in
  * [[MilvusExprDialect]]; this one runs server-side where no SparkSession
  * exists). */
private class MilvusFilterParser(input: String) {
  private var pos = 0

  def parse(): Filter = {
    val f = parseOr()
    skipWs()
    if (pos < input.length)
      throw new IllegalArgumentException(s"trailing input at $pos in: $input")
    f
  }

  private def skipWs(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1

  private def peekWord(w: String): Boolean = {
    skipWs()
    // boundary must match the IDENTIFIER charset ('_' and '.' included):
    // a field named not_spam must not tokenize as `not` + `_spam`
    def identChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'
    input.regionMatches(true, pos, w, 0, w.length) &&
      (pos + w.length >= input.length || !identChar(input(pos + w.length)))
  }

  private def eat(s: String): Boolean = {
    skipWs()
    if (input.regionMatches(true, pos, s, 0, s.length)) { pos += s.length; true } else false
  }

  private def parseOr(): Filter = {
    var l = parseAnd()
    while ({ skipWs(); eat("||") || (peekWord("or") && eat("or")) })
      l = Or(l, parseAnd())
    l
  }

  private def parseAnd(): Filter = {
    var l = parseNot()
    while ({ skipWs(); eat("&&") || (peekWord("and") && eat("and")) })
      l = And(l, parseNot())
    l
  }

  private def parseNot(): Filter = {
    skipWs()
    if (peekWord("not") && eat("not")) Not(parseNot())
    else if (pos < input.length && input(pos) == '!' &&
      (pos + 1 >= input.length || input(pos + 1) != '=')) { pos += 1; Not(parseNot()) }
    else parsePrimary()
  }

  private def parsePrimary(): Filter = {
    skipWs()
    if (eat("(")) {
      val f = parseOr()
      if (!eat(")")) throw new IllegalArgumentException(s"expected ) at $pos: $input")
      return f
    }
    val field = parseIdent()
    skipWs()
    if (peekWord("in") && eat("in")) {
      skipWs()
      if (!eat("[")) throw new IllegalArgumentException(s"expected [ at $pos: $input")
      val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
      var first = true
      while ({ skipWs(); !eat("]") }) {
        if (!first && !eat(","))
          throw new IllegalArgumentException(s"expected , at $pos: $input")
        first = false
        vals += parseLiteral()
      }
      In(field, vals.toArray)
    } else {
      val op =
        if (eat("==")) "=="
        else if (eat("!=")) "!="
        else if (eat(">=")) ">="
        else if (eat("<=")) "<="
        else if (eat(">")) ">"
        else if (eat("<")) "<"
        else throw new IllegalArgumentException(s"expected operator at $pos: $input")
      val v = parseLiteral()
      op match {
        case "==" => EqualTo(field, v)
        case "!=" => Not(EqualTo(field, v))
        case ">" => GreaterThan(field, v)
        case ">=" => GreaterThanOrEqual(field, v)
        case "<" => LessThan(field, v)
        case "<=" => LessThanOrEqual(field, v)
      }
    }
  }

  private def parseIdent(): String = {
    skipWs()
    val start = pos
    while (pos < input.length &&
      (input(pos).isLetterOrDigit || input(pos) == '_' || input(pos) == '.')) pos += 1
    if (pos == start) throw new IllegalArgumentException(s"expected identifier at $start: $input")
    input.substring(start, pos)
  }

  private def parseLiteral(): Any = {
    skipWs()
    if (pos < input.length && (input(pos) == '\'' || input(pos) == '"')) {
      val quote = input(pos); pos += 1
      val sb = new StringBuilder
      var closed = false
      while (!closed && pos < input.length) {
        if (input(pos) == quote) {
          // '' escapes a quote inside single-quoted strings (litStr's form)
          if (quote == '\'' && pos + 1 < input.length && input(pos + 1) == '\'') {
            sb.append('\''); pos += 2
          } else { pos += 1; closed = true }
        } else { sb.append(input(pos)); pos += 1 }
      }
      if (!closed) throw new IllegalArgumentException(s"unterminated string: $input")
      sb.toString
    } else {
      val start = pos
      while (pos < input.length && (input(pos).isDigit || "+-.eE".contains(input(pos)))) pos += 1
      if (pos == start) throw new IllegalArgumentException(s"expected literal at $start: $input")
      val s = input.substring(start, pos)
      s.toDoubleOption.getOrElse(
        throw new IllegalArgumentException(s"bad number '$s' in: $input"))
    }
  }
}
