package graft.connectors

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.config.QuerySpec
import graft.connectors.vectorstore.SqlWhereDialect
import org.apache.spark.sql.sources.{EqualTo, In}

/** Hostile-identifier / hostile-literal properties for the pgvector SQL
  * builder — the injection surface the reference leaves open by f-string
  * interpolation (`adapters/pgvector.py:96-108`). The engine's contract
  * is a hard identifier WHITELIST (reject, don't quote): a name either
  * matches `[A-Za-z_][A-Za-z0-9_.]*` and renders verbatim, or the build
  * throws before any SQL exists. String LITERALS (pushdown filter
  * values) escape by SQL-standard quote doubling and must round-trip
  * arbitrary text. */
object PgSqlProps extends Properties("pgsql-builder") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(300)

  private val conn = new PgVectorConnector

  private val identChars: Seq[Char] =
    ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ '_'
  private val genIdent: Gen[String] = for {
    h <- Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') :+ '_')
    t <- Gen.listOf(Gen.oneOf(identChars))
  } yield (h +: t).mkString

  /** Strings OUTSIDE the whitelist: classic injections, quoting tricks,
    * unicode, and arbitrary printable junk. */
  private val genHostile: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const("a b"),
    Gen.const("t; DROP TABLE users; --"),
    Gen.const("t'--"),
    Gen.const("t\" OR \"1\"=\"1"),
    Gen.const("t`x"),
    Gen.const("1starts_with_digit"),
    Gen.const("has-dash"),
    Gen.const("таблица"),
    Gen.const("t\nx"),
    Gen.const("pg_catalog.pg_tables; SELECT 1"),
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.oneOf(identChars), Gen.oneOf("'\";() =".toSeq)))
      .map(_.mkString)
  ).suchThat(s => !s.matches("[A-Za-z_][A-Za-z0-9_.]*"))

  // ---------------------------------------------------------- buildSelect

  property("whitelisted identifiers render verbatim, in the documented shape") =
    forAll(genIdent, genIdent, genIdent, Gen.listOfN(2, genIdent)) { (t, id, vec, metas) =>
      val sql = conn.buildSelect(QuerySpec(collection = t, idColumn = id,
        vectorColumn = Some(vec), metadataColumns = metas))
      sql == s"SELECT $id, $vec::text AS $vec${metas.map(m => s", $m").mkString} FROM $t"
    }

  property("a hostile name in ANY identifier slot throws before SQL exists") =
    forAll(genHostile, Gen.chooseNum(0, 3)) { (bad, slot) =>
      val q = slot match {
        case 0 => QuerySpec(collection = bad)
        case 1 => QuerySpec(collection = "t", idColumn = bad)
        case 2 => QuerySpec(collection = "t", vectorColumn = Some(bad))
        case _ => QuerySpec(collection = "t", metadataColumns = Seq("ok", bad))
      }
      try { conn.buildSelect(q); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("invalid SQL identifier") }
    }

  // ------------------------------------------------------ catalogPredicate

  property("catalogPredicate quotes only whitelisted names (schema.table too)") =
    forAll(genIdent, Gen.option(genIdent)) { (table, schema) =>
      val ref = schema.map(s => s"$s.$table").getOrElse(table)
      // table references nest at most one dot; deeper idents (a.b.c pass
      // the charset whitelist) are rejected by the reference rule — both
      // outcomes are safe, neither interpolates unvalidated text
      try {
        val p = conn.catalogPredicate(ref)
        val folded = table.toLowerCase(java.util.Locale.ROOT)
        p.contains(s"'$table'") && p.contains(s"'$folded'") &&
          !p.exists(c => c == ';' || c == '\n') &&
          schema.forall(s => p.contains("table_schema"))
      } catch {
        case _: IllegalArgumentException => table.contains(".")
      }
    }

  property("catalogPredicate rejects hostile table references") =
    forAll(genHostile) { bad =>
      try { conn.catalogPredicate(bad); false }
      catch { case _: IllegalArgumentException => true }
    }

  // ------------------------------------------- literal escaping (filters)

  private val dialect = new SqlWhereDialect

  /** SQL-standard unescape: strip outer quotes, fold doubled quotes. */
  private def unescape(lit: String): Option[String] =
    if (lit.length < 2 || lit.head != '\'' || lit.last != '\'') None
    else {
      val body = lit.substring(1, lit.length - 1)
      // every quote inside the body must be doubled — a lone quote would
      // terminate the literal early at the server
      val halves = body.split("''", -1)
      if (halves.exists(_.contains('\''))) None else Some(halves.mkString("'"))
    }

  property("rendered string literals round-trip ARBITRARY text (quote doubling)") =
    forAll(Gen.oneOf(org.scalacheck.Arbitrary.arbitrary[String],
      Gen.oneOf("it's", "''", "'; DROP TABLE t; --", "a\\'b", "\\", "😀'￿"))) { v =>
      val rendered = dialect.render(EqualTo("metadata.k", v)).get
      // shape: k = '<escaped>' — extract the literal and unescape it
      rendered.startsWith("k = ") &&
        unescape(rendered.stripPrefix("k = ")).contains(v)
    }

  /** Scan a `'lit', 'lit', …` list the way a SQL server tokenizes it:
    * quotes close literals, doubled quotes are escapes. None on any
    * malformed shape — a lone quote, junk between literals. */
  private def parseLiteralList(s: String): Option[List[String]] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (s(i) != '\'') return None
      i += 1
      val sb = new StringBuilder
      var closed = false
      while (i < s.length && !closed) {
        if (s(i) == '\'') {
          if (i + 1 < s.length && s(i + 1) == '\'') { sb.append('\''); i += 2 }
          else { closed = true; i += 1 }
        } else { sb.append(s(i)); i += 1 }
      }
      if (!closed) return None
      out += sb.toString
      if (i < s.length) {
        if (!s.startsWith(", ", i)) return None
        i += 2
      }
    }
    Some(out.toList)
  }

  property("IN lists escape every member independently (server-side tokenization)") =
    forAll(Gen.listOfN(3, org.scalacheck.Arbitrary.arbitrary[String])) { vs =>
      vs.isEmpty || {
        val rendered = dialect.render(In("metadata.k", vs.toArray)).get
        val body = rendered.stripPrefix("k IN (").stripSuffix(")")
        parseLiteralList(body).contains(vs)
      }
    }
}
