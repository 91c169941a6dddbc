package graft.connectors

import graft.SparkSpec
import graft.config.QuerySpec
import graft.connectors.pgwire.{PgTestServer, PgWireClient, PgWireException}
import org.apache.spark.sql.functions._

/** LIVE verification of the pgvector connector's hand-built SQL surface
  * against a real PostgreSQL 15 server, through the engine's own minimal
  * v3 wire client ([[PgWireClient]]) — closing as much of the standing
  * "pgvector wire face env-unverifiable" gap as this sandbox allows:
  *
  *   VERIFIED LIVE here: `buildSelect` projections/filters/limits,
  *   `catalogPredicate` existence + case folding + search-path
  *   resolution, the `information_schema.columns` introspection query,
  *   the vector TEXT codec round trip, and the exact failure shape of
  *   the `VECTOR(d)` DDL on a server without the pgvector extension.
  *
  *   STILL env-blocked: Spark's JDBC data path (no driver jar on the
  *   offline resolver) and the `vector` type itself (extension not
  *   installed) — those remain covered by unit/property/oracle gates. */
class PgLiveWireSpec extends SparkSpec {
  import spark.implicits._

  private var server: Option[PgTestServer.Running] = None
  private var client: PgWireClient = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = PgTestServer.start()
    server.foreach(r => client = new PgWireClient("127.0.0.1", r.port))
  }

  override def afterAll(): Unit = {
    try {
      if (client != null) client.close()
      server.foreach(_.stop())
    } finally super.afterAll()
  }

  private def live(): PgWireClient = {
    assume(server.isDefined, "no local PostgreSQL server available — skipped")
    client
  }

  private val connector = new PgVectorConnector

  test("buildSelect runs verbatim on live PostgreSQL: projection, filter, limit, offset") {
    val c = live()
    c.query("CREATE TABLE items (vec_id BIGINT, embedding TEXT, label TEXT)")
    c.query("INSERT INTO items VALUES " +
      (0 until 10).map(i => s"($i, '[$i,${i * 2}]', 'l${i % 3}')").mkString(", "))
    val sel = connector.buildSelect(QuerySpec(collection = "items",
      idColumn = "vec_id", vectorColumn = Some("embedding"),
      metadataColumns = Seq("label"), filter = Some("vec_id >= 4"),
      limit = Some(3), offset = Some(1)))
    // consumed EXACTLY like Spark's JDBC reader does: dbtable subquery
    val r = c.query(s"SELECT * FROM ($sel) graft_scan ORDER BY vec_id")
    assert(r.columns == Seq("vec_id", "embedding", "label"), r.columns)
    assert(r.rows.length == 3, r.rows)
    assert(r.rows.forall(_.apply(0).toLong >= 4))
    // the ::text cast in the projection is what decodes a real vector
    // column; on this TEXT fixture it must still pass through unchanged
    assert(r.rows.head(1).startsWith("[") && r.rows.head(1).endsWith("]"))
  }

  test("catalogPredicate: live case folding, verbatim quoted names, schema scoping") {
    val c = live()
    c.query("CREATE TABLE casefold_t (x INT)")
    c.query("CREATE TABLE \"QuotedT\" (x INT)")
    c.query("CREATE SCHEMA other; CREATE TABLE other.casefold_t (y INT)")
    def existsCount(pred: String): Long =
      c.query(s"SELECT count(*) FROM information_schema.tables WHERE $pred")
        .rows.head.head.toLong
    // the JDBC write path ships unquoted names, which Postgres folds —
    // the probe must find the folded relation from a mixed-case reference
    assert(existsCount(connector.catalogPredicate("CaseFold_T")) >= 1,
      "folded-name probe missed the live relation")
    // a foreign tool's QUOTED mixed-case relation matches verbatim
    assert(existsCount(connector.catalogPredicate("QuotedT")) >= 1)
    assert(existsCount(connector.catalogPredicate("absent_t")) == 0)
    // schema-qualified probe constrains table_schema
    assert(existsCount(connector.catalogPredicate("other.casefold_t")) == 1)
    assert(existsCount(connector.catalogPredicate("other.quotedt")) == 0)
  }

  test("schemaInfo's column introspection resolves like the unqualified read (search_path)") {
    val c = live()
    // same table name in TWO schemas; search_path = "$user", public — the
    // firstVisibleOnly predicate must introspect only public's columns
    c.query("CREATE TABLE dup_t (a INT, b TEXT)")
    c.query("CREATE SCHEMA s2; CREATE TABLE s2.dup_t (z BIGINT)")
    val cols = c.query(
      "SELECT column_name, data_type, udt_name FROM information_schema.columns " +
        s"WHERE ${connector.catalogPredicate("dup_t", firstVisibleOnly = true)} " +
        "ORDER BY ordinal_position")
    assert(cols.rows.map(_.head) == Seq("a", "b"),
      s"interleaved or wrong-schema columns: ${cols.rows}")
    assert(cols.rows.map(_.apply(2)) == Seq("int4", "text"))
  }

  test("vector text codec round-trips through a live TEXT column") {
    val c = live()
    c.query("CREATE TABLE vec_rt (vec_id BIGINT, embedding TEXT)")
    val src = Seq(
      (1L, Seq(0.25f, -1.5f, 3.0f)),
      (2L, Seq(1e-4f, 2.5f, -0.125f)),
      (3L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    // literals built by the ENGINE's write codec, inserted over the wire
    val lits = src.select(col("vec_id"),
      PgVectorCodec.vectorToText(col("embedding")).as("t")).collect()
    val values = lits.map { r =>
      val t = if (r.isNullAt(1)) "NULL" else s"'${r.getString(1)}'"
      s"(${r.getLong(0)}, $t)"
    }.mkString(", ")
    assert(c.query(s"INSERT INTO vec_rt VALUES $values").rowCount == 3)
    // read back over the wire, decode with the READ codec, compare exactly
    val back = c.query("SELECT vec_id, embedding FROM vec_rt ORDER BY vec_id")
    val decoded = back.rows.map(r => (r(0).toLong, Option(r(1)))).toDF("vec_id", "t")
      .select(col("vec_id"), PgVectorCodec.textToVector(col("t")).as("embedding"))
    val got = decoded.orderBy("vec_id").collect()
      .map(r => if (r.isNullAt(1)) null else r.getSeq[Float](1))
    val want = src.orderBy("vec_id").collect()
      .map(r => if (r.isNullAt(1)) null else r.getSeq[Float](1))
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq} want ${want.toSeq}")
  }

  test("VECTOR(d) DDL fails with the documented SQLSTATE on an extension-less server") {
    val c = live()
    // the exact DDL shape the JDBC writer emits via createTableColumnTypes
    val e = intercept[PgWireException] {
      c.query("CREATE TABLE no_ext (id TEXT, vector VECTOR(3), metadata TEXT)")
    }
    assert(e.sqlState == "42704", s"${e.sqlState}: ${e.getMessage}") // undefined_object
    assert(e.getMessage.toLowerCase.contains("vector"), e.getMessage)
    // the extension itself is absent — the env constraint, captured live
    val e2 = intercept[PgWireException] { c.query("CREATE EXTENSION vector") }
    assert(e2.getMessage.toLowerCase.contains("vector"), e2.getMessage)
    // the session survives both errors (drain-to-ReadyForQuery contract)
    assert(c.query("SELECT 41 + 1").rows.head.head == "42")
  }

  private def wireConn(extra: (String, String)*): Map[String, String] =
    Map("host" -> "127.0.0.1", "port" -> server.get.port.toString,
      "protocol" -> "wire", "database" -> "postgres", "user" -> "postgres") ++ extra

  test("connector write + exists + readBack end-to-end over protocol=wire") {
    live()
    val pgv = ConnectorRegistry("pgvector")
    val df = Seq(
      ("a", Seq(1.5f, -2.25f), Map("k" -> "v'--; DROP TABLE x", "u" -> "héllo")),
      ("b", Seq(0.001f, 42f), Map("k" -> "2")),
      ("c", null.asInstanceOf[Seq[Float]], Map.empty[String, String]))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    val load = graft.config.LoadSpec(collection = "wire_e2e", recreate = true)
    assert(!pgv.exists(spark, wireConn(), "wire_e2e"))
    val rep = pgv.write(df, wireConn(), load)
    assert(rep.written == 3, rep)
    assert(pgv.exists(spark, wireConn(), "wire_e2e"))
    // schema introspection over the wire (TEXT fallback: no vector type)
    val si = pgv.schemaInfo(spark, wireConn(), "wire_e2e")
    assert(si.schema.fieldNames.toSeq == Seq("id", "vector", "metadata"), si.schema)
    // readBack = the write codec's inverse — canonical round trip, hostile
    // metadata values included (the '' escaping is what's under test)
    val back = pgv.readBack(spark, wireConn(), load)
      .orderBy(graft.model.Canonical.ID).collect()
    assert(back.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(back(0).getMap[String, String](2).toMap ==
      Map("k" -> "v'--; DROP TABLE x", "u" -> "héllo"))
    assert(back(0).getSeq[Float](1) == Seq(1.5f, -2.25f))
    assert(back(2).isNullAt(1) || back(2).getSeq[Float](1) == null)
    // recreate=false write lands new ids...
    def one(vec: Seq[Float]) = Seq(("d", vec, Map("k" -> "4")))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    val rep2 = pgv.write(one(Seq(7f, 7f)), wireConn(), load.copy(recreate = false))
    assert(rep2.written == 1)
    assert(pgv.readBack(spark, wireConn(), load).count() == 4)
    // ...and REPLACES existing ids (the wire face's id-keyed upsert: each
    // batch is one atomic delete-then-insert statement) — a re-delivered
    // batch (retried Spark task) converges instead of duplicating ids
    pgv.write(one(Seq(8f, 8f)), wireConn(), load.copy(recreate = false))
    val after = pgv.readBack(spark, wireConn(), load)
    assert(after.count() == 4, "upsert duplicated an existing id")
    assert(after.filter(col(graft.model.Canonical.ID) === "d")
      .head().getSeq[Float](1) == Seq(8f, 8f), "upsert kept the stale version")
  }

  test("write_mode=insert: the multi-VALUES upsert path stays live alongside COPY") {
    live()
    val pgv = ConnectorRegistry("pgvector")
    val conn = wireConn("write_mode" -> "insert")
    val load = graft.config.LoadSpec(collection = "wire_ins", recreate = true)
    def one(vec: Seq[Float]) = Seq(("x", vec, Map("k" -> "it's")))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    assert(pgv.write(one(Seq(1f, 2f)), conn, load).written == 1)
    assert(pgv.write(one(Seq(3f, 4f)), conn, load.copy(recreate = false)).written == 1)
    val back = pgv.readBack(spark, conn, load)
    assert(back.count() == 1, "INSERT-path upsert duplicated an id")
    assert(back.head().getSeq[Float](1) == Seq(3f, 4f))
    assert(back.head().getMap[String, String](2).toMap == Map("k" -> "it's"))
  }

  test("COPY write path: framing characters in values survive the text-format escapes") {
    live()
    val pgv = ConnectorRegistry("pgvector")
    // tab, newline, CR, backslash, and \N-lookalike — exactly the bytes
    // COPY text format frames rows/fields with; unescaped, any of them
    // would split or null the row
    val hostile = Map(
      "tab" -> "a\tb", "nl" -> "line1\nline2", "cr" -> "x\ry",
      "bs" -> "c:\\dir\\n not a newline", "nul_lookalike" -> "\\N")
    val df = Seq(("h1", Seq(1f, -2f), hostile))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    val load = graft.config.LoadSpec(collection = "wire_copy_esc", recreate = true)
    assert(pgv.write(df, wireConn(), load).written == 1)
    val got = pgv.readBack(spark, wireConn(), load).head()
    assert(got.getMap[String, String](2).toMap == hostile,
      s"COPY escaping mangled a value: ${got.getMap[String, String](2).toMap}")
    assert(got.getSeq[Float](1) == Seq(1f, -2f))
  }

  test("copyIn error shapes: bad relation fails typed; query() on COPY can't hang") {
    val c = live()
    import graft.connectors.pgwire.PgWireClient.copyField
    // COPY into a missing table: error arrives BEFORE copy mode — typed,
    // and the session survives (drain-to-ReadyForQuery contract)
    val e = intercept[PgWireException](
      c.copyIn("COPY absent_copy_t FROM STDIN", Iterator("1\t2")))
    assert(e.sqlState == "42P01", s"${e.sqlState}: ${e.getMessage}")
    assert(c.query("SELECT 1 + 1").rows.head.head == "2")
    // a COPY FROM STDIN issued through plain query(): the client answers
    // CopyFail instead of leaving the server waiting forever; the
    // statement fails typed (57014 query_canceled) and the session lives
    c.query("CREATE TABLE copy_guard_t (a TEXT)")
    val e2 = intercept[PgWireException](c.query("COPY copy_guard_t FROM STDIN"))
    assert(e2.getMessage.contains("copyIn"), s"${e2.sqlState}: ${e2.getMessage}")
    assert(c.query("SELECT 2 + 2").rows.head.head == "4")
    // happy path straight through the client: rows land, tag is COPY n
    val r = c.copyIn("COPY copy_guard_t (a) FROM STDIN",
      Iterator(copyField("v1"), copyField(null), copyField("a\tb")))
    assert(r.tags.lastOption.exists(_.startsWith("COPY")), r.tags)
    assert(r.rowCount == 3, r.tags)
    val back = c.query("SELECT a FROM copy_guard_t ORDER BY a NULLS LAST")
    assert(back.rows.map(r => Option(r.head)) ==
      Seq(Some("a\tb"), Some("v1"), None), back.rows)
  }

  test("extended query protocol: params carry hostile values with no escaping surface") {
    val c = live()
    c.query("CREATE TABLE ext_t (a TEXT, b TEXT)")
    // every classic injection/framing shape travels as a Bind PARAMETER —
    // the SQL text never contains it, so nothing needs quoting
    val hostile = Seq(
      "it's'; DROP TABLE ext_t; --", "back\\slash", "line1\nline2",
      "tab\there", "$1 $2 lookalike", "\\N", "héllo — ünïcode", "")
    hostile.zipWithIndex.foreach { case (v, i) =>
      val r = c.execParams("INSERT INTO ext_t VALUES ($1, $2)",
        Seq(Some(s"k$i"), Some(v)))
      assert(r.rowCount == 1, r.tags)
    }
    c.execParams("INSERT INTO ext_t VALUES ($1, $2)", Seq(Some("knull"), None))
    val back = c.execParams("SELECT b FROM ext_t WHERE a = $1", Seq(Some("k0")))
    assert(back.columns == Seq("b") && back.rows.head.head == hostile.head, back.rows)
    hostile.zipWithIndex.foreach { case (v, i) =>
      assert(c.execParams("SELECT b FROM ext_t WHERE a = $1", Seq(Some(s"k$i")))
        .rows.head.head == v, s"param round-trip mangled: $v")
    }
    assert(c.execParams("SELECT b FROM ext_t WHERE a = $1", Seq(Some("knull")))
      .rows.head.head == null)
    // the table survived every "injection" — the values were data
    // (8 hostile rows + the NULL-param row)
    assert(c.query("SELECT count(*) FROM ext_t").rows.head.head == "9")
    // error shape: bad SQL through Parse fails typed, session survives
    val e = intercept[PgWireException](c.execParams("SELEKT 1"))
    assert(e.sqlState == "42601", s"${e.sqlState}: ${e.getMessage}")
    assert(c.query("SELECT 3 + 3").rows.head.head == "6")
  }

  test("fuzz: generated strings round-trip both value paths (Bind params, COPY framing)") {
    val c = live()
    import graft.connectors.pgwire.PgWireClient.copyField
    // seeded so a failure reproduces; palette is the full hazard set —
    // quotes, backslashes, COPY framing chars, \N lookalikes, unicode,
    // placeholder lookalikes (NUL excluded: rejected by contract)
    val rnd = new scala.util.Random(181818L)
    val palette = "ab'\"\\\t\n\r$12;—é中,{}%_N".toCharArray
    val values = (0 until 120).map { i =>
      if (i == 0) "" else
        (0 until (1 + rnd.nextInt(24))).map(_ => palette(rnd.nextInt(palette.length))).mkString
    }
    c.query("CREATE TABLE fuzz_params (k INT, v TEXT); " +
      "CREATE TABLE fuzz_copy (k INT, v TEXT)")
    values.zipWithIndex.foreach { case (v, i) =>
      c.execParams("INSERT INTO fuzz_params VALUES ($1, $2)",
        Seq(Some(i.toString), Some(v)))
    }
    c.copyIn("COPY fuzz_copy FROM STDIN",
      values.zipWithIndex.iterator.map { case (v, i) => s"$i\t${copyField(v)}" })
    for (table <- Seq("fuzz_params", "fuzz_copy")) {
      val got = c.query(s"SELECT k, v FROM $table ORDER BY k").rows
        .map(r => r(0).toInt -> r(1)).toMap
      values.zipWithIndex.foreach { case (v, i) =>
        // COPY maps the empty-string field '' to '' (only \N is NULL);
        // both paths must return the value byte-identical
        assert(got(i) == v,
          s"$table mangled value $i: ${got(i).toSeq} != ${v.toSeq}")
      }
    }
  }

  test("BINARY fuzz: COPY binary + binary Bind params round-trip the text " +
    "fuzz population byte-identically with the text paths") {
    val c = live()
    import graft.connectors.pgwire.PgBinary
    // SAME seed and palette as the text fuzz test: the binary paths must
    // land the identical 120-value population — framing chars included,
    // with NO escaping pass at all (binary length-prefixes everything)
    val rnd = new scala.util.Random(181818L)
    val palette = "ab'\"\\\t\n\r$12;—é中,{}%_N".toCharArray
    val values = (0 until 120).map { i =>
      if (i == 0) "" else
        (0 until (1 + rnd.nextInt(24))).map(_ => palette(rnd.nextInt(palette.length))).mkString
    }
    c.query("CREATE TABLE fuzzb_copy (k INT, v TEXT); " +
      "CREATE TABLE fuzzb_params (k INT, v TEXT)")
    // binary COPY: int4 binary key + raw-UTF-8 text field per tuple
    val r = c.copyInBinary("COPY fuzzb_copy (k, v) FROM STDIN WITH (FORMAT binary)",
      values.zipWithIndex.iterator.map { case (v, i) =>
        Array(PgBinary.int4Send(i), PgBinary.textSend(v))
      })
    assert(r.rowCount == values.length, r.tags)
    // binary Bind parameters, pipelined through a named statement
    c.prepare("fuzzb_ins", "INSERT INTO fuzzb_params VALUES ($1, $2)")
    values.zipWithIndex.foreach { case (v, i) =>
      c.bindExecRaw("fuzzb_ins",
        Seq(Some(PgBinary.int4Send(i)), Some(PgBinary.textSend(v))), Seq(1, 1))
    }
    c.syncBatch()
    for (table <- Seq("fuzzb_copy", "fuzzb_params")) {
      val got = c.query(s"SELECT k, v FROM $table ORDER BY k").rows
        .map(r => r(0).toInt -> r(1)).toMap
      assert(got.size == values.length, s"$table: ${got.size} rows")
      values.zipWithIndex.foreach { case (v, i) =>
        assert(got(i) == v,
          s"$table mangled value $i: ${got(i).toSeq} != ${v.toSeq}")
      }
    }
  }

  test("binary result negotiation: whitelisted OIDs decode text-exactly, " +
    "float/numeric stay server-rendered text") {
    val c = live()
    import graft.connectors.pgwire.PgBinary
    c.query("CREATE TABLE bin_read_t (i8 BIGINT, i4 INT, i2 SMALLINT, " +
      "b BOOLEAN, t TEXT, f8 DOUBLE PRECISION, n NUMERIC)")
    c.query("INSERT INTO bin_read_t VALUES " +
      "(9223372036854775807, -2147483648, 32767, true, 'tab\thére', " +
      "0.30000000000000004, 1.500), " +
      "(-1, 0, -32768, false, '', 1e300, -0.000001), " +
      "(NULL, NULL, NULL, NULL, NULL, NULL, NULL)")
    val sql = "SELECT i8, i4, i2, b, t, f8, n FROM bin_read_t ORDER BY i8 NULLS LAST"
    c.prepare("bread", sql)
    val desc = c.describeStatement("bread")
    val exact = PgBinary.textExactOids(None)
    // the negotiation splits exactly as designed: 5 binary, 2 text
    assert(desc.map(_._2).take(5).forall(exact), desc)
    assert(desc.drop(5).map(_._2).forall(!exact(_)), desc)
    val formats = desc.map(d => if (exact(d._2)) 1 else 0)
    val res = c.execPreparedRaw("bread", Nil, Nil, formats)
    assert(res.formats == formats, s"server did not honor the formats: ${res.formats}")
    val decoded = res.rows.map(_.zipWithIndex.map { case (cell, i) =>
      if (cell == null) null
      else if (res.formats(i) == 1) PgBinary.recvToText(res.oids(i), None, cell)
      else new String(cell, java.nio.charset.StandardCharsets.UTF_8)
    })
    // byte-identical with the text-protocol rows — including the float
    // and numeric columns, which deliberately rode format 0
    assert(decoded == c.query(sql).rows, decoded)
  }

  test("face data_format=binary: direct-COPY write, staged binary upsert, " +
    "and the negotiated binary read match the text path end to end") {
    live()
    val pgv = ConnectorRegistry("pgvector")
    val conn = wireConn("query_protocol" -> "extended", "data_format" -> "binary")
    val hostile = Map(
      "tab" -> "a\tb", "nl" -> "line1\nline2", "cr" -> "x\ry",
      "bs" -> "c:\\dir\\n not a newline", "nul_lookalike" -> "\\N",
      "quote" -> "it's'; --")
    val df = Seq(
      ("a", Seq(1.5f, -2.25f), hostile),
      ("b", Seq(0.001f, 42f), Map("k" -> "2")),
      ("c", null.asInstanceOf[Seq[Float]], Map.empty[String, String]))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    val load = graft.config.LoadSpec(collection = "wire_bin_e2e", recreate = true)
    // recreate=true -> DIRECT binary COPY into the target (no stage)
    assert(pgv.write(df, conn, load).written == 3)
    val back = pgv.readBack(spark, conn, load)
      .orderBy(graft.model.Canonical.ID).collect()
    assert(back.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(back(0).getMap[String, String](2).toMap == hostile,
      s"binary path mangled metadata: ${back(0).getMap[String, String](2).toMap}")
    assert(back(0).getSeq[Float](1) == Seq(1.5f, -2.25f))
    assert(back(2).isNullAt(1) || back(2).getSeq[Float](1) == null)
    // recreate=false -> STAGED binary COPY upsert; replaced id converges
    def one(vec: Seq[Float]) = Seq(("b", vec, Map("k" -> "new")))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    assert(pgv.write(one(Seq(9f, 9f)), conn, load.copy(recreate = false)).written == 1)
    val after = pgv.readBack(spark, conn, load)
    assert(after.count() == 3, "staged binary upsert duplicated an id")
    assert(after.filter(col(graft.model.Canonical.ID) === "b")
      .head().getSeq[Float](1) == Seq(9f, 9f))
    // and the binary extended-protocol upsert (write_mode=insert) too
    val connIns = wireConn("query_protocol" -> "extended",
      "data_format" -> "binary", "write_mode" -> "insert")
    assert(pgv.write(one(Seq(11f, 12f)), connIns, load.copy(recreate = false)).written == 1)
    val after2 = pgv.readBack(spark, connIns, load)
    assert(after2.count() == 3)
    assert(after2.filter(col(graft.model.Canonical.ID) === "b")
      .head().getSeq[Float](1) == Seq(11f, 12f))
  }

  test("direct COPY (recreate) and staged COPY (append onto empty) converge " +
    "to the same final state") {
    live()
    val pgv = ConnectorRegistry("pgvector")
    val df = Seq(
      ("d1", Seq(1f, 2f), Map("m" -> "x\t\\N")),
      ("d2", null.asInstanceOf[Seq[Float]], Map("m" -> "y")))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    // direct: recreate=true skips the stage entirely
    pgv.write(df, wireConn(), graft.config.LoadSpec("wire_direct_t", recreate = true))
    // staged: recreate=false on a fresh table takes the stage+publish path
    pgv.write(df, wireConn(), graft.config.LoadSpec("wire_staged_t", recreate = false))
    def state(t: String) = pgv
      .readBack(spark, wireConn(), graft.config.LoadSpec(t))
      .orderBy(graft.model.Canonical.ID).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getSeq[Float](1),
        r.getMap[String, String](2).toMap)).toSeq
    assert(state("wire_direct_t") == state("wire_staged_t"),
      "direct and staged COPY landed different states")
  }

  test("copyInBinary error shapes: missing table typed; client abort lands " +
    "ZERO rows (single-statement atomicity) and the session survives") {
    val c = live()
    import graft.connectors.pgwire.PgBinary
    val e = intercept[PgWireException](c.copyInBinary(
      "COPY absent_bin_t FROM STDIN WITH (FORMAT binary)", Iterator.empty))
    assert(e.sqlState == "42P01", s"${e.sqlState}: ${e.getMessage}")
    assert(c.query("SELECT 1 + 1").rows.head.head == "2")
    // mid-stream client failure: CopyFail aborts, no partial rows — the
    // atomicity claim the face's DIRECT mode rests on
    c.query("CREATE TABLE bin_abort_t (a TEXT)")
    val boom = new RuntimeException("encoder failure mid-stream")
    val thrown = intercept[RuntimeException](c.copyInBinary(
      "COPY bin_abort_t (a) FROM STDIN WITH (FORMAT binary)",
      Iterator.tabulate(10) { i =>
        if (i == 5) throw boom
        Array(PgBinary.textSend(s"row$i"))
      }))
    assert(thrown eq boom, "the ORIGINAL failure must surface")
    assert(c.query("SELECT count(*) FROM bin_abort_t").rows.head.head == "0",
      "an aborted binary COPY left partial rows")
    assert(c.query("SELECT 2 + 2").rows.head.head == "4")
  }

  test("extended-protocol pipelined batch is atomic: one bad row rolls back the batch") {
    val c = live()
    c.query("CREATE TABLE ext_atomic (id TEXT, n INT CHECK (n < 100))")
    c.prepare("ins_a", "INSERT INTO ext_atomic VALUES ($1, $2)")
    // batch of 3 with the MIDDLE row violating the check: everything
    // between Syncs is one implicit transaction — the server skips the
    // rest after the error and rolls back, so NONE of the 3 land
    c.bindExec("ins_a", Seq(Some("a"), Some("1")))
    c.bindExec("ins_a", Seq(Some("b"), Some("999")))
    c.bindExec("ins_a", Seq(Some("c"), Some("2")))
    val e = intercept[PgWireException](c.syncBatch())
    assert(e.sqlState == "23514", s"${e.sqlState}: ${e.getMessage}") // check_violation
    assert(c.query("SELECT count(*) FROM ext_atomic").rows.head.head == "0",
      "a failed pipeline batch left partial rows — batch is not atomic")
    // a clean batch through the same prepared statement lands whole
    c.bindExec("ins_a", Seq(Some("a"), Some("1")))
    c.bindExec("ins_a", Seq(Some("c"), Some("2")))
    c.syncBatch()
    assert(c.query("SELECT count(*) FROM ext_atomic").rows.head.head == "2")
  }

  test("extended write with a LARGE batch_size completes (pipeline deadlock fix)") {
    live()
    val pgv = ConnectorRegistry("pgvector")
    // 8000 rows in ONE configured batch = ~16k queued Bind/Execute pairs
    // pre-fix: enough unread per-statement responses to fill both socket
    // buffers and deadlock the write. The chunked-Sync fix bounds unread
    // responses per window; run on a watchdog thread so a regression
    // fails the test instead of hanging the suite.
    val df = (0 until 8000).map(i => (s"id$i", Seq(i.toFloat, 1f), Map("k" -> i.toString)))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    val conn = wireConn("write_mode" -> "insert", "query_protocol" -> "extended")
    val load = graft.config.LoadSpec(collection = "wire_bigbatch",
      recreate = true, batchSize = 8000)
    @volatile var written = -1L
    @volatile var err: Throwable = null
    val t = new Thread(() =>
      try written = pgv.write(df, conn, load).written
      catch { case e: Throwable => err = e })
    t.setDaemon(true)
    t.start()
    t.join(180000)
    assert(err == null, s"write failed: $err")
    assert(written == 8000,
      if (t.isAlive) "extended-pipeline write DEADLOCKED (watchdog expired)"
      else s"written=$written")
    assert(pgv.readBack(spark, wireConn(), load).count() == 8000)
  }

  test("extended batch atomicity holds ACROSS chunked Syncs (explicit transaction)") {
    val c = live()
    c.query("CREATE TABLE ext_chunk (id TEXT, n INT CHECK (n < 100))")
    c.prepare("ins_c", "INSERT INTO ext_chunk VALUES ($1, $2)")
    // the face's deadlock fix splits one batch into several Sync windows
    // inside BEGIN...COMMIT; a failure in a LATER window must roll back
    // rows already synced in EARLIER windows of the same batch
    c.query("BEGIN")
    c.bindExec("ins_c", Seq(Some("a"), Some("1")))
    c.syncBatch() // window 1: fine (Sync inside BEGIN does not commit)
    c.bindExec("ins_c", Seq(Some("b"), Some("999")))
    val e = intercept[PgWireException](c.syncBatch()) // window 2: violates
    assert(e.sqlState == "23514", s"${e.sqlState}: ${e.getMessage}")
    c.query("ROLLBACK")
    assert(c.query("SELECT count(*) FROM ext_chunk").rows.head.head == "0",
      "an earlier Sync window's rows survived the batch rollback")
  }

  test("copyIn: an iterator failure mid-stream aborts via CopyFail, session survives") {
    val c = live()
    c.query("CREATE TABLE copy_abort (a TEXT)")
    val boom = new RuntimeException("value rejected mid-stream")
    val e = intercept[RuntimeException](
      c.copyIn("COPY copy_abort FROM STDIN", new Iterator[String] {
        private var i = 0
        def hasNext = true
        def next(): String = { i += 1; if (i > 3) throw boom; s"v$i" }
      }))
    assert(e eq boom, s"original failure was swallowed: $e")
    // CopyFail aborted the statement: no rows landed, and the SAME
    // session answers the next statement (not stuck in copy-in mode)
    assert(c.query("SELECT count(*) FROM copy_abort").rows.head.head == "0")
    assert(c.query("SELECT 5 + 5").rows.head.head == "10")
  }

  test("COPY mode rejects a collection named like the staging table (pg_temp shadowing)") {
    live()
    val pgv = ConnectorRegistry("pgvector")
    val df = Seq(("a", Seq(1f, 2f), Map.empty[String, String]))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    val e = intercept[IllegalArgumentException](pgv.write(df, wireConn(),
      graft.config.LoadSpec(collection = "graft_copy_stage", recreate = true)))
    assert(e.getMessage.contains("staging table"), e.getMessage)
  }

  test("query_protocol=extended: connector write (insert mode) + partitioned read e2e") {
    live()
    val pgv = ConnectorRegistry("pgvector")
    val conn = wireConn("write_mode" -> "insert", "query_protocol" -> "extended")
    val load = graft.config.LoadSpec(collection = "wire_ext", recreate = true)
    val df = Seq(
      ("a", Seq(1.5f, -2.25f), Map("k" -> "v'--; DROP TABLE x", "u" -> "héllo")),
      ("b", Seq(0.001f, 42f), Map("k" -> "2")),
      ("c", null.asInstanceOf[Seq[Float]], Map.empty[String, String]))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    assert(pgv.write(df, conn, load).written == 3)
    val back = pgv.readBack(spark, conn, load)
      .orderBy(graft.model.Canonical.ID).collect()
    assert(back.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(back(0).getMap[String, String](2).toMap ==
      Map("k" -> "v'--; DROP TABLE x", "u" -> "héllo"))
    assert(back(0).getSeq[Float](1) == Seq(1.5f, -2.25f))
    // the upsert contract holds on the parameterized path too
    def one(vec: Seq[Float]) = Seq(("a", vec, Map("k" -> "9")))
      .toDF(graft.model.Canonical.ID, graft.model.Canonical.VECTOR,
        graft.model.Canonical.METADATA)
    pgv.write(one(Seq(8f, 8f)), conn, load.copy(recreate = false))
    val after = pgv.readBack(spark, conn, load)
    assert(after.count() == 3, "extended-path upsert duplicated an id")
    assert(after.filter(col(graft.model.Canonical.ID) === "a")
      .head().getSeq[Float](1) == Seq(8f, 8f))
    // partitioned read through Parse/Bind/Execute per slice
    val sliced = pgv.read(spark,
      conn ++ Map("partitions" -> "3", "lower_bound" -> "0", "upper_bound" -> "10"),
      QuerySpec(collection = "wire_ext"))
    assert(sliced.rdd.getNumPartitions == 4) // 3 numeric + text catch-all
    assert(sliced.count() == 3)
  }

  test("partitioned wire read: declared id bounds split into range slices") {
    val c = live()
    c.query("CREATE TABLE part_t (vec_id BIGINT, embedding TEXT)")
    val rows = (0 until 120).map(i => s"($i, '[$i,1]')").mkString(", ")
    // rows OUTSIDE the declared bounds and a NULL id: the Spark-JDBC
    // contract makes bounds a stride, never a filter — the first slice is
    // unbounded below (and carries NULLs), the last unbounded above
    c.query(s"INSERT INTO part_t VALUES $rows, (-7, '[0,0]'), (500, '[5,5]'), " +
      "(NULL, '[9,9]')")
    val df = ConnectorRegistry("pgvector").read(spark,
      wireConn("partitions" -> "4", "lower_bound" -> "10", "upper_bound" -> "100"),
      graft.config.QuerySpec(collection = "part_t", idColumn = "vec_id",
        vectorColumn = Some("embedding")))
    assert(df.rdd.getNumPartitions == 4, df.rdd.getNumPartitions.toString)
    val ids = df.select("id").collect().map(r => Option(r.getString(0)))
    assert(ids.length == 123 && ids.distinct.length == 123, // disjoint + covering
      s"n=${ids.length} distinct=${ids.distinct.length}")
    assert(ids.contains(Some("-7")) && ids.contains(Some("500")),
      "ids outside [lower_bound, upper_bound) were silently filtered")
    assert(ids.contains(None), "the NULL id matched no slice")
    // TEXT id column (every table this face's own write creates): the
    // slices CASE-guard the cast and a CATCH-ALL slice carries
    // non-numeric, >18-digit, and NULL ids — disjoint + covering,
    // nothing silently range-excluded even with under-covering bounds
    c.query("CREATE TABLE part_s (id TEXT, vector TEXT)")
    val srows = (0 until 90).map(i => s"('$i', '[$i,1]')").mkString(", ")
    c.query(s"INSERT INTO part_s VALUES $srows, ('alpha', '[1,2]'), " +
      "('12345678901234567890123', '[2,2]'), (NULL, '[3,3]')")
    val sdf = ConnectorRegistry("pgvector").read(spark,
      wireConn("partitions" -> "4", "lower_bound" -> "10", "upper_bound" -> "80"),
      graft.config.QuerySpec(collection = "part_s"))
    assert(sdf.rdd.getNumPartitions == 5, sdf.rdd.getNumPartitions.toString)
    val sids = sdf.select("id").collect().map(r => Option(r.getString(0)))
    assert(sids.length == 93 && sids.distinct.length == 93,
      s"n=${sids.length} distinct=${sids.distinct.length}")
    assert(sids.contains(Some("alpha")) &&
      sids.contains(Some("12345678901234567890123")) && sids.contains(None))
    assert(sids.contains(Some("0")) && sids.contains(Some("89")),
      "numeric text ids outside the declared bounds were silently filtered")
  }

  test("incremental migration over the wire face: idempotent, updates APPLIED (upsert)") {
    live()
    val tmp = java.nio.file.Files.createTempDirectory("graft-pgwire-inc").toString
    def writeSrc(sub: String, rows: Seq[(String, Seq[Float], Map[String, String])]): String = {
      val p = s"$tmp/$sub"
      rows.toDF("id", "vector", "metadata").write.parquet(s"$p/docs.parquet")
      p
    }
    val v1 = writeSrc("v1", Seq(
      ("a", Seq(1f, 2f), Map("k" -> "1")), ("b", Seq(3f, 4f), Map("k" -> "2"))))
    def cfg(src: String) = graft.config.MigrationConfig.fromJson(
      s"""{"source": {"type": "parquet", "connection": {"path": "$src"},
         |            "query": {"table_name": "docs"}},
         | "target": {"type": "pgvector",
         |            "connection": {"host": "127.0.0.1",
         |                           "port": "${server.get.port}",
         |                           "protocol": "wire",
         |                           "database": "postgres", "user": "postgres"},
         |            "load": {"collection": "wire_inc"}}}""".stripMargin)
    assert(graft.core.IncrementalMigrator.run(spark, cfg(v1)).success)
    // re-run: nothing new — the content-hash read-back over the wire must
    // classify every row unchanged (codec-inverse fidelity, live server)
    val again = graft.core.IncrementalMigrator.run(spark, cfg(v1))
    assert(again.success && again.metrics("rows") == "0", again)
    // v2: "a" CHANGES, "c" is new — the wire face upserts by id
    // (upsertsById(connection) = true), so BOTH ship: the update is
    // APPLIED, not withheld (the r16 stretch item, now implementable
    // because each wire batch is an atomic delete-then-insert)
    val v2 = writeSrc("v2", Seq(
      ("a", Seq(9f, 9f), Map("k" -> "1")), ("b", Seq(3f, 4f), Map("k" -> "2")),
      ("c", Seq(5f, 6f), Map("k" -> "3"))))
    val r = graft.core.IncrementalMigrator.run(spark, cfg(v2))
    assert(r.success && r.metrics("rows") == "2", r) // "a" (update) + "c" (insert)
    assert(r.withheldUpdates == 0, r)
    val back = ConnectorRegistry("pgvector").readBack(spark, wireConn(),
      graft.config.LoadSpec(collection = "wire_inc"))
    assert(back.count() == 3)
    assert(back.select("id").distinct().count() == 3,
      "the upsert duplicated a changed record's id")
    // the target holds the NEW version of "a" — the reference's named
    // future work ("incremental migration") with updates applied
    assert(back.filter(col("id") === "a").head().getSeq[Float](1) == Seq(9f, 9f))
  }

  test("TLS upgrade (SSLRequest): pinned self-signed cert, secure defaults, no fallback") {
    live() // environment must run PostgreSQL at all
    import scala.sys.process._
    val devNull = ProcessLogger(_ => (), _ => ())
    val dir = java.nio.file.Files.createTempDirectory("graft-pgtls")
    val crt = s"$dir/server.crt"
    val key = s"$dir/server.key"
    // the forked test JVM's PATH may not carry the host's openssl: probe
    // the common locations and skip cleanly when none answers
    val openssl = Seq("openssl", "/usr/bin/openssl", "/usr/local/bin/openssl",
      "/root/miniconda/bin/openssl")
      .find(p => scala.util.Try(Seq(p, "version").!(devNull)).toOption.contains(0))
    assume(openssl.isDefined, "no openssl available — TLS face skipped")
    assume(scala.util.Try(Seq(openssl.get, "req", "-new", "-x509", "-days", "2",
      "-nodes", "-out", crt, "-keyout", key,
      "-subj", "/CN=127.0.0.1").!(devNull)).toOption.contains(0),
      "openssl could not mint a self-signed cert — TLS face skipped")
    // the server must traverse the dir (createTempDirectory is 0700
    // root-owned) and OWN a non-world-readable key
    Seq("chmod", "755", dir.toString).!(devNull)
    Seq("chown", "postgres:postgres", key, crt).!(devNull)
    Seq("chmod", "600", key).!(devNull)
    val tls = PgTestServer.start(Seq("-c ssl=on",
      s"-c ssl_cert_file=$crt", s"-c ssl_key_file=$key"))
    assume(tls.isDefined, "TLS-enabled server failed to start")
    val run = tls.get
    try {
      // pinned root cert: handshake succeeds and the SERVER agrees the
      // session is TLS (pg_stat_ssl for this very backend)
      val c = new PgWireClient("127.0.0.1", run.port,
        ssl = true, sslRootCert = Some(crt))
      try assert(c.query(
        "SELECT ssl FROM pg_stat_ssl WHERE pid = pg_backend_pid()")
        .rows.head.head == "t", "server does not see this session as TLS")
      finally c.close()
      // platform trust store REJECTS the self-signed cert — the secure
      // default; pinning is an explicit opt-in, not trust-all
      intercept[Exception](
        new PgWireClient("127.0.0.1", run.port, ssl = true))
      // ssl required against a non-TLS server: typed refusal ('N'), never
      // a silent cleartext fallback
      val e = intercept[PgWireException](
        new PgWireClient("127.0.0.1", server.get.port,
          ssl = true, sslRootCert = Some(crt)))
      assert(e.sqlState == "08P01" &&
        e.getMessage.contains("refused the TLS upgrade"), e.getMessage)
      // ---- SCRAM-SHA-256-PLUS: channel binding on the TLS session ----
      // the server advertises the -PLUS mechanism on SSL connections;
      // the client must pick it and bind to THIS session's server cert
      // (tls-server-end-point) — a wrong binding fails the proof
      val admin = new PgWireClient("127.0.0.1", run.port,
        ssl = true, sslRootCert = Some(crt))
      try {
        admin.query("SET password_encryption = 'scram-sha-256'; " +
          "CREATE ROLE scrampls_u LOGIN PASSWORD 'bind+me'")
        val hba = java.nio.file.Paths.get(run.root.getAbsolutePath, "data", "pg_hba.conf")
        val prior = java.nio.file.Files.readAllBytes(hba)
        java.nio.file.Files.write(hba,
          "hostssl all scrampls_u 127.0.0.1/32 scram-sha-256\n".getBytes("UTF-8")
            ++ prior)
        admin.query("SELECT pg_reload_conf()")
        Thread.sleep(500) // reload is async
      } finally admin.close()
      val sp = new PgWireClient("127.0.0.1", run.port, user = "scrampls_u",
        password = Some("bind+me"), ssl = true, sslRootCert = Some(crt))
      try {
        assert(sp.saslMechanism == "SCRAM-SHA-256-PLUS",
          s"negotiated ${sp.saslMechanism} on a TLS session offering -PLUS")
        assert(sp.query("SELECT current_user").rows.head.head == "scrampls_u")
        assert(sp.query(
          "SELECT ssl FROM pg_stat_ssl WHERE pid = pg_backend_pid()")
          .rows.head.head == "t")
      } finally sp.close()
      // wrong password through the -PLUS flow: the server's typed failure
      val bad = intercept[PgWireException](
        new PgWireClient("127.0.0.1", run.port, user = "scrampls_u",
          password = Some("wrong"), ssl = true, sslRootCert = Some(crt)))
      assert(bad.sqlState == "28P01", s"${bad.sqlState}: ${bad.getMessage}")
    } finally run.stop()
  }

  test("malformed RowDescription/DataRow frames fail typed and keep the stream in sync") {
    // a stub "server" that authenticates (trust) and then answers the
    // FIRST query with a structurally broken RowDescription (claims 5
    // columns, payload ends immediately) and the SECOND with a
    // well-formed single-row result — the client must surface a typed
    // 08P01 for the first and still parse the second on the SAME
    // connection (readMessage consumed the broken frame whole, so the
    // stream never desyncs)
    val srv = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    def frame(t: Char, body: Array[Byte]): Array[Byte] =
      Array(t.toByte) ++ java.nio.ByteBuffer.allocate(4).putInt(4 + body.length).array() ++ body
    def cstr(s: String) = s.getBytes("UTF-8") :+ 0.toByte
    val t = new Thread(() => {
      try {
        val s = srv.accept()
        val in = new java.io.DataInputStream(s.getInputStream)
        val o = s.getOutputStream
        val len = in.readInt(); in.skipBytes(len - 4) // startup message
        o.write(frame('R', Array[Byte](0, 0, 0, 0))) // AuthenticationOk
        o.write(frame('Z', Array[Byte]('I'.toByte)))
        o.flush()
        def awaitQuery(): Unit = { in.readByte(); val l = in.readInt(); in.skipBytes(l - 4) }
        awaitQuery()
        o.write(frame('T', Array[Byte](0, 5))) // 5 columns, no payload: broken
        o.write(frame('Z', Array[Byte]('I'.toByte)))
        o.flush()
        awaitQuery()
        val col = Array[Byte](0, 1) ++ cstr("x") ++ new Array[Byte](18)
        val row = Array[Byte](0, 1) ++ Array[Byte](0, 0, 0, 2) ++ "42".getBytes("UTF-8")
        o.write(frame('T', col))
        o.write(frame('D', row))
        o.write(frame('C', cstr("SELECT 1")))
        o.write(frame('Z', Array[Byte]('I'.toByte)))
        o.flush()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    val c = new PgWireClient("127.0.0.1", srv.getLocalPort)
    try {
      val e = intercept[PgWireException](c.query("SELECT broken"))
      assert(e.sqlState == "08P01" && e.getMessage.contains("RowDescription"),
        s"${e.sqlState}: ${e.getMessage}")
      val ok = c.query("SELECT 42")
      assert(ok.columns == Seq("x") && ok.rows == Seq(Seq("42")), ok)
    } finally { c.close(); srv.close() }
  }

  test("non-PostgreSQL endpoint fails typed (08P01), never a multi-GB allocation") {
    // no live PG needed: a raw socket answering an HTTP banner — the 'H'
    // plus "TTP/" as a length prefix would otherwise become a ~1.4 GB
    // allocation attempt inside readMessage
    val srv = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val t = new Thread(() => {
      try {
        val s = srv.accept()
        s.getOutputStream.write("HTTP/1.1 400 Bad Request\r\n\r\n".getBytes("UTF-8"))
        s.getOutputStream.flush()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try {
      val e = intercept[PgWireException](
        new PgWireClient("127.0.0.1", srv.getLocalPort))
      assert(e.sqlState == "08P01", e.getMessage)
      assert(e.getMessage.contains("really a PostgreSQL server"), e.getMessage)
    } finally srv.close()
  }

  test("password auth on the wire: SCRAM-SHA-256 (server signature verified) and MD5") {
    val c = live()
    val run = server.get
    // one role per verifier flavor; PG15 stores whatever
    // password_encryption says at CREATE ROLE time
    c.query("SET password_encryption = 'scram-sha-256'; " +
      "CREATE ROLE scram_u LOGIN PASSWORD 'sekret+123'")
    c.query("SET password_encryption = 'md5'; " +
      "CREATE ROLE md5_u LOGIN PASSWORD 'm5pass'")
    // hba is first-match: the per-role password rules must PRECEDE the
    // initdb trust rules (root writes the file; owner stays postgres)
    val hba = java.nio.file.Paths.get(run.root.getAbsolutePath, "data", "pg_hba.conf")
    val prior = java.nio.file.Files.readAllBytes(hba)
    java.nio.file.Files.write(hba,
      ("host all scram_u 127.0.0.1/32 scram-sha-256\n" +
        "host all md5_u 127.0.0.1/32 md5\n").getBytes("UTF-8") ++ prior)
    c.query("SELECT pg_reload_conf()")
    Thread.sleep(500) // reload is async
    // full SCRAM-SHA-256 round trip, INCLUDING the server-signature check
    val sc = new PgWireClient("127.0.0.1", run.port, user = "scram_u",
      password = Some("sekret+123"))
    try {
      assert(sc.query("SELECT current_user").rows.head.head == "scram_u")
      // off TLS the client must negotiate the NON-PLUS mechanism (gs2 'n')
      assert(sc.saslMechanism == "SCRAM-SHA-256", sc.saslMechanism)
    } finally sc.close()
    // wrong password: the server's typed auth failure, not a hang or NPE
    val bad = intercept[PgWireException](
      new PgWireClient("127.0.0.1", run.port, user = "scram_u",
        password = Some("wrong")))
    assert(bad.sqlState == "28P01", s"${bad.sqlState}: ${bad.getMessage}")
    // MD5 round trip (md5(md5(password+user)+salt))
    val mc = new PgWireClient("127.0.0.1", run.port, user = "md5_u",
      password = Some("m5pass"))
    try assert(mc.query("SELECT current_user").rows.head.head == "md5_u")
    finally mc.close()
    // password required but not supplied: loud client-side typed error
    val np = intercept[PgWireException](
      new PgWireClient("127.0.0.1", run.port, user = "scram_u"))
    assert(np.sqlState == "28P01", np.getMessage)
  }

  test("batched multi-row INSERT through the wire matches the write batch size shape") {
    val c = live()
    c.query("CREATE TABLE batch_t (id TEXT, vector TEXT, metadata TEXT)")
    // 100 = LoadSpec's default batch_size (reference adapters/pgvector.py:159)
    val rows = (0 until 100).map(i => s"('id$i', '[$i,1]', '{\"k\":\"$i\"}')").mkString(", ")
    val ins = c.query(s"INSERT INTO batch_t VALUES $rows")
    assert(ins.rowCount == 100, ins.tags)
    assert(c.query("SELECT count(*) FROM batch_t").rows.head.head == "100")
    // id-keyed delete round (the CDC-apply face's SQL shape)
    assert(c.query("DELETE FROM batch_t WHERE id IN ('id1', 'id2')").rowCount == 2)
  }
}
