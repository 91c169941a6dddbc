package graft.connectors.pgwire

import java.io.{DataInputStream, DataOutputStream, IOException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** A PostgreSQL error, carrying the server's SQLSTATE and message — the
  * typed failure [[PgWireClient.query]] raises on `ErrorResponse` (after
  * draining the stream to `ReadyForQuery`, so the connection stays
  * usable for the next statement). */
final class PgWireException(val sqlState: String, message: String)
  extends IOException(s"[$sqlState] $message")

/** One statement's outcome on the wire: the last result set's column
  * names and text-format rows (empty for DDL/DML), plus every
  * `CommandComplete` tag the statement batch produced ("CREATE TABLE",
  * "INSERT 0 3", "SELECT 2", ...). */
case class PgResult(columns: Seq[String], rows: Seq[Seq[String]], tags: Seq[String]) {
  /** Rows affected, parsed from the last tag ("INSERT 0 3" -> 3,
    * "UPDATE 2" -> 2, "SELECT 5" -> 5); 0 when the tag carries none. */
  def rowCount: Long =
    tags.lastOption.flatMap(_.split(' ').lastOption).flatMap(_.toLongOption).getOrElse(0L)
}

/** Minimal PostgreSQL frontend — the documented v3 wire protocol
  * (PostgreSQL docs, "Frontend/Backend Protocol"), Simple Query flavor:
  * `StartupMessage` → trust `AuthenticationOk` → `Query('Q')` with
  * text-format results. This is NOT a JDBC replacement (no prepared
  * statements, no binary formats, no TLS/SCRAM — trust/local auth only);
  * it exists so the engine's hand-built SQL surface — the pgvector
  * connector's `buildSelect` / catalog predicates / DDL shapes and the
  * vector text codec — can be verified against a LIVE PostgreSQL server
  * in environments where the JDBC driver jar is absent (this repo's
  * offline sandbox). The reference drives the same statements through
  * psycopg2 (`adapters/pgvector.py`); here the statements themselves are
  * the contract under test.
  *
  * Thread-safety: none — one client per connection, like a raw socket. */
class PgWireClient(host: String, port: Int,
                   user: String = "postgres",
                   database: String = "postgres") extends AutoCloseable {

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)

  // ---- startup: length-prefixed (NO type byte), protocol 3.0, then
  // key/value params terminated by one NUL
  locally {
    val params = Array("user", user, "database", database)
    val body = params.map(_.getBytes(UTF_8)).map(b => b :+ 0.toByte).reduce(_ ++ _) :+ 0.toByte
    out.writeInt(8 + body.length)
    out.writeInt(196608) // 3 << 16: protocol 3.0
    out.write(body)
    out.flush()
    // consume until the first ReadyForQuery: AuthenticationOk ('R' code 0
    // under trust), ParameterStatus ('S'), BackendKeyData ('K')
    var ready = false
    while (!ready) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'R' =>
          val code = ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
            ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
          if (code != 0)
            throw new PgWireException("28000",
              s"server requested authentication method $code — this client " +
                "speaks trust auth only (see pg_hba.conf)")
        case 'E' => throw errorFrom(payload)
        case 'Z' => ready = true
        case _ => // ParameterStatus / BackendKeyData / NoticeResponse
      }
    }
  }

  private def readMessage(): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt() // includes itself
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    (tpe, payload)
  }

  private def cstring(b: Array[Byte], from: Int): (String, Int) = {
    var end = from
    while (b(end) != 0) end += 1
    (new String(b, from, end - from, UTF_8), end + 1)
  }

  private def errorFrom(payload: Array[Byte]): PgWireException = {
    // ErrorResponse: (fieldType byte, cstring)* then a terminating 0
    var i = 0
    var state = "XX000"
    var msg = "unknown error"
    while (i < payload.length && payload(i) != 0) {
      val field = payload(i).toChar
      val (v, next) = cstring(payload, i + 1)
      if (field == 'C') state = v
      if (field == 'M') msg = v
      i = next
    }
    new PgWireException(state, msg)
  }

  /** Run one SQL statement (or a `;`-separated batch) through the Simple
    * Query protocol. Returns the LAST result set plus all command tags;
    * raises [[PgWireException]] on the first server error — AFTER
    * draining to `ReadyForQuery`, so the session survives the failure
    * (how every test asserts error shapes without reconnecting). */
  def query(sql: String): PgResult = {
    val body = sql.getBytes(UTF_8) :+ 0.toByte
    out.writeByte('Q')
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
    var columns = Seq.empty[String]
    var rows = Vector.empty[Seq[String]]
    val tags = Vector.newBuilder[String]
    var err: PgWireException = null
    var done = false
    while (!done) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'T' => // RowDescription: int16 n, then per-field name + 18 fixed bytes
          val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
          var i = 2
          columns = (0 until n).map { _ =>
            val (name, next) = cstring(payload, i)
            i = next + 18 // tableOid(4) colno(2) typeOid(4) typlen(2) typmod(4) format(2)
            name
          }
          rows = Vector.empty // a new result set within the batch resets rows
        case 'D' => // DataRow: int16 n, then per-col int32 len (-1 = NULL) + bytes
          val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
          var i = 2
          rows :+= (0 until n).map { _ =>
            val len = ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
              ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
            i += 4
            if (len == -1) null
            else { val s = new String(payload, i, len, UTF_8); i += len; s }
          }
        case 'C' => tags += cstring(payload, 0)._1 // CommandComplete
        case 'E' => if (err == null) err = errorFrom(payload) // keep draining
        case 'Z' => done = true // ReadyForQuery
        case 'I' => // EmptyQueryResponse
        case 'N' => // NoticeResponse — ignored
        case _ => // ParameterStatus etc. mid-query: ignored
      }
    }
    if (err != null) throw err
    PgResult(columns, rows, tags.result())
  }

  override def close(): Unit = {
    try {
      out.writeByte('X') // Terminate
      out.writeInt(4)
      out.flush()
    } catch { case _: IOException => () }
    socket.close()
  }
}
