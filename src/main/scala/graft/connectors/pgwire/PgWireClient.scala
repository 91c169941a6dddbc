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

/** SCRAM-SHA-256[-PLUS] client state (RFC 5802 with the SHA-256
  * parameters of RFC 7677), as PostgreSQL speaks it: the startup-message
  * user is authoritative (the `n=` field is empty), SaltedPassword via
  * PBKDF2-HMAC-SHA256, and the server's final `v=` signature IS verified
  * — mutual authentication, not just a password send.
  *
  * `gs2Header` selects the channel-binding posture (libpq parity):
  * `n,,` off TLS; `y,,` on TLS when the server did not offer the -PLUS
  * mechanism (the RFC 5802 downgrade tripwire — a server that DOES
  * support binding must reject `y`, so a MITM stripping the -PLUS
  * advertisement is caught); `p=tls-server-end-point,,` for -PLUS, with
  * `cbindData` = the RFC 5929 certificate hash. The `c=` attribute is
  * base64(gs2Header ++ cbindData) — `biws` is just the `n,,` case. */
private final class ScramState(password: String,
                               gs2Header: String = "n,,",
                               cbindData: Array[Byte] = Array.emptyByteArray) {
  import javax.crypto.Mac
  import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

  private val nonce = {
    val r = new java.security.SecureRandom()
    val b = new Array[Byte](18)
    r.nextBytes(b)
    java.util.Base64.getEncoder.encodeToString(b)
  }
  private val clientFirstBare = s"n=,r=$nonce"
  private val cbind = java.util.Base64.getEncoder.encodeToString(
    gs2Header.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ cbindData)
  private var authMessage: String = _
  private var saltedPassword: Array[Byte] = _

  def clientFirstMessage: String = s"$gs2Header$clientFirstBare"

  private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  def clientFinalMessage(serverFirst: String): String = {
    val fields = serverFirst.split(',').map(f => f.take(1) -> f.drop(2)).toMap
    val combined = fields.getOrElse("r", throw new PgWireException("28000",
      s"malformed SCRAM server-first-message: $serverFirst"))
    if (!combined.startsWith(nonce))
      throw new PgWireException("28000",
        "SCRAM server nonce does not extend the client nonce — possible MITM")
    val salt = java.util.Base64.getDecoder.decode(fields("s"))
    val iters = fields("i").toInt
    val spec = new PBEKeySpec(password.toCharArray, salt, iters, 256)
    saltedPassword = javax.crypto.SecretKeyFactory
      .getInstance("PBKDF2WithHmacSHA256").generateSecret(spec).getEncoded
    val clientKey = hmac(saltedPassword, "Client Key")
    val storedKey = sha256(clientKey)
    val withoutProof = s"c=$cbind,r=$combined"
    authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
    val signature = hmac(storedKey, authMessage)
    val proof = clientKey.zip(signature).map { case (a, b) => (a ^ b).toByte }
    s"$withoutProof,p=${java.util.Base64.getEncoder.encodeToString(proof)}"
  }

  def verifyServerFinal(serverFinal: String): Unit = {
    val v = serverFinal.split(',').find(_.startsWith("v="))
      .map(_.drop(2)).getOrElse(throw new PgWireException("28000",
        s"malformed SCRAM server-final-message: $serverFinal"))
    val serverKey = hmac(saltedPassword, "Server Key")
    val expect = java.util.Base64.getEncoder
      .encodeToString(hmac(serverKey, authMessage))
    if (expect != v)
      throw new PgWireException("28000",
        "SCRAM server signature mismatch — the server does not know the " +
          "password it challenged for (possible MITM)")
  }
}

object PgWireClient {
  /** One COPY text-format field: `\N` for NULL, otherwise the documented
    * backslash escapes (backslash itself, tab, newline, carriage return —
    * the characters that would break the row/field framing). NUL bytes
    * are rejected like every other text path (PostgreSQL text cannot
    * carry them). */
  def copyField(v: String): String = {
    if (v == null) return "\\N"
    require(!v.contains('\u0000'),
      "PostgreSQL text literals cannot carry NUL (\\u0000) bytes")
    val sb = new java.lang.StringBuilder(v.length + 8)
    var i = 0
    while (i < v.length) {
      v.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}

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

/** A result set with per-column wire metadata and UNDECODED values — the
  * binary-format read path's shape: `oids`/`formats` parallel `columns`
  * (format 1 = binary, 0 = text bytes), each cell the raw value bytes
  * (null = SQL NULL). [[PgBinary.recvToText]] decodes negotiated
  * columns; format-0 cells are the server's own text rendering. */
case class PgResultRaw(columns: Seq[String], oids: Seq[Int], formats: Seq[Int],
                       rows: Seq[Seq[Array[Byte]]], tags: Seq[String])

/** Minimal PostgreSQL frontend — the documented v3 wire protocol
  * (PostgreSQL docs, "Frontend/Backend Protocol"), Simple Query flavor:
  * `StartupMessage` → authentication (trust, cleartext password, MD5,
  * or SASL SCRAM-SHA-256 with server-signature verification — the
  * PostgreSQL default since v14) → `Query('Q')` with text-format
  * results. TLS rides the documented SSLRequest upgrade: platform-trust
  * mode verifies chain AND hostname (verify-full); a pinned
  * `ssl_root_cert` is verify-ca against that one anchor. The Extended
  * Query protocol (Parse/Bind/Execute — [[prepare]]/[[bindExec]]/
  * [[execParams]]) carries values as parameters; `COPY FROM STDIN`
  * ([[copyIn]]) is the bulk path. Text format only — this is still NOT
  * a general JDBC replacement; it
  * exists so the engine's hand-built SQL
  * surface — the pgvector connector's `buildSelect` / catalog
  * predicates / DDL shapes and the vector text codec — can be verified
  * against a LIVE PostgreSQL server in environments where the JDBC
  * driver jar is absent (this repo's offline sandbox), and so the
  * connector's wire face ([[graft.connectors.PgWireFace]]) can carry
  * real reads/writes there. The reference drives the same statements
  * through psycopg2 (`adapters/pgvector.py`); here the statements
  * themselves are the contract under test.
  *
  * Thread-safety: none — one client per connection, like a raw socket. */
class PgWireClient(host: String, port: Int,
                   user: String = "postgres",
                   database: String = "postgres",
                   password: Option[String] = None,
                   ssl: Boolean = false,
                   sslRootCert: Option[String] = None) extends AutoCloseable {

  private val socket: Socket = {
    val plain = new Socket(host, port)
    plain.setTcpNoDelay(true)
    if (!ssl) plain
    else {
      // documented TLS upgrade: SSLRequest (int32 8, int32 80877103),
      // server answers ONE byte — 'S' = proceed with the handshake over
      // the same connection, 'N' = no TLS here (we required it: typed
      // refusal, never a silent cleartext fallback)
      val o = new DataOutputStream(plain.getOutputStream)
      o.writeInt(8)
      o.writeInt(80877103)
      o.flush()
      plain.getInputStream.read() match {
        case 'S' =>
          val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
          val tms: Array[javax.net.ssl.TrustManager] = sslRootCert match {
            case None => null // platform trust store (secure default)
            case Some(pem) => // trust exactly the given root/server cert
              val cf = java.security.cert.CertificateFactory.getInstance("X.509")
              val cert = {
                val s = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(pem))
                try cf.generateCertificate(s) finally s.close()
              }
              val ks = java.security.KeyStore.getInstance(
                java.security.KeyStore.getDefaultType)
              ks.load(null, null)
              ks.setCertificateEntry("pgwire-root", cert)
              val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
                javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
              tmf.init(ks)
              tmf.getTrustManagers
          }
          ctx.init(null, tms, null)
          val s = ctx.getSocketFactory
            .createSocket(plain, host, port, true).asInstanceOf[javax.net.ssl.SSLSocket]
          s.setUseClientMode(true)
          // Endpoint verification, libpq-parity semantics:
          //  - platform trust store (no pin): verify-full — chain AND
          //    hostname. Without this, ANY CA-issued cert for ANY host
          //    would pass, so an active MITM with a valid cert for its
          //    own name defeats the handshake. "HTTPS" is the JSSE
          //    RFC 2818/6125 rule set (SAN DNS/IP match, CN fallback for
          //    DNS names only).
          //  - pinned root/server cert: verify-ca — the caller opted
          //    into ONE explicit trust anchor; a MITM would need that
          //    specific key. (libpq's sslrootcert+verify-ca draws the
          //    same line; hostname checks against self-signed pins with
          //    no SAN would reject legitimate setups.)
          if (sslRootCert.isEmpty) {
            val p = s.getSSLParameters
            p.setEndpointIdentificationAlgorithm("HTTPS")
            s.setSSLParameters(p)
          }
          s.startHandshake()
          s
        case 'N' =>
          plain.close()
          throw new PgWireException("08P01",
            s"$host:$port refused the TLS upgrade (ssl=off on the server?) " +
              "and this connection requires ssl")
        case other =>
          plain.close()
          throw new PgWireException("08P01",
            s"unexpected SSLRequest response byte $other from $host:$port")
      }
    }
  }
  private val in = new DataInputStream(socket.getInputStream)
  // buffered: the extended-protocol pipeline writes 2-3 small frames per
  // row (writeBind/writeExecute never flush) — unbuffered with
  // TCP_NODELAY that is a syscall and potentially a packet per frame.
  // Every read site is preceded by an explicit flush (send/sendSync/
  // query/copyIn), so buffering changes no protocol timing.
  private val out = new DataOutputStream(
    new java.io.BufferedOutputStream(socket.getOutputStream, 1 << 16))

  private def send(tpe: Char, body: Array[Byte]): Unit = {
    out.writeByte(tpe)
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
  }

  // ---- startup: length-prefixed (NO type byte), protocol 3.0, then
  // key/value params terminated by one NUL
  locally {
    val params = Array("user", user, "database", database)
    val body = params.map(_.getBytes(UTF_8)).map(b => b :+ 0.toByte).reduce(_ ++ _) :+ 0.toByte
    out.writeInt(8 + body.length)
    out.writeInt(196608) // 3 << 16: protocol 3.0
    out.write(body)
    out.flush()
    // consume until the first ReadyForQuery, answering the server's
    // authentication requests: trust (0), cleartext (3), MD5 (5), and
    // SASL SCRAM-SHA-256 (10/11/12 — RFC 5802/7677, the PostgreSQL
    // default since v14). ParameterStatus ('S') / BackendKeyData ('K')
    // ride along.
    var scram: ScramState = null
    var ready = false
    try while (!ready) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'R' =>
          val code = ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
            ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
          def pw: String = password.getOrElse(throw new PgWireException("28P01",
            s"server requires password authentication (method $code) and no " +
              "password was supplied"))
          code match {
            case 0 => // AuthenticationOk
            case 3 => // cleartext password
              send('p', pw.getBytes(UTF_8) :+ 0.toByte)
            case 5 => // MD5: "md5" + md5(md5(password + user) + salt4), hex
              val salt = payload.slice(4, 8)
              val inner = md5Hex((pw + user).getBytes(UTF_8))
              val outer = md5Hex(inner.getBytes(UTF_8) ++ salt)
              send('p', ("md5" + outer).getBytes(UTF_8) :+ 0.toByte)
            case 10 => // AuthenticationSASL: mechanism list, NUL-separated
              val mechs = new String(payload.drop(4), UTF_8).split('\u0000').filter(_.nonEmpty)
              val tlsSock = socket match {
                case s: javax.net.ssl.SSLSocket => Some(s)
                case _ => None
              }
              // mechanism choice, libpq parity: on TLS prefer the -PLUS
              // variant (tls-server-end-point binding ties the SCRAM
              // exchange to THIS TLS session's server certificate, so a
              // credential-forwarding MITM fails the proof); on TLS
              // without -PLUS offered, gs2 flag `y` arms the RFC 5802
              // downgrade tripwire (a binding-capable server must reject
              // it); off TLS, plain `n`.
              val (mech, st) =
                if (tlsSock.isDefined && mechs.contains("SCRAM-SHA-256-PLUS")) {
                  val cert = tlsSock.get.getSession.getPeerCertificates.head
                    .asInstanceOf[java.security.cert.X509Certificate]
                  ("SCRAM-SHA-256-PLUS",
                    new ScramState(pw, "p=tls-server-end-point,,", endPointHash(cert)))
                } else if (mechs.contains("SCRAM-SHA-256"))
                  ("SCRAM-SHA-256",
                    new ScramState(pw, if (tlsSock.isDefined) "y,," else "n,,"))
                else
                  throw new PgWireException("28000",
                    s"server offers SASL mechanisms ${mechs.mkString(",")} — this " +
                      "client speaks SCRAM-SHA-256 and SCRAM-SHA-256-PLUS")
              scram = st
              saslMechanism = mech
              val initial = scram.clientFirstMessage.getBytes(UTF_8)
              val buf = new java.io.ByteArrayOutputStream()
              buf.write(mech.getBytes(UTF_8)); buf.write(0)
              buf.write(java.nio.ByteBuffer.allocate(4).putInt(initial.length).array())
              buf.write(initial)
              send('p', buf.toByteArray)
            case 11 => // AuthenticationSASLContinue: server-first-message
              val serverFirst = new String(payload.drop(4), UTF_8)
              send('p', scram.clientFinalMessage(serverFirst).getBytes(UTF_8))
            case 12 => // AuthenticationSASLFinal: verify the server signature
              scram.verifyServerFinal(new String(payload.drop(4), UTF_8))
            case other =>
              throw new PgWireException("28000",
                s"server requested authentication method $other — this client " +
                  "speaks trust, password, md5, and SCRAM-SHA-256 (see pg_hba.conf)")
          }
        case 'E' => throw errorFrom(payload)
        case 'Z' => ready = true
        case _ => // ParameterStatus / BackendKeyData / NoticeResponse
      }
    } catch {
      // a failed handshake (auth rejection, protocol surprise) must not
      // leak its socket — the constructor throws, so close() never runs
      case e: Throwable =>
        try socket.close() catch { case _: IOException => () }
        throw e
    }
  }

  /** The SASL mechanism the startup negotiated ("SCRAM-SHA-256" or
    * "SCRAM-SHA-256-PLUS"), null for non-SASL auth — test introspection
    * for the channel-binding live specs. */
  private[connectors] var saslMechanism: String = _

  /** RFC 5929 tls-server-end-point channel-binding data: the server
    * certificate's hash, using the certificate's own signature hash
    * algorithm with MD5/SHA-1 upgraded to SHA-256 (the RFC's rule —
    * also PostgreSQL's, `be-secure-openssl.c`). */
  private def endPointHash(cert: java.security.cert.X509Certificate): Array[Byte] = {
    val alg = cert.getSigAlgName.toUpperCase(java.util.Locale.ROOT)
    // RSASSA-PSS carries its digest in the signature PARAMETERS, not the
    // algorithm name — guessing SHA-256 here would produce a
    // tls-server-end-point mismatch surfacing as a baffling SCRAM proof
    // failure. Fail typed and name the cause instead (r18 ADVICE).
    if (alg.contains("RSASSA-PSS") || alg.contains("PSS"))
      throw new PgWireException("0A000",
        "unsupported certificate signature algorithm for tls-server-end-point " +
          s"channel binding: $alg (RSASSA-PSS digest is in the signature " +
          "parameters); use channel_binding=disable or a SHA-2-signed server cert")
    val h = if (alg.contains("SHA384")) "SHA-384"
    else if (alg.contains("SHA512")) "SHA-512"
    else if (alg.contains("SHA224")) "SHA-224"
    else if (alg.contains("SHA256") || alg.contains("SHA1") || alg.contains("MD5"))
      "SHA-256" // MD5/SHA-1 upgrade to SHA-256 per RFC 5929 / PostgreSQL
    else throw new PgWireException("0A000",
      "unsupported certificate signature hash for tls-server-end-point " +
        s"channel binding: $alg")
    java.security.MessageDigest.getInstance(h).digest(cert.getEncoded)
  }

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  private def readMessage(): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt() // includes itself
    // sanity-bound the length BEFORE allocating: a non-PostgreSQL
    // endpoint (an HTTP server answering "HTTP/1.1 ...") yields a
    // garbage prefix that would otherwise become a multi-GB allocation
    // attempt — fail typed instead (08P01 = protocol violation)
    if (len < 4 || len > (1 << 28))
      throw new PgWireException("08P01",
        s"malformed message length $len for type '$tpe' — " +
          s"is $host:$port really a PostgreSQL server?")
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    (tpe, payload)
  }

  /** Bounds-checked: an unterminated string (hostile/broken server) is a
    * typed protocol violation, never an ArrayIndexOutOfBounds. */
  private def cstring(b: Array[Byte], from: Int): (String, Int) = {
    var end = from
    while (end < b.length && b(end) != 0) end += 1
    if (from > end || end >= b.length)
      throw new PgWireException("08P01",
        s"unterminated string in server message — is $host:$port really " +
          "a PostgreSQL server?")
    (new String(b, from, end - from, UTF_8), end + 1)
  }

  private def errorFrom(payload: Array[Byte]): PgWireException = {
    // ErrorResponse: (fieldType byte, cstring)* then a terminating 0.
    // Best-effort on malformed payloads: report what was parsed before
    // the frame ran out rather than throwing OUT of a drain loop.
    var i = 0
    var state = "XX000"
    var msg = "unknown error"
    try while (i < payload.length && payload(i) != 0) {
      val field = payload(i).toChar
      val (v, next) = cstring(payload, i + 1)
      if (field == 'C') state = v
      if (field == 'M') msg = v
      i = next
    } catch { case _: PgWireException => () }
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
        case 'T' => // RowDescription
          columns = parseRowDescription(payload, e => if (err == null) err = e)
          rows = Vector.empty // a new result set within the batch resets rows
        case 'D' => // DataRow
          parseDataRow(payload, e => if (err == null) err = e)
            .foreach(r => rows :+= r)
        case 'C' => // CommandComplete — tag parse failure is recorded,
          // not thrown: the drain must reach ReadyForQuery
          try tags += cstring(payload, 0)._1
          catch { case e: PgWireException => if (err == null) err = e }
        case 'E' => if (err == null) err = errorFrom(payload) // keep draining
        case 'Z' => done = true // ReadyForQuery
        case 'I' => // EmptyQueryResponse
        case 'N' => // NoticeResponse — ignored
        case 'G' => // CopyInResponse through plain query(): the server now
          // waits for CopyData and would hang the session — abort with
          // CopyFail so the statement fails typed instead
          val m = "COPY FROM STDIN requires copyIn()".getBytes(UTF_8) :+ 0.toByte
          out.writeByte('f')
          out.writeInt(4 + m.length)
          out.write(m)
          out.flush()
        case _ => // ParameterStatus, CopyOut 'H'/'d'/'c' etc.: ignored
      }
    }
    if (err != null) throw err
    PgResult(columns, rows, tags.result())
  }

  // ---- Extended Query protocol (Parse/Bind/Execute/Sync) ----
  // Parameterized statements: user VALUES travel as Bind parameters, so
  // the SQL text never carries data — no quoting/escaping surface at
  // all. Text format both ways (format code 0); an implicit transaction
  // spans everything up to Sync, which is what makes a pipelined
  // delete+insert batch atomic ([[PgWireFace]]'s extended write mode).

  private def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte

  /** Parse a NAMED prepared statement (Parse + Sync, drained) — call once
    * per connection, then pipeline [[bindExec]]/[[syncBatch]] against it. */
  def prepare(name: String, sql: String): Unit = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(cstr(name))
    b.write(cstr(sql))
    b.write(Array[Byte](0, 0)) // 0 pre-specified parameter types
    send('P', b.toByteArray)
    sendSync()
    drainExtended()
  }

  /** Queue ONE Bind("", stmt, params) + Execute("") pair — NOT flushed;
    * the round trip happens at [[syncBatch]]. `None` binds SQL NULL. */
  def bindExec(stmt: String, params: Seq[Option[String]]): Unit = {
    writeBind(stmt, params)
    writeExecute()
  }

  private def writeBind(stmt: String, params: Seq[Option[String]]): Unit =
    writeBindRaw(stmt, params.map(_.map(_.getBytes(UTF_8))), Nil, Nil)

  /** Bind with explicit format codes (the protocol's negotiation point):
    * `paramFormats`/`resultFormats` follow the documented convention —
    * empty = all text, one entry = applies to all, else one per
    * param/column (1 = binary, 0 = text). */
  private def writeBindRaw(stmt: String, params: Seq[Option[Array[Byte]]],
                           paramFormats: Seq[Int], resultFormats: Seq[Int]): Unit = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(cstr("")) // unnamed portal
    b.write(cstr(stmt))
    def codes(cs: Seq[Int]): Unit = {
      b.write(Array[Byte]((cs.length >> 8).toByte, cs.length.toByte))
      cs.foreach(c => b.write(Array[Byte]((c >> 8).toByte, c.toByte)))
    }
    codes(paramFormats)
    b.write(Array[Byte]((params.length >> 8).toByte, params.length.toByte))
    params.foreach {
      case None => b.write(Array[Byte](-1, -1, -1, -1)) // int32 -1 = NULL
      case Some(bytes) =>
        b.write(java.nio.ByteBuffer.allocate(4).putInt(bytes.length).array())
        b.write(bytes)
    }
    codes(resultFormats)
    out.writeByte('B')
    out.writeInt(4 + b.size())
    b.writeTo(out)
  }

  private def writeExecute(): Unit = {
    out.writeByte('E') // Execute: unnamed portal, no row limit
    out.writeInt(4 + 1 + 4)
    out.writeByte(0)
    out.writeInt(0)
  }

  private def sendSync(): Unit = {
    out.writeByte('S')
    out.writeInt(4)
    out.flush()
  }

  /** Close the pipeline: Sync, then drain every queued statement's
    * results to ReadyForQuery. Everything since the last Sync ran in ONE
    * implicit transaction — on the first error the server skips the rest
    * and rolls the transaction back, so a [[bindExec]] batch is atomic. */
  def syncBatch(): PgResult = {
    sendSync()
    drainExtended()
  }

  /** One-shot parameterized statement through the unnamed prepared
    * statement: Parse + Bind + Describe + Execute + Sync in a single
    * flush, results in text format. The read-side twin of [[bindExec]] —
    * `sql` carries `$1..$n` placeholders and `params` the values. */
  def execParams(sql: String, params: Seq[Option[String]] = Nil): PgResult = {
    val p = new java.io.ByteArrayOutputStream()
    p.write(cstr(""))
    p.write(cstr(sql))
    p.write(Array[Byte](0, 0))
    send('P', p.toByteArray) // send flushes; harmless mid-pipeline
    writeBind("", params)
    // Describe the PORTAL between Bind and Execute — RowDescription must
    // precede the DataRows or the drain's 'T' reset discards them
    out.writeByte('D')
    out.writeInt(4 + 1 + 1)
    out.writeByte('P')
    out.writeByte(0)
    writeExecute()
    syncBatch()
  }

  /** Shared drain for the extended protocol: collects the LAST result
    * set + all tags, raises the first error AFTER ReadyForQuery (same
    * session-survives contract as [[query]]). */
  private def drainExtended(): PgResult = {
    val raw = drainExtendedRaw()
    PgResult(raw.columns,
      raw.rows.map(_.map(b => if (b == null) null else new String(b, UTF_8))),
      raw.tags)
  }

  private def drainExtendedRaw(): PgResultRaw = {
    var desc = Seq.empty[(String, Int, Int)]
    var rows = Vector.empty[Seq[Array[Byte]]]
    val tags = Vector.newBuilder[String]
    var err: PgWireException = null
    var done = false
    while (!done) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'T' =>
          desc = parseRowDescriptionTyped(payload, e => if (err == null) err = e)
          rows = Vector.empty
        case 'D' =>
          parseDataRowRaw(payload, e => if (err == null) err = e)
            .foreach(r => rows :+= r)
        case 'C' =>
          try tags += cstring(payload, 0)._1
          catch { case e: PgWireException => if (err == null) err = e }
        case 'E' => if (err == null) err = errorFrom(payload)
        case 'Z' => done = true
        case _ => // ParseComplete '1', BindComplete '2', NoData 'n',
        // PortalSuspended 's', CloseComplete '3', notices, param status
      }
    }
    if (err != null) throw err
    PgResultRaw(desc.map(_._1), desc.map(_._2), desc.map(_._3), rows, tags.result())
  }

  /** Describe a NAMED prepared statement: (column name, type OID) per
    * result column — the negotiation step before a binary-format Bind
    * ([[execPreparedRaw]] chooses per-column result formats from these
    * OIDs). Empty for statements returning no rows. */
  def describeStatement(name: String): Seq[(String, Int)] = {
    out.writeByte('D')
    out.writeInt(4 + 1 + name.getBytes(UTF_8).length + 1)
    out.writeByte('S')
    out.write(cstr(name))
    sendSync()
    var desc = Seq.empty[(String, Int, Int)]
    var err: PgWireException = null
    var done = false
    while (!done) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'T' => desc = parseRowDescriptionTyped(payload, e => if (err == null) err = e)
        case 'n' => // NoData: DDL/DML statement
        case 't' => // ParameterDescription — param OIDs, unused here
        case 'E' => if (err == null) err = errorFrom(payload)
        case 'Z' => done = true
        case _ => // notices / param status
      }
    }
    if (err != null) throw err
    desc.map(d => (d._1, d._2))
  }

  /** Queue ONE Bind + Execute against a NAMED prepared statement with
    * explicit formats — the binary write path's pipelined unit (binary
    * parameters skip both the text rendering and the server-side text
    * parse). NOT flushed; the round trip happens at [[syncBatch]]. */
  def bindExecRaw(stmt: String, params: Seq[Option[Array[Byte]]],
                  paramFormats: Seq[Int], resultFormats: Seq[Int] = Nil): Unit = {
    writeBindRaw(stmt, params, paramFormats, resultFormats)
    writeExecute()
  }

  /** Execute a NAMED prepared statement once with explicit formats and
    * return the RAW result (per-column OIDs + format codes + undecoded
    * bytes) — the binary read path: Bind requests `resultFormats`
    * (typically 1 for every OID [[describeStatement]] showed to be in
    * the [[PgBinary.textExactOids]] whitelist, 0 elsewhere), Describe
    * the portal so RowDescription precedes the rows, Execute, Sync. */
  def execPreparedRaw(stmt: String, params: Seq[Option[Array[Byte]]],
                      paramFormats: Seq[Int],
                      resultFormats: Seq[Int]): PgResultRaw = {
    writeBindRaw(stmt, params, paramFormats, resultFormats)
    out.writeByte('D')
    out.writeInt(4 + 1 + 1)
    out.writeByte('P')
    out.writeByte(0)
    writeExecute()
    sendSync()
    drainExtendedRaw()
  }

  /** Malformed-frame guards for the two payloads with internal structure:
    * a hostile or broken server's RowDescription/DataRow must surface as
    * a TYPED 08P01 — recorded via `onErr` and reported after the drain
    * reaches ReadyForQuery (readMessage consumed the whole frame, so the
    * stream stays in sync) — never a raw ArrayIndexOutOfBounds that
    * aborts mid-stream and desyncs the session. */
  /** (name, typeOid, formatCode) per column — format codes are 0 from a
    * statement Describe and whatever Bind requested from a portal one. */
  private def parseRowDescriptionTyped(payload: Array[Byte],
                                       onErr: PgWireException => Unit): Seq[(String, Int, Int)] =
    try {
      val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
      var i = 2
      (0 until n).map { _ =>
        val (name, next) = cstring(payload, i)
        // layout after the name: tableOid(4) colno(2) typeOid(4)
        // typlen(2) typmod(4) format(2)
        val oid = ((payload(next + 6) & 0xff) << 24) | ((payload(next + 7) & 0xff) << 16) |
          ((payload(next + 8) & 0xff) << 8) | (payload(next + 9) & 0xff)
        val fmt = ((payload(next + 16) & 0xff) << 8) | (payload(next + 17) & 0xff)
        i = next + 18
        (name, oid, fmt)
      }
    } catch {
      // cstring's typed overrun throw included: it must funnel through
      // onErr like the raw index failures, or it aborts the drain loop
      // mid-stream and desyncs the session
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException |
           _: PgWireException =>
        onErr(new PgWireException("08P01",
          s"malformed RowDescription frame (${payload.length} bytes) — " +
            s"is $host:$port really a PostgreSQL server?"))
        Seq.empty
    }

  private def parseRowDescription(payload: Array[Byte],
                                  onErr: PgWireException => Unit): Seq[String] =
    parseRowDescriptionTyped(payload, onErr).map(_._1)

  private def parseDataRowRaw(payload: Array[Byte],
                              onErr: PgWireException => Unit): Option[Seq[Array[Byte]]] =
    try {
      val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
      var i = 2
      Some((0 until n).map { _ =>
        val len = ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
          ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
        i += 4
        if (len == -1) null
        else {
          if (len < 0 || i + len > payload.length) throw new PgWireException("08P01", "overrun")
          val b = java.util.Arrays.copyOfRange(payload, i, i + len); i += len; b
        }
      })
    } catch {
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException |
           _: PgWireException =>
        onErr(new PgWireException("08P01",
          s"malformed DataRow frame (${payload.length} bytes) — " +
            s"is $host:$port really a PostgreSQL server?"))
        None
    }

  private def parseDataRow(payload: Array[Byte],
                           onErr: PgWireException => Unit): Option[Seq[String]] =
    parseDataRowRaw(payload, onErr)
      .map(_.map(b => if (b == null) null else new String(b, UTF_8)))

  /** Bulk load through the documented COPY sub-protocol: run a
    * `COPY ... FROM STDIN` statement, answer the server's CopyInResponse
    * ('G') by streaming `lines` as text-format CopyData ('d') frames
    * (chunked, not one frame per row), finish with CopyDone ('c'), and
    * drain to `ReadyForQuery` exactly like [[query]]. Rows must already
    * be COPY-text encoded (tab-separated fields, `\N` nulls, backslash
    * escapes — [[PgWireClient.copyField]] builds a field). The server
    * reports mid-copy errors only after CopyDone on this path; the
    * session survives them (same drain contract as query). */
  def copyIn(sql: String, lines: Iterator[String], chunkBytes: Int = 1 << 16): PgResult =
    copyInStream(sql, chunkBytes) { (buf, flushChunk) =>
      lines.foreach { line =>
        buf.write(line.getBytes(UTF_8))
        buf.write('\n')
        if (buf.size() >= chunkBytes) flushChunk()
      }
    }

  /** Bulk load in COPY BINARY format (`COPY ... WITH (FORMAT binary)`):
    * same sub-protocol state machine as [[copyIn]], but the stream is the
    * documented binary file layout — [[PgBinary.copyHeader]], one
    * length-prefixed tuple per row ([[PgBinary.writeTuple]]), the -1
    * trailer. Each tuple's fields must already be in the COLUMN TYPE's
    * binary send format (null = SQL NULL): raw UTF-8 for TEXT columns,
    * [[PgBinary.vectorSend]] for a real VECTOR column. Vectors cross at
    * 4 bytes per component instead of ~9-13 text chars, and TEXT fields
    * skip the per-character escape scan entirely. */
  def copyInBinary(sql: String, tuples: Iterator[Array[Array[Byte]]],
                   chunkBytes: Int = 1 << 16): PgResult =
    copyInStream(sql, chunkBytes) { (buf, flushChunk) =>
      buf.write(PgBinary.copyHeader, 0, PgBinary.copyHeader.length)
      tuples.foreach { t =>
        PgBinary.writeTuple(buf, t)
        if (buf.size() >= chunkBytes) flushChunk()
      }
      buf.write(PgBinary.copyTrailer, 0, PgBinary.copyTrailer.length)
    }

  private def copyInStream(sql: String, chunkBytes: Int)
                          (body: (java.io.ByteArrayOutputStream, () => Unit) => Unit): PgResult = {
    val sqlBody = sql.getBytes(UTF_8) :+ 0.toByte
    out.writeByte('Q')
    out.writeInt(4 + sqlBody.length)
    out.write(sqlBody)
    out.flush()
    // phase 1: the server must answer CopyInResponse — or an error (bad
    // SQL, missing table), which arrives as 'E' then 'Z'
    var err: PgWireException = null
    var inCopy = false
    var answered = false
    while (!answered) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'G' => inCopy = true; answered = true // CopyInResponse
        case 'E' => if (err == null) err = errorFrom(payload)
        case 'Z' => answered = true // error path: statement never entered copy
        case 'N' | 'S' | 'A' => // notices / parameter status / LISTEN
        // notifications are benign asynchronous traffic — ride along
        case other =>
          // A genuinely unexpected type: record it and KEEP DRAINING to
          // ReadyForQuery before throwing — bailing out mid-conversation
          // desyncs the session for every later statement, unlike every
          // other drain path in this client (r18 ADVICE).
          if (err == null) err = new PgWireException("08P01",
            s"unexpected message '$other' awaiting CopyInResponse for: $sql")
      }
    }
    if (!inCopy) {
      if (err != null) throw err
      throw new PgWireException("08P01", s"statement did not enter COPY mode: $sql")
    }
    if (err != null) {
      // an unexpected-type error was recorded but the server then entered
      // COPY mode anyway — abort the copy cleanly and surface the error
      val m = "aborted: protocol desync".getBytes(UTF_8) :+ 0.toByte
      out.writeByte('f'); out.writeInt(4 + m.length); out.write(m); out.flush()
      var d = false
      while (!d) if (readMessage()._1 == 'Z') d = true
      throw err
    }
    // phase 2: stream the data — buffered into chunkBytes frames so a
    // million rows is a few thousand messages, not a million
    val buf = new java.io.ByteArrayOutputStream(chunkBytes + 4096)
    def flushChunk(): Unit = if (buf.size() > 0) {
      out.writeByte('d')
      out.writeInt(4 + buf.size())
      buf.writeTo(out)
      buf.reset()
    }
    try {
      body(buf, () => flushChunk())
      flushChunk()
      out.writeByte('c') // CopyDone
      out.writeInt(4)
      out.flush()
    } catch {
      case e: Throwable =>
        // the ITERATOR threw mid-stream (e.g. a NUL-carrying value
        // rejected by copyField): without CopyFail the session is
        // abandoned in copy-in mode and the next 'Q' is a protocol
        // violation — abort the copy, drain to ReadyForQuery (the
        // server answers 57014), and rethrow the ORIGINAL failure
        try {
          buf.reset() // partial line: never send it
          val m = ("aborted by client: " + String.valueOf(e.getMessage).take(200))
            .getBytes(UTF_8) :+ 0.toByte
          out.writeByte('f') // CopyFail
          out.writeInt(4 + m.length)
          out.write(m)
          out.flush()
          var done = false
          while (!done) if (readMessage()._1 == 'Z') done = true
        } catch { case _: Throwable => () }
        throw e
    }
    // phase 3: drain to ReadyForQuery, collecting tags/errors like query()
    val tags = Vector.newBuilder[String]
    var done = false
    while (!done) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'C' =>
          try tags += cstring(payload, 0)._1
          catch { case e: PgWireException => if (err == null) err = e }
        case 'E' => if (err == null) err = errorFrom(payload)
        case 'Z' => done = true
        case _ => // NoticeResponse / ParameterStatus
      }
    }
    if (err != null) throw err
    PgResult(Seq.empty, Seq.empty, tags.result())
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
