package graft.server

import java.net.Socket
import MysqlWire._

/** Minimal MySQL protocol client — the in-repo counterpart of
  * [[MysqlServer]], used by the socket specs and the c16/c18 gated
  * queries so the wire path is exercised end-to-end (raw packets, no
  * JDBC driver — the sandbox classpath has none for MySQL).
  *
  * Speaks HandshakeResponse41, COM_QUERY with text result sets, and the
  * binary prepared-statement protocol (COM_STMT_PREPARE/EXECUTE/CLOSE)
  * with typed parameters including NULLs.
  */
object MysqlClient {
  /** Decoded result set: all values as text-protocol strings (binary rows
    * are rendered back to the same text forms for comparability). */
  final case class ResultSet(columns: Seq[String], types: Seq[Int],
                             rows: Seq[Seq[String]])
  final case class Ok(affectedRows: Long, info: String)
}

final class MysqlClient(host: String, port: Int,
                        user: String = "mindsdb", database: String = "mindsdb",
                        password: String = "",
                        charset: Int = MysqlWire.CHARSET_UTF8,
                        /** the auth plugin the client CLAIMS (MySQL 8
                          * connectors claim caching_sha2_password); a
                          * non-native claim exercises the server's
                          * AuthSwitchRequest redirect. */
                        authPlugin: String = "mysql_native_password",
                        /** send an SSLRequest after the greeting and
                          * upgrade to TLS before the HandshakeResponse
                          * (MySQL --ssl-mode=REQUIRED); the self-signed
                          * server cert is trusted unconditionally, like
                          * a client with --ssl-verify off. */
                        useTls: Boolean = false) {

  import MysqlClient.{Ok, ResultSet}

  private var sock: Socket = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private var io = new PacketIo(
    new java.io.BufferedInputStream(sock.getInputStream),
    new java.io.BufferedOutputStream(sock.getOutputStream))
  connect()

  private def connect(): Unit = {
    val greeting = new ByteReader(io.read())
    require(greeting.u8() == 0x0a, "unexpected protocol version")
    greeting.nulTerminated() // server version
    greeting.u32() // connection id
    val salt1 = greeting.bytes(8); greeting.u8() // salt part 1 + filler
    val capsLow = greeting.u16()
    greeting.u8(); greeting.u16() // charset, status
    val capsHigh = greeting.u16()
    greeting.u8() // auth-plugin-data length
    greeting.bytes(10) // reserved
    val salt2 = greeting.bytes(12) // salt part 2 (before the trailing NUL)
    val salt = salt1 ++ salt2
    val serverCaps = capsLow.toLong | (capsHigh.toLong << 16)
    require((serverCaps & CLIENT_PROTOCOL_41) != 0, "server is not protocol 4.1")
    var clientCaps = CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION |
      CLIENT_PLUGIN_AUTH | CLIENT_CONNECT_WITH_DB | CLIENT_LONG_PASSWORD
    if (useTls) {
      require((serverCaps & CLIENT_SSL) != 0, "server does not offer TLS")
      clientCaps |= CLIENT_SSL
      // SSLRequest: the capability prefix alone (32-byte payload), then
      // the socket upgrades and the real HandshakeResponse goes over TLS
      io.write(new ByteWriter()
        .u32(clientCaps).u32(16777216L).u8(charset)
        .raw(new Array[Byte](23)).result())
      io.flush()
      val expectSeq = io.seq // write() already advanced past SSLRequest
      val trustAll = new javax.net.ssl.X509TrustManager {
        def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
        def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      }
      val ctx = javax.net.ssl.SSLContext.getInstance("TLSv1.2")
      ctx.init(null, Array[javax.net.ssl.TrustManager](trustAll), null)
      val ssl = ctx.getSocketFactory.createSocket(sock, host, port, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      ssl.setUseClientMode(true)
      ssl.startHandshake()
      sock = ssl
      io = new PacketIo(
        new java.io.BufferedInputStream(ssl.getInputStream),
        new java.io.BufferedOutputStream(ssl.getOutputStream))
      io.seq = expectSeq
    }
    // mysql_native_password scramble over the 20-byte nonce; empty
    // password sends an empty auth response (both the reference's
    // default and ours accept it)
    val auth =
      if (authPlugin == "mysql_native_password")
        MysqlServer.nativePasswordScramble(password, salt)
      else Array.emptyByteArray // foreign plugin: expect an auth switch
    val resp = new ByteWriter()
      .u32(clientCaps).u32(16777216L).u8(charset)
      .raw(new Array[Byte](23))
      .nulTerminated(user)
      .u8(auth.length).raw(auth)
      .nulTerminated(database)
      .nulTerminated(authPlugin)
      .result()
    io.write(resp)
    io.flush()
    var answer = io.read()
    if ((answer.length == 2 && (answer(0) & 0xff) == 0x01 &&
         (answer(1) & 0xff) == 0x04) ||
        (answer.length == 1 && (answer(0) & 0xff) == 0x04)) {
      // caching_sha2 full authentication — AuthMoreData(0x01) + 0x04
      // "perform full authentication" (bare 0x04 accepted for the
      // reference's FastAuthFail spelling): answer the PLAINTEXT
      // password, NUL-terminated — ONLY over TLS. A server eliciting it
      // on cleartext would be extracting the plaintext password (real
      // connectors refuse; so do we).
      require(useTls,
        "server requested caching_sha2 full auth over an unencrypted " +
          "channel; refusing to send the plaintext password without TLS")
      io.write(new ByteWriter().nulTerminated(password).result())
      io.flush()
      answer = io.read()
    }
    if ((answer(0) & 0xff) == 0xfe && answer.length > 1) {
      // AuthSwitchRequest: plugin name + fresh nonce; answer the
      // requested plugin's raw scramble
      val sw = new ByteReader(answer)
      sw.u8()
      val plugin = sw.nulTerminated()
      require(plugin == "mysql_native_password", s"unsupported switch: $plugin")
      val nonce = sw.bytes(math.min(20, sw.remaining))
      val scr = MysqlServer.nativePasswordScramble(password, nonce)
      io.write(if (scr.isEmpty) Array(0.toByte) else scr)
      io.flush()
      answer = io.read()
    }
    require((answer(0) & 0xff) == 0x00,
      s"handshake rejected: ${describeErr(answer)}")
  }

  private def describeErr(p: Array[Byte]): String = {
    val r = new ByteReader(p)
    r.u8() // 0xff
    val code = r.u16()
    r.u8(); r.bytes(5) // '#', sqlstate
    s"[$code] ${new String(r.rest(), "UTF-8")}"
  }

  private def command(body: Array[Byte]): Unit = {
    io.resetSeq()
    io.write(body)
    io.flush()
  }

  def ping(): Boolean = {
    command(Array(COM_PING.toByte))
    (io.read()(0) & 0xff) == 0x00
  }

  def query(sql: String): Either[Ok, ResultSet] = {
    command(Array(COM_QUERY.toByte) ++ sql.getBytes("UTF-8"))
    readQueryResponse(binary = false)
  }

  def prepare(sql: String): Long = {
    command(Array(COM_STMT_PREPARE.toByte) ++ sql.getBytes("UTF-8"))
    val first = io.read()
    if ((first(0) & 0xff) == 0xff) throw new RuntimeException(describeErr(first))
    val r = new ByteReader(first)
    r.u8()
    val id = r.u32()
    val nCols = r.u16()
    val nParams = r.u16()
    // drain param definitions + EOF, column definitions + EOF
    if (nParams > 0) { (0 until nParams).foreach(_ => io.read()); io.read() }
    if (nCols > 0) { (0 until nCols).foreach(_ => io.read()); io.read() }
    id
  }

  /** Execute a prepared statement with typed params (Long, Int, Double,
    * String, java.sql.Date, java.sql.Timestamp, null). With
    * `rebind = false` the types block is omitted (new_params_bound_flag
    * 0) and the server must reuse the types it cached from the first
    * execute — the protocol's steady-state re-execute shape. */
  def executePrepared(id: Long, params: Seq[Any],
                      rebind: Boolean = true): Either[Ok, ResultSet] = {
    val w = new ByteWriter()
      .u8(COM_STMT_EXECUTE).u32(id).u8(0).u32(1L)
    writeParams(w, params, rebind)
    command(w.result())
    readQueryResponse(binary = true)
  }

  /** Shared binary-protocol parameter block: NULL bitmap, optional types
    * block, then values. ONE encoder for both the plain and the cursor
    * execute so the declared type (typeOf) and the written encoding can
    * never disagree — a divergence desyncs the server's fixed-width
    * reads for every following param. */
  private def writeParams(w: ByteWriter, params: Seq[Any], rebind: Boolean): Unit = {
    if (params.isEmpty) return
    val bitmap = new Array[Byte]((params.length + 7) / 8)
    params.zipWithIndex.foreach { case (p, i) =>
      if (p == null) bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte
    }
    w.raw(bitmap).u8(if (rebind) 1 else 0)
    if (rebind) params.foreach { p => w.u8(typeOf(p)); w.u8(0) }
    params.foreach {
      case null => ()
      case v: Long => w.u64(v)
      case v: Int => w.u32(v.toLong)
      case v: Double => w.u64(java.lang.Double.doubleToLongBits(v))
      case v: String => w.lenencString(v)
      case d: java.sql.Date =>
        val ld = d.toLocalDate
        w.u8(4).u16(ld.getYear).u8(ld.getMonthValue).u8(ld.getDayOfMonth)
      case t: java.sql.Timestamp =>
        val ldt = java.time.LocalDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
        w.u8(11).u16(ldt.getYear).u8(ldt.getMonthValue).u8(ldt.getDayOfMonth)
          .u8(ldt.getHour).u8(ldt.getMinute).u8(ldt.getSecond)
          .u32((ldt.getNano / 1000).toLong)
      case other => w.lenencString(other.toString)
    }
  }

  private def typeOf(p: Any): Int = p match {
    case null => TYPE_NULL
    case _: Long => TYPE_LONGLONG
    case _: Int => TYPE_LONG
    case _: Double => TYPE_DOUBLE
    case _: java.sql.Date => TYPE_DATE
    case _: java.sql.Timestamp => TYPE_DATETIME
    case _ => TYPE_VAR_STRING
  }

  def closeStatement(id: Long): Unit =
    command(new ByteWriter().u8(COM_STMT_CLOSE).u32(id).result())

  /** COM_FIELD_LIST: the legacy per-table column listing (NUL-terminated
    * table name, empty wildcard) → column names. */
  def fieldList(table: String): Seq[String] = {
    command(Array(COM_FIELD_LIST.toByte) ++ table.getBytes("UTF-8") :+ 0.toByte)
    val names = Seq.newBuilder[String]
    var done = false
    while (!done) {
      val p = io.read()
      if ((p(0) & 0xff) == 0xff) throw new RuntimeException(describeErr(p))
      if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true
      else {
        val d = new ByteReader(p)
        d.lenencString(); d.lenencString(); d.lenencString(); d.lenencString()
        names += d.lenencString()
      }
    }
    names.result()
  }

  /** Open a read-only cursor (CURSOR_TYPE_READ_ONLY execute): the server
    * answers column definitions only, EOF flagged CURSOR_EXISTS; rows
    * come through [[fetch]]. Returns (column names, column types). */
  def executePreparedCursor(id: Long, params: Seq[Any]): (Seq[String], Seq[Int]) = {
    val w = new ByteWriter()
      .u8(COM_STMT_EXECUTE).u32(id).u8(CURSOR_TYPE_READ_ONLY).u32(1L)
    writeParams(w, params, rebind = true)
    command(w.result())
    val first = io.read()
    if ((first(0) & 0xff) == 0xff) throw new RuntimeException(describeErr(first))
    val nCols = new ByteReader(first).lenencInt().toInt
    val defs = (0 until nCols).map { _ =>
      val d = new ByteReader(io.read())
      d.lenencString(); d.lenencString(); d.lenencString(); d.lenencString()
      val name = d.lenencString()
      d.lenencString()
      d.u8(); d.u16(); d.u32()
      val tpe = d.u8()
      (name, tpe)
    }
    val eof = new ByteReader(io.read())
    eof.u8(); eof.u16() // 0xfe, warnings
    require((eof.u16() & SERVER_STATUS_CURSOR_EXISTS) != 0,
      "server did not open a cursor")
    cursorTypes(id) = defs.map(_._2)
    (defs.map(_._1), defs.map(_._2))
  }

  private val cursorTypes = scala.collection.mutable.Map.empty[Long, Seq[Int]]

  /** Fetch up to n rows from an open cursor; returns (rows, done). */
  def fetch(id: Long, n: Int): (Seq[Seq[String]], Boolean) = {
    val types = cursorTypes.getOrElse(id,
      throw new IllegalStateException(s"no cursor opened for $id"))
    command(new ByteWriter().u8(COM_STMT_FETCH).u32(id).u32(n.toLong).result())
    val rows = Seq.newBuilder[Seq[String]]
    var done = false
    var ended = false
    while (!ended) {
      val p = io.read()
      if ((p(0) & 0xff) == 0xff) throw new RuntimeException(describeErr(p))
      if ((p(0) & 0xff) == 0xfe && p.length < 9) {
        val e = new ByteReader(p)
        e.u8(); e.u16()
        done = (e.u16() & SERVER_STATUS_LAST_ROW_SENT) != 0
        ended = true
      } else rows += decodeBinaryRow(p, types)
    }
    if (done) cursorTypes.remove(id)
    (rows.result(), done)
  }

  private def readQueryResponse(binary: Boolean): Either[Ok, ResultSet] = {
    val first = io.read()
    (first(0) & 0xff) match {
      case 0x00 =>
        val r = new ByteReader(first)
        r.u8()
        val affected = r.lenencInt()
        r.lenencInt() // last insert id
        r.u16(); r.u16() // status, warnings
        val info = if (r.remaining > 0) new String(r.rest(), "UTF-8") else ""
        Left(Ok(affected, info))
      case 0xff => throw new RuntimeException(describeErr(first))
      case _ =>
        val nCols = new ByteReader(first).lenencInt().toInt
        val defs = (0 until nCols).map { _ =>
          val d = new ByteReader(io.read())
          d.lenencString(); d.lenencString(); d.lenencString(); d.lenencString()
          val name = d.lenencString()
          d.lenencString() // org_name
          d.u8(); d.u16(); d.u32() // fixed-len marker, charset, length
          val tpe = d.u8()
          (name, tpe)
        }
        io.read() // EOF after column definitions
        val rows = Seq.newBuilder[Seq[String]]
        var done = false
        while (!done) {
          val p = io.read()
          if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true
          else rows += (if (binary) decodeBinaryRow(p, defs.map(_._2))
                        else decodeTextRow(p, nCols))
        }
        Right(ResultSet(defs.map(_._1), defs.map(_._2), rows.result()))
    }
  }

  private def decodeTextRow(p: Array[Byte], nCols: Int): Seq[String] = {
    val r = new ByteReader(p)
    (0 until nCols).map(_ => r.lenencString())
  }

  private def decodeBinaryRow(p: Array[Byte], types: Seq[Int]): Seq[String] = {
    val r = new ByteReader(p)
    r.u8() // 0x00 header
    val bitmap = r.bytes((types.length + 9) / 8)
    def isNull(i: Int) = { val bit = i + 2; (bitmap(bit / 8) & (1 << (bit % 8))) != 0 }
    types.zipWithIndex.map { case (t, i) =>
      if (isNull(i)) null
      else MysqlServer.textOf(MysqlServer.readBinaryValue(r, t))
    }
  }

  def close(): Unit = {
    try command(Array(COM_QUIT.toByte)) catch { case _: Throwable => }
    try sock.close() catch { case _: Throwable => }
  }
}
