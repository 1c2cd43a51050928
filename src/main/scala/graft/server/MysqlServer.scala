package graft.server

import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sqlx.Commands
import graft.catalog.{Catalog, Warehouse}
import MysqlWire._

/** MySQL wire-protocol entry point — the reference's primary interface
  * (mindsdb/api/mysql/mysql_proxy/mysql_proxy.py:594 `MysqlProxy.handle`;
  * every tests/integration/flows/test_mysql_api.py case connects this
  * way), re-expressed as a loopback socket server over the existing
  * [[Commands]] router.
  *
  * Semantics mirrored from the reference:
  *  - handshake accepts any credentials (check_auth in the default
  *    no-password config always succeeds — mysql_proxy.py:141-285);
  *  - each connection gets its own session ([[Commands]] instance) over
  *    the SHARED catalog + warehouse, so DDL persists across reconnects
  *    exactly like server-side state;
  *  - COM_QUERY routes to Commands.execute; a status/message acknowledge
  *    frame becomes an OK packet carrying affected_rows, anything else
  *    streams as a text result set (chunked 1000 rows per flush like the
  *    reference's send_table_packets, via toLocalIterator — the server
  *    never materializes the full result);
  *  - COM_STMT_PREPARE/EXECUTE implement the binary protocol over the
  *    `?`-positional parameterized route (planner/query_prepare.py);
  *  - COM_PING/INIT_DB/STMT_RESET/SET_OPTION → OK, COM_FIELD_LIST →
  *    column definitions + EOF, COM_DEBUG → EOF, COM_QUIT closes
  *    (mysql_proxy.py:620-700).
  */
final class MysqlServer(spark: SparkSession, sfDir: String, port: Int = 0,
    /** configured credentials (reference config["auth"], middleware.py
      * check_auth:168). An EMPTY password keeps the reference's default
      * accept-any behavior; a configured password requires the username
      * to match and the auth response to be either the
      * mysql_native_password scramble or the plaintext. */
    authUser: String = "mindsdb",
    authPassword: String = "") {

  private val catalog = new Catalog(spark, sfDir)
  private val warehouse = Warehouse.temp(spark)
  // server-global jobs (the reference's jobs_controller scope): a job
  // created on one connection survives into the next
  private val serverJobs = new graft.incremental.Jobs
  // per-tenant namespaces; "" is this shared default state
  private val tenants = new graft.catalog.Tenants(spark, sfDir,
    graft.catalog.Tenants.State(catalog, warehouse, serverJobs))
  // the wire server runs its own scheduler pass over every tenant's
  // store — a CREATE JOB over the MySQL protocol must execute, same as
  // over REST (reference scheduler is process-global, not per-API)
  private val jobsDaemon =
    new graft.incremental.JobsDaemon(() => tenants.allStates().map(_.jobs))
  private val listener = new ServerSocket(port, 50, InetAddress.getLoopbackAddress)
  private val running = new AtomicBoolean(false)
  private val connCounter = new AtomicInteger(0)
  private var acceptThread: Thread = _

  def boundPort: Int = listener.getLocalPort

  def start(): MysqlServer = {
    running.set(true)
    acceptThread = new Thread(() => {
      while (running.get()) {
        try {
          val sock = listener.accept()
          val t = new Thread(() => handle(sock), s"mysql-conn-${connCounter.incrementAndGet()}")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: Throwable if !running.get() => // closed during stop()
          case e: Throwable => System.err.println(s"[mysql-server] accept: $e")
        }
      }
    }, "mysql-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()
    jobsDaemon.start()
    this
  }

  def stop(): Unit = {
    running.set(false)
    jobsDaemon.stop()
    try listener.close() catch { case _: Throwable => }
  }

  // ------------------------------------------------------------------

  private def handle(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    // handshake phase reads the RAW input stream (no read-ahead): an
    // SSLRequest upgrade hands the very next socket bytes (ClientHello)
    // to the TLS layer, so nothing may sit in a buffer; the session
    // PacketIo re-wraps buffered after auth completes
    var io = new PacketIo(sock.getInputStream,
      new java.io.BufferedOutputStream(sock.getOutputStream))
    var session = new Commands(spark, catalog, warehouse, serverJobs)
    val stmtIds = new AtomicLong(0)
    val prepared = mutable.Map.empty[Long, (String, Int)] // id -> (sql, nParams)
    // open read-only cursors: id -> (remaining rows, fields)
    val cursors = mutable.Map.empty[Long, (Iterator[Row], Array[StructField])]
    // param types cached from the first EXECUTE: a client re-executing
    // with new_params_bound_flag=0 sends values only (protocol contract)
    val stmtTypes = mutable.Map.empty[Long, Array[Int]]
    try {
      val (clientCharset, io2) = handshake(sock, io)
      if (clientCharset < 0) return
      io = io2
      // charset negotiation: the HandshakeResponse41 charset byte drives
      // the session's character_set_* triple, same as a SET NAMES issued
      // by the client (connectors read @@character_set_client back)
      def applyCharset(to: Commands): Unit =
        MysqlServer.charsetName(clientCharset).foreach { n =>
          try to.execute(s"SET NAMES $n")
          catch { case _: Throwable => }
        }
      applyCharset(session)
      var open = true
      while (open) {
        io.resetSeq()
        val body = io.read()
        if (body == null || body.isEmpty) open = false
        else {
          val r = new ByteReader(body)
          r.u8() match {
            case COM_QUIT => open = false
            case COM_QUERY =>
              val sql = new String(body, 1, body.length - 1, "UTF-8")
              graft.catalog.Tenants.switchStatement(sql) match {
                case Some(id) =>
                  // SET tenant='x': swap this connection onto the
                  // tenant's catalog/warehouse/jobs (company_id analog);
                  // constructing the session rebinds this thread's
                  // meta-table providers to the tenant's frames
                  val st = tenants.of(id)
                  session = new Commands(spark, st.catalog, st.warehouse, st.jobs)
                  // the fresh session must keep the negotiated charset —
                  // connectors re-probe @@character_set_client after any
                  // statement and would see the default otherwise
                  applyCharset(session)
                  io.write(okPacket(info =
                    s"tenant ${if (id.trim.isEmpty) "default" else id.trim.toLowerCase}"))
                  io.flush()
                case None => respond(io, session, sql)
              }
            case COM_FIELD_LIST =>
              // legacy metadata command (mysql CLI tab-completion, old
              // connectors): table name NUL-terminated, optional field
              // wildcard; answer is column definitions + EOF
              val rest = new String(body, 1, body.length - 1, "UTF-8")
              val table = rest.takeWhile(c => c != '\u0000' && c != ' ')
              try {
                val fields = session.execute(s"SELECT * FROM $table LIMIT 0")
                  .schema.fields
                fields.foreach(f => io.write(
                  columnDefinition("mindsdb", table, f.name, f.dataType, f.nullable)))
                io.write(eofPacket())
              } catch {
                case e: Throwable =>
                  io.write(errPacket(1146, "42S02",
                    Option(e.getMessage).getOrElse(e.toString).take(500)))
              }
              io.flush()
            case COM_INIT_DB | COM_STMT_RESET | COM_SET_OPTION =>
              io.write(okPacket()); io.flush()
            case COM_PING => io.write(okPacket()); io.flush()
            case COM_DEBUG => io.write(eofPacket()); io.flush()
            case COM_STMT_PREPARE =>
              val sql = new String(body, 1, body.length - 1, "UTF-8")
              stmtPrepare(io, prepared, stmtIds, sql)
            case COM_STMT_EXECUTE =>
              stmtExecute(io, session, prepared, cursors, stmtTypes, r)
            case COM_STMT_FETCH =>
              stmtFetch(io, cursors, r)
            case COM_STMT_CLOSE =>
              val id = r.u32() // no response by protocol
              prepared.remove(id)
              cursors.remove(id)
              stmtTypes.remove(id)
            case other =>
              io.write(errPacket(1047, "08S01", s"unknown command $other"))
              io.flush()
          }
        }
      }
    } catch {
      case _: java.io.EOFException => // client went away
      case e: Throwable =>
        try {
          io.write(errPacket(1064, "42000", Option(e.getMessage).getOrElse(e.toString)))
          io.flush()
        } catch { case _: Throwable => }
    } finally {
      try sock.close() catch { case _: Throwable => }
    }
  }

  /** Protocol-v10 greeting → HandshakeResponse41 → OK/ERR. With the
    * default empty password, credentials are accepted unconditionally
    * (reference default config); with a configured password the
    * mysql_native_password scramble (or plaintext) is verified —
    * mysql_proxy.py:141-285 + middleware.py check_auth. */
  private def handshake(sock: Socket, io0: PacketIo): (Int, PacketIo) = {
    var io = io0
    val salt = new Array[Byte](20)
    new java.util.Random().nextBytes(salt) // per-connection nonce
    salt.indices.foreach(i => if (salt(i) == 0) salt(i) = 1) // no NULs in auth data
    val caps = ServerCapabilities | CLIENT_SSL
    val greeting = new ByteWriter()
      .u8(0x0a).nulTerminated("8.0.17-graft")
      .u32(connCounter.get().toLong)
      .raw(java.util.Arrays.copyOfRange(salt, 0, 8)).u8(0)
      .u16((caps & 0xffff).toInt)
      .u8(CHARSET_UTF8).u16(0x0002)
      .u16(((caps >> 16) & 0xffff).toInt)
      .u8(21) // auth-plugin-data length (20 + NUL)
      .raw(new Array[Byte](10))
      .raw(java.util.Arrays.copyOfRange(salt, 8, 20)).u8(0)
      .nulTerminated("mysql_native_password")
      .result()
    io.write(greeting)
    io.flush()
    var resp = io.read()
    if (resp == null || resp.isEmpty) { io.write(okPacket()); io.flush(); return (-1, io) }
    var r = new ByteReader(resp)
    var clientCaps = r.u32()
    var isSsl = false
    if ((clientCaps & CLIENT_SSL) != 0 && resp.length < 36) {
      // bare SSLRequest (mysql_proxy.py:184-195): upgrade the accepted
      // socket to a server-mode TLS session over the self-signed
      // service cert (make_ssl_cert analog), then read the REAL
      // HandshakeResponse over the secured channel. The pre-upgrade
      // PacketIo read the raw stream, so the ClientHello that follows
      // is still on the socket for the TLS layer.
      val expectSeq = io.seq
      val f = MysqlServer.tlsContext.getSocketFactory
        .asInstanceOf[javax.net.ssl.SSLSocketFactory]
      val ssl = f.createSocket(sock, null, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      ssl.setUseClientMode(false)
      ssl.startHandshake()
      io = new PacketIo(new java.io.BufferedInputStream(ssl.getInputStream),
        new java.io.BufferedOutputStream(ssl.getOutputStream))
      io.seq = expectSeq
      isSsl = true
      resp = io.read()
      if (resp == null || resp.isEmpty) { io.write(okPacket()); io.flush(); return (-1, io) }
      r = new ByteReader(resp)
      clientCaps = r.u32()
    }
    // parse username + auth response; with no configured password the
    // parse stays best-effort and auth always succeeds
    var username = ""
    var authResponse = Array.emptyByteArray
    var clientCharset = 0
    var clientPlugin = "mysql_native_password"
    try {
      r.u32() // max packet size
      clientCharset = r.u8() // charset
      r.skip(23)
      username = r.nulTerminated()
      authResponse =
        if ((clientCaps & CLIENT_PLUGIN_AUTH_LENENC) != 0) r.lenencBytes()
        else if ((clientCaps & CLIENT_SECURE_CONNECTION) != 0) r.bytes(r.u8())
        else r.nulTerminated().getBytes("UTF-8")
      if ((clientCaps & CLIENT_CONNECT_WITH_DB) != 0) r.nulTerminated() // database
      if ((clientCaps & CLIENT_PLUGIN_AUTH) != 0) clientPlugin = r.nulTerminated()
    } catch { case _: Throwable => }
    // caching_sha2_password FULL AUTH over the secured channel
    // (mysql_proxy.py get_fast_auth_password / FastAuthFail packet):
    // under TLS the server answers 0x04 ("perform full authentication")
    // and the client sends its plaintext password — safe only because
    // the channel is encrypted, which is exactly the reference's gate
    // ("cant switch to caching_sha2_password without SSL").
    var plaintextAuth = false
    if (authPassword.nonEmpty && isSsl && clientPlugin == "caching_sha2_password") {
      // AuthMoreData packet (0x01 tag) carrying 0x04 "perform full
      // authentication" — the framing real MySQL 8 connectors parse
      io.write(Array[Byte](0x01, 0x04))
      io.flush()
      val ans = try io.read() catch { case _: Throwable => Array.emptyByteArray }
      // PasswordAnswer: NUL-terminated plaintext (password_answer.py)
      authResponse =
        if (ans == null) Array.emptyByteArray
        else if (ans.nonEmpty && ans.last == 0) ans.dropRight(1)
        else ans
      plaintextAuth = true
    }
    // client speaks a different auth plugin (MySQL 8 connectors default
    // to caching_sha2_password): AuthSwitchRequest redirects it to
    // mysql_native_password with the same nonce — mysql_proxy.py
    // switch_auth; the client re-scrambles and answers raw bytes.
    // Non-TLS connections always take this downgrade (the reference
    // refuses caching_sha2 without SSL for the same reason).
    else if (authPassword.nonEmpty && clientPlugin != "mysql_native_password") {
      io.write(new ByteWriter().u8(0xfe)
        .nulTerminated("mysql_native_password")
        .raw(salt).u8(0).result())
      io.flush()
      authResponse = try io.read() catch { case _: Throwable => Array.emptyByteArray }
      // a one-NUL response means "empty password" (reference switch_out)
      if (authResponse.length == 1 && authResponse(0) == 0)
        authResponse = Array.emptyByteArray
    }
    if (authPassword.nonEmpty) {
      val expected = MysqlServer.nativePasswordScramble(authPassword, salt)
      val okUser = username == authUser
      // full-auth answered PLAINTEXT over TLS; otherwise the native
      // scramble (or the legacy plaintext fallback) verifies
      val okPass =
        if (plaintextAuth)
          java.util.Arrays.equals(authResponse, authPassword.getBytes("UTF-8"))
        else java.util.Arrays.equals(authResponse, expected) ||
          java.util.Arrays.equals(authResponse, authPassword.getBytes("UTF-8"))
      if (!okUser || !okPass) {
        io.write(errPacket(1045, "28000", s"Access denied for user $username"))
        io.flush()
        return (-1, io)
      }
    }
    io.write(okPacket())
    io.flush()
    // non-TLS sessions re-wrap BUFFERED for the command loop (the raw
    // stream was only needed while an SSLRequest upgrade was possible;
    // nothing is read ahead before this point, so no bytes are lost) —
    // the TLS branch already built a buffered PacketIo over the SSL
    // streams
    val sessionIo =
      if (isSsl) io
      else new PacketIo(new java.io.BufferedInputStream(sock.getInputStream),
        new java.io.BufferedOutputStream(sock.getOutputStream))
    (clientCharset, sessionIo)
  }

  /** True when the frame is the router's DML/DDL acknowledge shape —
    * sent on the wire as a protocol OK packet, like the reference's
    * RESPONSE_TYPE.OK path. */
  private def isOkShape(df: DataFrame): Boolean = {
    val names = df.schema.fieldNames.toSeq
    names == Seq("status", "message") ||
      names == Seq("status", "message", "affected_rows")
  }

  private def respond(io: PacketIo, session: Commands, sql: String): Unit =
    try {
      val df = session.execute(sql)
      if (isOkShape(df)) {
        val row = df.collect().headOption
        val affected = row.filter(_.length > 2).map(_.getLong(2)).getOrElse(0L)
        val msg = row.map(_.getString(1)).getOrElse("")
        io.write(okPacket(affectedRows = affected, info = msg))
        io.flush()
      } else sendTextResultSet(io, df)
    } catch {
      case e: Throwable =>
        io.write(errPacket(1064, "42000",
          Option(e.getMessage).getOrElse(e.toString).take(2000)))
        io.flush()
    }

  /** Column defs + EOF, then rows chunked 1000 per flush (the reference's
    * send_table_packets chunk_size), sourced from toLocalIterator so only
    * one partition is resident driver-side at a time. */
  private def sendTextResultSet(io: PacketIo, df: DataFrame): Unit = {
    val fields = df.schema.fields
    io.write(new ByteWriter().lenencInt(fields.length.toLong).result())
    fields.foreach(f =>
      io.write(columnDefinition("mindsdb", "", f.name, f.dataType, f.nullable)))
    io.write(eofPacket())
    val it = df.toLocalIterator()
    var inChunk = 0
    while (it.hasNext) {
      io.write(textRow(it.next(), fields))
      inChunk += 1
      if (inChunk == 1000) { io.flush(); inChunk = 0 }
    }
    io.write(eofPacket())
    io.flush()
  }

  private def textRow(row: Row, fields: Array[StructField]): Array[Byte] = {
    val w = new ByteWriter()
    var i = 0
    while (i < fields.length) {
      if (row.isNullAt(i)) w.nullMarker()
      else row.get(i) match {
        case b: Array[Byte] => w.lenencBytes(b)
        case v => w.lenencString(MysqlServer.textOf(v))
      }
      i += 1
    }
    w.result()
  }

  // ------------------------------------------------------------------
  // binary protocol (COM_STMT_*)
  // ------------------------------------------------------------------

  private def stmtPrepare(io: PacketIo, prepared: mutable.Map[Long, (String, Int)],
                          ids: AtomicLong, sql: String): Unit = {
    val nParams = MysqlServer.countPlaceholders(sql)
    val id = ids.incrementAndGet()
    prepared(id) = (sql, nParams)
    // COM_STMT_PREPARE_OK with num_columns=0: column metadata is deferred
    // to execute time (legal per protocol; the repo's own client and the
    // common connectors re-read metadata from the execute response)
    io.write(new ByteWriter().u8(0x00).u32(id).u16(0).u16(nParams)
      .u8(0).u16(0).result())
    if (nParams > 0) {
      (1 to nParams).foreach(i =>
        io.write(columnDefinition("", "", s"?$i", StringType, nullable = true)))
      io.write(eofPacket())
    }
    io.flush()
  }

  private def stmtExecute(io: PacketIo, session: Commands,
                          prepared: mutable.Map[Long, (String, Int)],
                          cursors: mutable.Map[Long, (Iterator[Row], Array[StructField])],
                          stmtTypes: mutable.Map[Long, Array[Int]],
                          r: ByteReader): Unit =
    try {
      val id = r.u32()
      val (sql, nParams) = prepared.getOrElse(id,
        throw new IllegalStateException(s"unknown statement id $id"))
      val flags = r.u8()
      r.u32() // iteration count (always 1)
      val params: Seq[Any] =
        if (nParams == 0) Seq.empty
        else {
          val nullBitmap = r.bytes((nParams + 7) / 8)
          def isNull(i: Int) = (nullBitmap(i / 8) & (1 << (i % 8))) != 0
          val newBound = r.u8()
          val types: Array[Int] =
            if (newBound == 1) {
              val ts = new Array[Int](nParams)
              var i = 0
              while (i < nParams) { ts(i) = r.u8(); r.u8(); i += 1 } // type + sign
              stmtTypes(id) = ts // cache for re-executes with flag=0
              ts
            } else stmtTypes.getOrElse(id, throw new IllegalStateException(
              "re-execute without bound types and no cached types for statement"))
          (0 until nParams).map { i =>
            if (isNull(i)) null else MysqlServer.readBinaryValue(r, types(i))
          }
        }
      val df =
        if (params.isEmpty) session.execute(sql)
        else session.executePositional(sql, params)
      if (isOkShape(df)) {
        val row = df.collect().headOption
        val affected = row.filter(_.length > 2).map(_.getLong(2)).getOrElse(0L)
        io.write(okPacket(affectedRows = affected))
        io.flush()
      } else if ((flags & CURSOR_TYPE_READ_ONLY) != 0) {
        // cursor open (mysql_proxy.py answer_stmt_execute cursor branch):
        // only column definitions go out now, EOF carries CURSOR_EXISTS;
        // rows flow through COM_STMT_FETCH in client-sized batches
        val fields = df.schema.fields
        cursors(id) = (scala.jdk.CollectionConverters
          .IteratorHasAsScala(df.toLocalIterator()).asScala, fields)
        io.write(new ByteWriter().lenencInt(fields.length.toLong).result())
        fields.foreach(f =>
          io.write(columnDefinition("mindsdb", "", f.name, f.dataType, f.nullable)))
        io.write(eofPacket(0x0002 | SERVER_STATUS_CURSOR_EXISTS))
        io.flush()
      } else sendBinaryResultSet(io, df)
    } catch {
      case e: Throwable =>
        io.write(errPacket(1064, "42000",
          Option(e.getMessage).getOrElse(e.toString).take(2000)))
        io.flush()
    }

  /** COM_STMT_FETCH (mysql_proxy.py answer_stmt_fetch): the requested
    * row count in binary format, then EOF — flagged LAST_ROW_SENT when
    * the cursor is exhausted. */
  private def stmtFetch(io: PacketIo,
                        cursors: mutable.Map[Long, (Iterator[Row], Array[StructField])],
                        r: ByteReader): Unit =
    try {
      val id = r.u32()
      val n = r.u32()
      val (it, fields) = cursors.getOrElse(id,
        throw new IllegalStateException(s"no open cursor for statement $id"))
      var sent = 0L
      while (sent < n && it.hasNext) {
        io.write(MysqlServer.binaryRow(it.next(), fields))
        sent += 1
      }
      val done = !it.hasNext
      if (done) cursors.remove(id)
      io.write(eofPacket(0x0002 |
        (if (done) SERVER_STATUS_LAST_ROW_SENT else SERVER_STATUS_CURSOR_EXISTS)))
      io.flush()
    } catch {
      case e: Throwable =>
        io.write(errPacket(1064, "42000",
          Option(e.getMessage).getOrElse(e.toString).take(2000)))
        io.flush()
    }

  private def sendBinaryResultSet(io: PacketIo, df: DataFrame): Unit = {
    val fields = df.schema.fields
    io.write(new ByteWriter().lenencInt(fields.length.toLong).result())
    fields.foreach(f =>
      io.write(columnDefinition("mindsdb", "", f.name, f.dataType, f.nullable)))
    io.write(eofPacket())
    val it = df.toLocalIterator()
    var inChunk = 0
    while (it.hasNext) {
      io.write(MysqlServer.binaryRow(it.next(), fields))
      inChunk += 1
      if (inChunk == 1000) { io.flush(); inChunk = 0 }
    }
    io.write(eofPacket())
    io.flush()
  }
}

object MysqlServer {

  /** Client-charset ids → SET NAMES charset (the handful every real
    * connector sends; unknown ids negotiate nothing and keep the
    * session default). */
  def charsetName(id: Int): Option[String] = id match {
    case 8 | 5 => Some("latin1")
    case 33 => Some("utf8")
    case 45 | 46 | 224 | 255 => Some("utf8mb4")
    case 63 => Some("binary")
    case _ => None
  }

  /** Process-wide TLS context over a self-signed service certificate —
    * the reference generates one at startup when cert_path is absent
    * (utilities/wizards.py make_ssl_cert: self-signed CN=mdb_autogen,
    * 10-year validity). The JDK ships no X.509 builder API, so the
    * keypair+cert come from the JDK's own `keytool` into a temp PKCS12
    * store, loaded once lazily. */
  lazy val tlsContext: javax.net.ssl.SSLContext = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mysql_tls")
    dir.toFile.deleteOnExit()
    val ksPath = dir.resolve("server.p12")
    val pw = "graft-tls-store"
    val keytool = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/keytool",
      "-genkeypair", "-alias", "mdb_autogen", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "3650",
      "-dname", "CN=mdb_autogen, C=US, ST=California, L=Berkeley, O=Graft",
      "-storetype", "PKCS12", "-keystore", ksPath.toString, "-storepass", pw)
      .redirectErrorStream(true).start()
    val out = new String(keytool.getInputStream.readAllBytes(), "UTF-8")
    require(keytool.waitFor() == 0, s"keytool failed: $out")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(ksPath)
    try store.load(in, pw.toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, pw.toCharArray)
    // TLSv1.2 minimum, the reference's ssl_context.minimum_version
    val ctx = javax.net.ssl.SSLContext.getInstance("TLSv1.2")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** mysql_native_password scramble (the public protocol algorithm,
    * mirrored by the reference's external_libs/mysql_scramble.py:45):
    * SHA1(password) XOR SHA1(salt20 ++ SHA1(SHA1(password))). */
  def nativePasswordScramble(password: String, salt: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha = java.security.MessageDigest.getInstance("SHA-1")
    val stage1 = sha.digest(password.getBytes("UTF-8"))
    sha.reset()
    val stage2 = sha.digest(stage1)
    sha.reset()
    sha.update(salt, 0, 20)
    sha.update(stage2)
    val result = sha.digest()
    result.indices.foreach(i => result(i) = (result(i) ^ stage1(i)).toByte)
    result
  }

  /** Text-protocol rendering: MySQL conventions (1/0 booleans, plain
    * decimal strings, `yyyy-MM-dd HH:mm:ss[.ffffff]` datetimes in the
    * session zone — the engine runs UTC). */
  def textOf(v: Any): String = v match {
    case b: Boolean => if (b) "1" else "0"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case t: java.sql.Timestamp => timestampText(t.toInstant)
    case t: java.time.Instant => timestampText(t)
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case t: java.time.LocalDateTime =>
      timestampText(t.atZone(java.time.ZoneOffset.UTC).toInstant)
    case s: collection.Seq[_] => s.map(x => if (x == null) "NULL" else textOf(x)).mkString("[", ",", "]")
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => s"${textOf(k)}:${if (x == null) "NULL" else textOf(x)}" }.mkString("{", ",", "}")
    case r: Row => (0 until r.length).map(i => if (r.isNullAt(i)) "NULL" else textOf(r.get(i))).mkString("{", ",", "}")
    case other => other.toString
  }

  private def timestampText(i: java.time.Instant): String = {
    val ldt = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    val micros = ldt.getNano / 1000
    if (micros == 0) base else f"$base.$micros%06d"
  }

  /** `?` placeholders outside quoted strings/comments. */
  def countPlaceholders(sql: String): Int = {
    var n = 0; var i = 0; var quote: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == '?') n += 1
      i += 1
    }
    n
  }

  /** Decode one binary-protocol parameter value. */
  def readBinaryValue(r: MysqlWire.ByteReader, tpe: Int): Any = tpe match {
    case TYPE_TINY => r.u8().toByte
    case TYPE_SHORT => r.u16().toShort
    case TYPE_LONG => r.u32().toInt
    case TYPE_LONGLONG => r.u64()
    case TYPE_FLOAT => java.lang.Float.intBitsToFloat(r.u32().toInt)
    case TYPE_DOUBLE => java.lang.Double.longBitsToDouble(r.u64())
    case TYPE_DATE | TYPE_DATETIME =>
      val len = r.u8()
      if (len == 0) java.sql.Timestamp.valueOf("1970-01-01 00:00:00")
      else {
        val y = r.u16(); val mo = r.u8(); val d = r.u8()
        if (len == 4) java.sql.Date.valueOf(f"$y%04d-$mo%02d-$d%02d")
        else {
          val h = r.u8(); val mi = r.u8(); val s = r.u8()
          val micro = if (len >= 11) r.u32() else 0L
          java.sql.Timestamp.from(java.time.LocalDateTime
            .of(y, mo, d, h, mi, s, (micro * 1000).toInt)
            .toInstant(java.time.ZoneOffset.UTC))
        }
      }
    case TYPE_NULL => null
    case _ => new String(r.lenencBytes(), "UTF-8") // VAR_STRING/BLOB/NEWDECIMAL
  }

  /** Binary-protocol row: 0x00 header, NULL bitmap (offset 2), values. */
  def binaryRow(row: Row, fields: Array[StructField]): Array[Byte] = {
    val w = new MysqlWire.ByteWriter().u8(0x00)
    val bitmap = new Array[Byte]((fields.length + 9) / 8)
    var i = 0
    while (i < fields.length) {
      if (row.isNullAt(i)) {
        val bit = i + 2
        bitmap(bit / 8) = (bitmap(bit / 8) | (1 << (bit % 8))).toByte
      }
      i += 1
    }
    w.raw(bitmap)
    i = 0
    while (i < fields.length) {
      if (!row.isNullAt(i)) writeBinaryValue(w, fields(i).dataType, row.get(i))
      i += 1
    }
    w.result()
  }

  private def writeBinaryValue(w: MysqlWire.ByteWriter, dt: DataType, v: Any): Unit =
    dt match {
      case BooleanType => w.u8(if (v.asInstanceOf[Boolean]) 1 else 0)
      case ByteType => w.u8(v.asInstanceOf[Byte].toInt)
      case ShortType => w.u16(v.asInstanceOf[Short].toInt)
      case IntegerType => w.u32(v.asInstanceOf[Int].toLong)
      case LongType => w.u64(v.asInstanceOf[Long])
      case FloatType => w.u32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL)
      case DoubleType => w.u64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case DateType =>
        val ld = v match {
          case d: java.sql.Date => d.toLocalDate
          case d: java.time.LocalDate => d
        }
        w.u8(4).u16(ld.getYear).u8(ld.getMonthValue).u8(ld.getDayOfMonth)
      case TimestampType | TimestampNTZType =>
        val ldt = v match {
          case t: java.sql.Timestamp =>
            java.time.LocalDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
          case t: java.time.Instant =>
            java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC)
          case t: java.time.LocalDateTime => t
        }
        val micros = ldt.getNano / 1000
        w.u8(11).u16(ldt.getYear).u8(ldt.getMonthValue).u8(ldt.getDayOfMonth)
          .u8(ldt.getHour).u8(ldt.getMinute).u8(ldt.getSecond).u32(micros.toLong)
      case BinaryType => w.lenencBytes(v.asInstanceOf[Array[Byte]])
      case _ => w.lenencString(textOf(v))
    }
}
