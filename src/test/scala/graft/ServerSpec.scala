package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.server.{MysqlClient, MysqlServer}

/** MySQL wire-protocol entry point: raw-socket handshake, COM_QUERY text
  * result sets, OK/ERR framing, and the binary prepared-statement
  * protocol — end-to-end against a live loopback server. */
class ServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.engine.Session.build("server-spec")
  val dir = "/root/testdata/sf0.001"

  private var server: MysqlServer = _

  override def beforeAll(): Unit = {
    server = new MysqlServer(spark, dir).start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  private def client() = new MysqlClient("127.0.0.1", server.boundPort)

  test("handshake completes and COM_PING answers OK") {
    val c = client()
    assert(c.ping())
    c.close()
  }

  test("raw handshake packet is a well-formed protocol-v10 greeting") {
    val sock = new java.net.Socket("127.0.0.1", server.boundPort)
    val in = new java.io.DataInputStream(sock.getInputStream)
    val len = in.read() | (in.read() << 8) | (in.read() << 16)
    val seq = in.read()
    assert(seq === 0, "greeting is sequence 0")
    val body = new Array[Byte](len)
    in.readFully(body)
    assert(body(0) === 0x0a, "protocol version 10")
    val verEnd = body.indexOf(0, 1)
    val version = new String(body, 1, verEnd - 1, "UTF-8")
    assert(version.contains("graft"))
    // capability lower bytes must include PROTOCOL_41 (0x0200)
    val capsLow = (body(verEnd + 14) & 0xff) | ((body(verEnd + 15) & 0xff) << 8)
    assert((capsLow & 0x0200) !== 0, "CLIENT_PROTOCOL_41 advertised")
    sock.close()
  }

  test("SHOW DATABASES over the socket decodes to the catalog list") {
    val c = client()
    val Right(rs) = c.query("SHOW DATABASES"): @unchecked
    assert(rs.columns.nonEmpty)
    val names = rs.rows.map(_.head)
    assert(names.contains("graft"), "the project database must be listed")
    assert(names.contains("information_schema"))
    c.close()
  }

  test("SELECT with typed columns round-trips values and NULLs") {
    val c = client()
    val Right(rs) = c.query(
      """SELECT CAST(1 AS BIGINT) AS i, CAST(2.5 AS DOUBLE) AS d,
         'text' AS s, CAST(NULL AS STRING) AS missing,
         DATE '2024-03-01' AS dt,
         TIMESTAMP '2024-03-01 12:30:45' AS ts,
         true AS b"""): @unchecked
    assert(rs.columns === Seq("i", "d", "s", "missing", "dt", "ts", "b"))
    val row = rs.rows.head
    assert(row(0) === "1")
    assert(row(1) === "2.5")
    assert(row(2) === "text")
    assert(row(3) === null, "NULL must arrive as the 0xfb marker")
    assert(row(4) === "2024-03-01")
    assert(row(5) === "2024-03-01 12:30:45")
    assert(row(6) === "1", "booleans render as 1/0 like MySQL")
    c.close()
  }

  test("aggregate over a base table matches the in-process result") {
    val c = client()
    val Right(rs) = c.query(
      "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"): @unchecked
    val direct = graft.engine.Tables.table(spark, dir, "lineitem")
      .groupBy("l_returnflag").count().orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rs.rows.map(r => (r(0), r(1).toLong)) === direct.toSeq)
    c.close()
  }

  test("model join SELECT works through the socket (the reference's flagship flow)") {
    val c = client()
    val Left(ok) = c.query(
      """CREATE MODEL wire_model FROM (SELECT l_quantity, l_extendedprice FROM lineitem)
         PREDICT l_extendedprice USING features='l_quantity', score_column='pred'"""): @unchecked
    assert(ok.info.nonEmpty)
    val Right(rs) = c.query(
      """SELECT l_quantity, pred FROM
         (SELECT l_quantity FROM lineitem LIMIT 5) t JOIN wire_model m"""): @unchecked
    assert(rs.columns === Seq("l_quantity", "pred"))
    assert(rs.rows.size === 5)
    assert(rs.rows.forall(_(1).toDouble > 0.0))
    c.query("DROP MODEL wire_model")
    c.close()
  }

  test("DML answers an OK packet with affected_rows") {
    val c = client()
    c.query("CREATE TABLE wire_dml AS SELECT id AS v FROM range(0, 10)")
    val Left(ok) = c.query("UPDATE wire_dml SET v = 0 WHERE v >= 7"): @unchecked
    assert(ok.affectedRows === 3, "MySQL affected-rows contract over the wire")
    c.query("DROP TABLE wire_dml")
    c.close()
  }

  test("errors come back as ERR packets, and the session survives them") {
    val c = client()
    val e = intercept[RuntimeException](c.query("SELECT * FROM no_such_table_xyz"))
    assert(e.getMessage.contains("[1064]"))
    // connection still usable after the error
    val Right(rs) = c.query("SELECT 1 AS one"): @unchecked
    assert(rs.rows.head.head === "1")
    c.close()
  }

  test("server-side state persists across reconnects (shared warehouse)") {
    val c1 = client()
    c1.query("CREATE TABLE wire_persist AS SELECT 42 AS answer")
    c1.close()
    val c2 = client()
    val Right(rs) = c2.query("SELECT answer FROM wire_persist"): @unchecked
    assert(rs.rows.head.head === "42")
    c2.query("DROP TABLE wire_persist")
    c2.close()
  }

  test("binary protocol: prepare/execute round-trips typed params incl. NULL") {
    val c = client()
    val id = c.prepare(
      "SELECT ? AS p_long, ? AS p_double, ? AS p_string, ? AS p_null")
    val Right(rs) = c.executePrepared(id,
      Seq(7L, 2.25, "bound", null)): @unchecked
    assert(rs.columns === Seq("p_long", "p_double", "p_string", "p_null"))
    val row = rs.rows.head
    assert(row(0) === "7")
    assert(row(1) === "2.25")
    assert(row(2) === "bound")
    assert(row(3) === null)
    c.closeStatement(id)
    c.close()
  }

  test("binary protocol: params filter a real table") {
    val c = client()
    val id = c.prepare(
      "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > ? AND o_orderstatus = ?")
    val Right(rs) = c.executePrepared(id, Seq(100000.0, "F")): @unchecked
    val expected = graft.engine.Tables.table(spark, dir, "orders")
      .filter("o_totalprice > 100000 AND o_orderstatus = 'F'").count()
    assert(rs.rows.head.head.toLong === expected)
    // re-execute with different params reuses the statement
    val Right(rs2) = c.executePrepared(id, Seq(0.0, "F")): @unchecked
    val expected2 = graft.engine.Tables.table(spark, dir, "orders")
      .filter("o_orderstatus = 'F'").count()
    assert(rs2.rows.head.head.toLong === expected2)
    // steady-state re-execute: new_params_bound_flag=0 sends values
    // only — the server must decode them with its cached types
    val Right(rs3) = c.executePrepared(id, Seq(100000.0, "F"),
      rebind = false): @unchecked
    assert(rs3.rows.head.head.toLong === expected)
    c.closeStatement(id)
    c.close()
  }

  test("binary protocol: date/timestamp params bind with their types") {
    val c = client()
    val id = c.prepare("SELECT ? AS d, ? AS ts")
    val Right(rs) = c.executePrepared(id, Seq(
      java.sql.Date.valueOf("2024-06-15"),
      java.sql.Timestamp.valueOf("2024-06-15 08:30:00"))): @unchecked
    assert(rs.rows.head(0) === "2024-06-15")
    assert(rs.rows.head(1) === "2024-06-15 08:30:00")
    c.closeStatement(id)
    c.close()
  }

  test("binary protocol: read-only cursor streams rows via COM_STMT_FETCH") {
    val c = client()
    val id = c.prepare(
      "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < ? ORDER BY n_nationkey")
    val (cols, _) = c.executePreparedCursor(id, Seq(3L))
    assert(cols === Seq("n_nationkey", "n_name"))
    // drain in batches of 4; the EOF of the last batch flags LAST_ROW_SENT
    var all = Seq.empty[Seq[String]]
    var done = false
    var batches = 0
    while (!done) {
      val (rows, d) = c.fetch(id, 4)
      all ++= rows
      done = d
      batches += 1
      assert(rows.size <= 4)
    }
    val expected = graft.engine.Tables.table(spark, dir, "nation")
      .filter("n_regionkey < 3").count()
    assert(all.size.toLong === expected)
    assert(batches >= 2, "rows must arrive across multiple fetches")
    assert(all.map(_.head.toLong) === all.map(_.head.toLong).sorted)
    c.closeStatement(id)
    // a fetch after close is an ERR, and the connection survives it
    val e = intercept[RuntimeException](c.fetch(id, 1))
    assert(e.getMessage.contains("no cursor") || e.getMessage.contains("[1064]"))
    val Right(rs) = c.query("SELECT 1 AS ok_after"): @unchecked
    assert(rs.rows.head.head === "1")
    c.close()
  }

  test("a row larger than 16MB crosses the wire via continuation frames") {
    val c = client()
    // 17 MB string: the row packet exceeds the 0xffffff frame limit, so
    // the server must split it and the client must reassemble
    val Right(rs) = c.query(
      "SELECT repeat('ab', 8500000) AS big, 7 AS tail_col"): @unchecked
    val big = rs.rows.head.head
    assert(big.length === 17000000)
    assert(big.startsWith("ababab") && big.endsWith("ab"))
    assert(rs.rows.head(1) === "7", "framing must stay aligned after the big value")
    // connection still in sync for the next command
    val Right(rs2) = c.query("SELECT 42 AS after_big"): @unchecked
    assert(rs2.rows.head.head === "42")
    c.close()
  }

  test("utf-8 multibyte values and empty result sets round-trip") {
    val c = client()
    val Right(rs) = c.query("SELECT 'héllo wörld — ügly ¥€$' AS s"): @unchecked
    assert(rs.rows.head.head === "héllo wörld — ügly ¥€$")
    val Right(empty) = c.query(
      "SELECT r_name FROM region WHERE r_regionkey > 999"): @unchecked
    assert(empty.columns === Seq("r_name"))
    assert(empty.rows.isEmpty)
    c.close()
  }

  test("auth: configured password verifies the mysql_native_password scramble") {
    // a password-configured server (reference: config["auth"] +
    // mysql_proxy.py:141-285 / middleware.py check_auth) — the spec's
    // shared server stays in the accept-any default, proven by every
    // other test here
    val authed = new MysqlServer(spark, dir,
      authUser = "alice", authPassword = "s3cret").start()
    try {
      // correct credentials connect and query
      val good = new MysqlClient("127.0.0.1", authed.boundPort,
        user = "alice", password = "s3cret")
      val Right(rs) = good.query("SELECT 1 AS one"): @unchecked
      assert(rs.rows.head.head === "1")
      good.close()
      // wrong password → ERR 1045 Access denied
      val wrongPass = intercept[Exception] {
        new MysqlClient("127.0.0.1", authed.boundPort,
          user = "alice", password = "wrong")
      }
      assert(wrongPass.getMessage.contains("1045") &&
        wrongPass.getMessage.contains("Access denied"))
      // right password, wrong user → denied too (username must match)
      val wrongUser = intercept[Exception] {
        new MysqlClient("127.0.0.1", authed.boundPort,
          user = "bob", password = "s3cret")
      }
      assert(wrongUser.getMessage.contains("Access denied"))
      // empty auth response against a configured password → denied
      val noPass = intercept[Exception] {
        new MysqlClient("127.0.0.1", authed.boundPort, user = "alice")
      }
      assert(noPass.getMessage.contains("Access denied"))
    } finally authed.stop()
  }

  test("auth switch: a caching_sha2 client is redirected to native password") {
    // MySQL 8 connectors claim caching_sha2_password; the server answers
    // AuthSwitchRequest (mysql_proxy.py switch_auth) and verifies the
    // re-scrambled response
    val authed = new MysqlServer(spark, dir,
      authUser = "alice", authPassword = "s3cret").start()
    try {
      val good = new MysqlClient("127.0.0.1", authed.boundPort,
        user = "alice", password = "s3cret",
        authPlugin = "caching_sha2_password")
      val Right(rs) = good.query("SELECT 2 AS two"): @unchecked
      assert(rs.rows.head.head === "2")
      good.close()
      val bad = intercept[Exception] {
        new MysqlClient("127.0.0.1", authed.boundPort,
          user = "alice", password = "wrong",
          authPlugin = "caching_sha2_password")
      }
      assert(bad.getMessage.contains("Access denied"))
    } finally authed.stop()
  }

  test("TLS: SSLRequest upgrades the socket and queries run encrypted") {
    // the server advertises CLIENT_SSL and terminates TLS on its
    // self-signed cert (mysql_proxy.py:184-195 + make_ssl_cert analog)
    val c = new MysqlClient("127.0.0.1", server.boundPort, useTls = true)
    val Right(rs) = c.query("SELECT 41 AS x"): @unchecked
    assert(rs.rows.head.head === "41")
    c.close()
  }

  test("TLS: caching_sha2 full auth sends the plaintext password over the encrypted channel") {
    val authed = new MysqlServer(spark, dir,
      authUser = "alice", authPassword = "s3cret").start()
    try {
      // correct password authenticates via the FastAuthFail(0x04) →
      // plaintext-answer full-auth flow — allowed only because TLS is up
      val good = new MysqlClient("127.0.0.1", authed.boundPort,
        user = "alice", password = "s3cret",
        authPlugin = "caching_sha2_password", useTls = true)
      val Right(rs) = good.query("SELECT 3 AS three"): @unchecked
      assert(rs.rows.head.head === "3")
      good.close()
      // wrong password over TLS → ERR 1045 Access denied
      val bad = intercept[Exception] {
        new MysqlClient("127.0.0.1", authed.boundPort,
          user = "alice", password = "wrong",
          authPlugin = "caching_sha2_password", useTls = true)
      }
      assert(bad.getMessage.contains("1045") &&
        bad.getMessage.contains("Access denied"))
      // WITHOUT TLS the same claim still downgrades to native password
      // via AuthSwitchRequest (the reference refuses caching_sha2 off
      // an unencrypted channel) — and still authenticates
      val plain = new MysqlClient("127.0.0.1", authed.boundPort,
        user = "alice", password = "s3cret",
        authPlugin = "caching_sha2_password")
      val Right(rs2) = plain.query("SELECT 4 AS four"): @unchecked
      assert(rs2.rows.head.head === "4")
      plain.close()
    } finally authed.stop()
  }

  test("charset negotiation: the handshake charset byte sets the session triple") {
    // utf8mb4 (id 45) client
    val c = new MysqlClient("127.0.0.1", server.boundPort, charset = 45)
    val Right(cs) = c.query("SELECT @@character_set_client AS cs"): @unchecked
    assert(cs.rows.head.head === "utf8mb4")
    // SET NAMES moves the whole triple
    c.query("SET NAMES latin1")
    val Right(all) = c.query(
      "SHOW VARIABLES LIKE 'character_set_c%'"): @unchecked
    assert(all.rows.forall(_(1) === "latin1"))
    c.close()
  }

  test("SHOW STATUS answers the connector probe set, LIKE-filterable") {
    val c = client()
    val Right(ssl) = c.query("SHOW STATUS LIKE 'Ssl_cipher'"): @unchecked
    assert(ssl.rows.map(_.head) === Seq("Ssl_cipher"))
    val Right(global) = c.query(
      "SHOW GLOBAL STATUS LIKE 'Threads_%'"): @unchecked
    assert(global.rows.map(_.head).toSet ===
      Set("Threads_connected", "Threads_running"))
    val Right(up) = c.query("SHOW SESSION STATUS LIKE 'Uptime'"): @unchecked
    assert(up.rows.size === 1)
    c.close()
  }

  test("COM_FIELD_LIST answers column definitions for a table") {
    val c = client()
    assert(c.fieldList("region") === Seq("r_regionkey", "r_name"))
    assert(c.fieldList("nation") === Seq("n_nationkey", "n_name", "n_regionkey"))
    val err = intercept[RuntimeException] { c.fieldList("no_such_table_qq") }
    assert(err.getMessage.contains("1146"))
    // the session survives the error (same connection keeps answering)
    assert(c.ping())
    c.close()
  }

  test("SET tenant swaps the connection onto an isolated namespace") {
    val c1 = client()
    c1.query("SET tenant = 'acme'")
    c1.query("CREATE TABLE wire_ten AS SELECT * FROM region")
    c1.query("CREATE AGENT wire_agent USING model='acme_model'")
    c1.close()
    // a second connection under a DIFFERENT tenant sees none of it
    val c2 = client()
    c2.query("SET tenant = 'globex'")
    val err = intercept[Exception] { c2.query("SELECT * FROM wire_ten") }
    assert(err.getMessage.toLowerCase.contains("wire_ten"))
    val Right(agents) = c2.query(
      "SELECT COUNT(*) AS n FROM mindsdb.agents WHERE name='wire_agent'"): @unchecked
    assert(agents.rows.head.head === "0")
    // back on acme (third connection): state persisted
    val c3 = client()
    c3.query("SET tenant = 'acme'")
    val Right(n) = c3.query("SELECT COUNT(*) AS n FROM wire_ten"): @unchecked
    assert(n.rows.head.head === "5")
    c3.close()
    c2.close()
  }

  test("concurrent connections run independent sessions") {
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        val c = client()
        val Right(rs) = c.query(
          s"SELECT COUNT(*) AS n FROM nation WHERE n_regionkey < $i"): @unchecked
        results.add(rs.rows.head.head.toLong)
        c.close()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(results.size === 4)
    val nation = graft.engine.Tables.table(spark, dir, "nation")
    val expected = (1 to 4).map(i => nation.filter(s"n_regionkey < $i").count()).toSet
    assert(results.toArray.map(_.asInstanceOf[Long]).toSet === expected)
  }
}
