package graft.server

import java.io.{InputStream, OutputStream}
import org.apache.spark.sql.types._

/** MySQL client/server wire codec — the framing, length-encoded
  * primitives, and type constants shared by [[MysqlServer]] and the
  * in-repo [[MysqlClient]].
  *
  * Everything here is the public MySQL protocol (protocol version 10,
  * text + binary result sets); the behavioral contract mirrors the
  * reference's proxy (mindsdb/api/mysql/mysql_proxy/mysql_proxy.py:594
  * `handle`, packet builders :357-465) re-expressed over plain
  * java.io streams.
  */
object MysqlWire {

  // ---- capability flags (protocol::CapabilityFlags) ----
  val CLIENT_LONG_PASSWORD = 0x00000001L
  val CLIENT_FOUND_ROWS = 0x00000002L
  val CLIENT_LONG_FLAG = 0x00000004L
  val CLIENT_CONNECT_WITH_DB = 0x00000008L
  val CLIENT_PROTOCOL_41 = 0x00000200L
  val CLIENT_SSL = 0x00000800L
  val CLIENT_TRANSACTIONS = 0x00002000L
  val CLIENT_SECURE_CONNECTION = 0x00008000L
  val CLIENT_MULTI_RESULTS = 0x00020000L
  val CLIENT_PLUGIN_AUTH = 0x00080000L
  val CLIENT_CONNECT_ATTRS = 0x00100000L
  val CLIENT_PLUGIN_AUTH_LENENC = 0x00200000L
  val CLIENT_DEPRECATE_EOF = 0x01000000L

  /** What the server advertises: protocol-41 text protocol with classic
    * EOF framing (DEPRECATE_EOF intentionally absent — every client
    * library downgrades gracefully, and EOF-terminated result sets keep
    * the state machine explicit). */
  val ServerCapabilities: Long =
    CLIENT_LONG_PASSWORD | CLIENT_FOUND_ROWS | CLIENT_LONG_FLAG |
      CLIENT_CONNECT_WITH_DB | CLIENT_PROTOCOL_41 | CLIENT_TRANSACTIONS |
      CLIENT_SECURE_CONNECTION | CLIENT_MULTI_RESULTS | CLIENT_PLUGIN_AUTH |
      CLIENT_CONNECT_ATTRS | CLIENT_PLUGIN_AUTH_LENENC

  // ---- command bytes ----
  val COM_QUIT = 0x01
  val COM_INIT_DB = 0x02
  val COM_QUERY = 0x03
  val COM_FIELD_LIST = 0x04
  val COM_DEBUG = 0x0d
  val COM_PING = 0x0e
  val COM_STMT_PREPARE = 0x16
  val COM_STMT_EXECUTE = 0x17
  val COM_STMT_CLOSE = 0x19
  val COM_STMT_RESET = 0x1a
  val COM_SET_OPTION = 0x1b
  val COM_STMT_FETCH = 0x1c

  // cursor status flags (EXECUTE with CURSOR_TYPE_READ_ONLY)
  val CURSOR_TYPE_READ_ONLY = 0x01
  val SERVER_STATUS_CURSOR_EXISTS = 0x0040
  val SERVER_STATUS_LAST_ROW_SENT = 0x0080

  // ---- column types (protocol::ColumnType) ----
  val TYPE_TINY = 0x01
  val TYPE_SHORT = 0x02
  val TYPE_LONG = 0x03
  val TYPE_FLOAT = 0x04
  val TYPE_DOUBLE = 0x05
  val TYPE_NULL = 0x06
  val TYPE_LONGLONG = 0x08
  val TYPE_DATE = 0x0a
  val TYPE_DATETIME = 0x0c
  val TYPE_BLOB = 0xfc
  val TYPE_VAR_STRING = 0xfd
  val TYPE_NEWDECIMAL = 0xf6

  val CHARSET_UTF8 = 33 // utf8_general_ci
  val CHARSET_BINARY = 63

  val FLAG_NOT_NULL = 0x0001
  val FLAG_BINARY = 0x0080
  val FLAG_UNSIGNED = 0x0020
  val FLAG_NUM = 0x8000

  /** Spark type → (mysql type code, charset, display length, flags). */
  def mysqlTypeOf(dt: DataType): (Int, Int, Long, Int) = dt match {
    case BooleanType | ByteType => (TYPE_TINY, CHARSET_BINARY, 4L, FLAG_NUM)
    case ShortType => (TYPE_SHORT, CHARSET_BINARY, 6L, FLAG_NUM)
    case IntegerType => (TYPE_LONG, CHARSET_BINARY, 11L, FLAG_NUM)
    case LongType => (TYPE_LONGLONG, CHARSET_BINARY, 20L, FLAG_NUM)
    case FloatType => (TYPE_FLOAT, CHARSET_BINARY, 12L, FLAG_NUM)
    case DoubleType => (TYPE_DOUBLE, CHARSET_BINARY, 22L, FLAG_NUM)
    case _: DecimalType => (TYPE_NEWDECIMAL, CHARSET_BINARY, 40L, FLAG_NUM)
    case DateType => (TYPE_DATE, CHARSET_BINARY, 10L, FLAG_BINARY)
    case TimestampType | TimestampNTZType =>
      (TYPE_DATETIME, CHARSET_BINARY, 26L, FLAG_BINARY)
    case BinaryType => (TYPE_BLOB, CHARSET_BINARY, 65535L, FLAG_BINARY)
    case _ => (TYPE_VAR_STRING, CHARSET_UTF8, 1024L, 0)
  }

  // ------------------------------------------------------------------
  // framed packet I/O: 3-byte little-endian length + 1-byte sequence id
  // ------------------------------------------------------------------

  final class PacketIo(in: InputStream, out: OutputStream) {
    var seq: Int = 0

    private def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new java.io.EOFException("connection closed")
        off += r
      }
      buf
    }

    /** Read one packet body; tracks and returns via side effect the next
      * expected sequence id. Returns null on clean EOF before a header. */
    def read(): Array[Byte] = {
      val first = in.read()
      if (first < 0) return null
      val h = readFully(3)
      var len = (first & 0xff) | ((h(0) & 0xff) << 8) | ((h(1) & 0xff) << 16)
      seq = (h(2) & 0xff) + 1
      var body = readFully(len)
      while (len == 0xffffff) { // continuation frames of a >16MB packet
        val hdr = readFully(4)
        len = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16)
        seq = (hdr(3) & 0xff) + 1
        body = body ++ readFully(len)
      }
      body
    }

    def write(body: Array[Byte]): Unit = {
      // 16MB-1 max payload per frame; larger bodies continue in
      // follow-ups, and an exact multiple ends with an empty terminator
      var off = 0
      var n = 0
      while ({
        n = math.min(0xffffff, body.length - off)
        out.write(Array[Byte](
          (n & 0xff).toByte, ((n >> 8) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
          (seq & 0xff).toByte))
        out.write(body, off, n)
        seq += 1
        off += n
        n == 0xffffff
      }) ()
    }

    def writeMany(bodies: Iterator[Array[Byte]]): Unit = {
      bodies.foreach(write)
      out.flush()
    }

    def flush(): Unit = out.flush()
    def resetSeq(): Unit = seq = 0
  }

  // ------------------------------------------------------------------
  // byte-level reader/writer for packet bodies
  // ------------------------------------------------------------------

  final class ByteReader(val buf: Array[Byte]) {
    var pos: Int = 0
    def remaining: Int = buf.length - pos
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u24(): Int = u8() | (u8() << 8) | (u8() << 16)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def u64(): Long = { var v = 0L; var i = 0; while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }; pos += 8; v }
    def bytes(n: Int): Array[Byte] = { val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b }
    def skip(n: Int): Unit = pos += n
    def nulTerminated(): String = {
      val start = pos
      while (buf(pos) != 0) pos += 1
      val s = new String(buf, start, pos - start, "UTF-8")
      pos += 1
      s
    }
    /** length-encoded integer; -1 encodes the NULL marker 0xfb. */
    def lenencInt(): Long = u8() match {
      case 0xfb => -1L
      case 0xfc => u16().toLong
      case 0xfd => u24().toLong
      case 0xfe => u64()
      case v => v.toLong
    }
    def lenencBytes(): Array[Byte] = lenencInt() match {
      case -1L => null
      case n => bytes(n.toInt)
    }
    def lenencString(): String = lenencBytes() match {
      case null => null
      case b => new String(b, "UTF-8")
    }
    def rest(): Array[Byte] = bytes(remaining)
  }

  final class ByteWriter {
    private val out = new java.io.ByteArrayOutputStream(64)
    def u8(v: Int): this.type = { out.write(v & 0xff); this }
    def u16(v: Int): this.type = { u8(v); u8(v >> 8) }
    def u24(v: Int): this.type = { u8(v); u8(v >> 8); u8(v >> 16) }
    def u32(v: Long): this.type = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): this.type = { var i = 0; while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }; this }
    def raw(b: Array[Byte]): this.type = { out.write(b); this }
    def nulTerminated(s: String): this.type = { raw(s.getBytes("UTF-8")); u8(0) }
    def lenencInt(v: Long): this.type =
      if (v < 251) u8(v.toInt)
      else if (v < 65536) { u8(0xfc); u16(v.toInt) }
      else if (v < 16777216) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u64(v) }
    def lenencBytes(b: Array[Byte]): this.type = { lenencInt(b.length); raw(b) }
    def lenencString(s: String): this.type = lenencBytes(s.getBytes("UTF-8"))
    def nullMarker(): this.type = u8(0xfb)
    def result(): Array[Byte] = out.toByteArray
  }

  // ------------------------------------------------------------------
  // shared packet builders
  // ------------------------------------------------------------------

  def okPacket(affectedRows: Long = 0, lastInsertId: Long = 0,
               status: Int = 0x0002, info: String = ""): Array[Byte] = {
    val w = new ByteWriter().u8(0x00).lenencInt(affectedRows)
      .lenencInt(lastInsertId).u16(status).u16(0)
    if (info.nonEmpty) w.raw(info.getBytes("UTF-8"))
    w.result()
  }

  def errPacket(code: Int, sqlState: String, msg: String): Array[Byte] =
    new ByteWriter().u8(0xff).u16(code).u8('#')
      .raw(sqlState.take(5).padTo(5, '0').getBytes("UTF-8"))
      .raw(msg.getBytes("UTF-8")).result()

  def eofPacket(status: Int = 0x0002): Array[Byte] =
    new ByteWriter().u8(0xfe).u16(0).u16(status).result()

  /** ColumnDefinition41 — schema/table fields carry the logical names the
    * reference sends (catalog is always the literal "def"). */
  def columnDefinition(schema: String, table: String, name: String,
                       dt: DataType, nullable: Boolean): Array[Byte] = {
    val (tpe, charset, length, flags0) = mysqlTypeOf(dt)
    val flags = flags0 | (if (nullable) 0 else FLAG_NOT_NULL)
    new ByteWriter()
      .lenencString("def").lenencString(schema).lenencString(table)
      .lenencString(table).lenencString(name).lenencString(name)
      .u8(0x0c).u16(charset).u32(length).u8(tpe).u16(flags).u8(0)
      .u16(0).result()
  }
}
