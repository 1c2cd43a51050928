package graft.server

import scala.collection.mutable

/** Minimal JSON value model + parser + writer for the HTTP/MCP entry
  * points (the sandbox classpath carries no JSON library; the surface
  * needed is small and fully specified by RFC 8259).
  */
object Json {
  sealed trait Value {
    def asString: String = this match { case Str(s) => s; case v => sys.error(s"not a string: $v") }
    def asObject: Map[String, Value] = this match { case Obj(m) => m; case v => sys.error(s"not an object: $v") }
    def asArray: Seq[Value] = this match { case Arr(a) => a; case v => sys.error(s"not an array: $v") }
    def apply(key: String): Value = asObject(key)
    def get(key: String): Option[Value] = this match { case Obj(m) => m.get(key); case _ => None }
  }
  final case class Obj(fields: Map[String, Value]) extends Value
  final case class Arr(items: Seq[Value]) extends Value
  final case class Str(s: String) extends Value
  final case class Num(n: Double, raw: String) extends Value
  final case class Bool(b: Boolean) extends Value
  case object Null extends Value

  def obj(fields: (String, Value)*): Obj = Obj(fields.toMap)
  def arr(items: Value*): Arr = Arr(items)
  def str(s: String): Value = if (s == null) Null else Str(s)
  def num(n: Long): Num = Num(n.toDouble, n.toString)
  def num(n: Double): Num = Num(n, renderDouble(n))

  private def renderDouble(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15 &&
        d.toLong.toDouble == d) d.toLong.toString
    else d.toString

  // ---------------------------------------------------------- writing

  def write(v: Value): String = {
    val sb = new StringBuilder
    writeTo(v, sb)
    sb.toString
  }

  private def writeTo(v: Value, sb: StringBuilder): Unit = v match {
    case Null => sb.append("null")
    case Bool(b) => sb.append(if (b) "true" else "false")
    case Num(_, raw) => sb.append(raw)
    case Str(s) => writeString(s, sb)
    case Arr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        writeTo(it, sb)
      }
      sb.append(']')
    case Obj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, x) =>
        if (!first) sb.append(',')
        first = false
        writeString(k, sb)
        sb.append(':')
        writeTo(x, sb)
      }
      sb.append('}')
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  // ---------------------------------------------------------- parsing

  def parse(s: String): Value = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    require(p.pos == s.length, s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def skipWs(): Unit =
      while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(pos < s.length && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    private def peek: Char = { skipWs(); require(pos < s.length, "eof"); s.charAt(pos) }

    def parseValue(): Value = peek match {
      case '{' => parseObject()
      case '[' => parseArray()
      case '"' => Str(parseString())
      case 't' => literal("true"); Bool(true)
      case 'f' => literal("false"); Bool(false)
      case 'n' => literal("null"); Null
      case _ => parseNumber()
    }

    private def literal(lit: String): Unit = {
      require(s.regionMatches(pos, lit, 0, lit.length), s"bad literal at $pos")
      pos += lit.length
    }

    private def parseObject(): Obj = {
      expect('{')
      val m = mutable.LinkedHashMap.empty[String, Value]
      if (peek == '}') { pos += 1; return Obj(m.toMap) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        expect(':')
        m(k) = parseValue()
        skipWs()
        if (peek == ',') pos += 1
        else { expect('}'); done = true }
      }
      Obj(m.toMap)
    }

    private def parseArray(): Arr = {
      expect('[')
      val items = Seq.newBuilder[Value]
      if (peek == ']') { pos += 1; return Arr(items.result()) }
      var done = false
      while (!done) {
        items += parseValue()
        skipWs()
        if (peek == ',') pos += 1
        else { expect(']'); done = true }
      }
      Arr(items.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        s.charAt(pos) match {
          case '\\' =>
            pos += 1
            s.charAt(pos) match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
                pos += 4
              case other => sys.error(s"bad escape \\$other")
            }
            pos += 1
          case c => sb.append(c); pos += 1
        }
      }
      pos += 1
      sb.toString
    }

    private def parseNumber(): Num = {
      skipWs()
      val start = pos
      if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (pos < s.length && (s.charAt(pos).isDigit || "eE+-.".contains(s.charAt(pos)))) pos += 1
      val raw = s.substring(start, pos)
      Num(raw.toDouble, raw)
    }
  }
}
