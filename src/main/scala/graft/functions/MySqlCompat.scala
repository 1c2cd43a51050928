package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** MySQL-compat scalar function shims (SURVEY §2.8; reference rewrites 30
  * MySQL functions into DuckDB equivalents,
  * mindsdb/api/executor/utilities/mysql_to_duckdb_functions.py:681-712).
  *
  * Here the rewrite target is Catalyst: every shim is a COMPOSITION of
  * built-in, codegen'd expressions (no UDFs), registered under its MySQL
  * name so `spark.sql` accepts the MySQL spelling. Shims whose names
  * Spark already owns with identical semantics (locate, instr, length,
  * sha2, unhex, extract, substring_index, from_unixtime, datediff,
  * date_add/date_sub, dayofyear, dayofweek, day) are deliberately not
  * re-registered.
  */
object MySqlCompat {

  /** MySQL date_format specifiers → java.time pattern
    * (mysql_to_duckdb_functions.py:367-417 does the same to strftime). */
  def translateDateFormat(mysqlFmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < mysqlFmt.length) {
      val c = mysqlFmt.charAt(i)
      if (c == '%' && i + 1 < mysqlFmt.length) {
        mysqlFmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'c' => sb.append("M")
          case 'd' => sb.append("dd")
          case 'e' => sb.append("d")
          case 'H' => sb.append("HH")
          case 'k' => sb.append("H")
          case 'h' | 'I' => sb.append("hh")
          case 'i' => sb.append("mm")
          case 's' | 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS")
          case 'M' => sb.append("MMMM")
          case 'b' => sb.append("MMM")
          case 'W' => sb.append("EEEE")
          case 'a' => sb.append("EEE")
          case 'j' => sb.append("DDD")
          case 'p' => sb.append("a")
          case 'T' => sb.append("HH:mm:ss")
          case '%' => sb.append('%')
          case other => sb.append(other)
        }
        i += 2
      } else {
        // quote literal letters so java.time doesn't interpret them
        if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  // Column-level shims (usable directly from Scala)

  def mysqlDateFormat(ts: Column, fmt: String): Column =
    date_format(ts, translateDateFormat(fmt))

  def dayname(ts: Column): Column = date_format(ts, "EEEE")
  def monthname(ts: Column): Column = date_format(ts, "MMMM")

  /** MySQL TO_DAYS/FROM_DAYS: day number since year 0 (docs: proleptic;
    * TO_DAYS('0001-01-01') = 366). */
  def toDays(d: Column): Column = datediff(d.cast("date"), lit("0001-01-01").cast("date")) + 366
  def fromDays(n: Column): Column = date_add(lit("0001-01-01").cast("date"), n - 366)

  def convertTz(ts: Column, fromTz: Column, toTz: Column): Column =
    from_utc_timestamp(to_utc_timestamp(ts, fromTz), toTz)

  /** MySQL FORMAT(x, d): thousands separators + d decimals. */
  def mysqlFormat(x: Column, d: Int): Column = format_number(x, d)

  /** GET_FORMAT(DATE|TIME|DATETIME, 'ISO'|'USA'|'EUR'|'JIS'|'INTERNAL') */
  private val getFormats: Map[(String, String), String] = Map(
    ("date", "iso") -> "%Y-%m-%d", ("date", "usa") -> "%m.%d.%Y",
    ("date", "eur") -> "%d.%m.%Y", ("date", "jis") -> "%Y-%m-%d",
    ("date", "internal") -> "%Y%m%d",
    ("time", "iso") -> "%H:%i:%s", ("time", "usa") -> "%h:%i:%s %p",
    ("time", "eur") -> "%H.%i.%s", ("time", "jis") -> "%H:%i:%s",
    ("time", "internal") -> "%H%i%s",
    ("datetime", "iso") -> "%Y-%m-%d %H:%i:%s", ("datetime", "usa") -> "%Y-%m-%d %H.%i.%s",
    ("datetime", "eur") -> "%Y-%m-%d %H.%i.%s", ("datetime", "jis") -> "%Y-%m-%d %H:%i:%s",
    ("datetime", "internal") -> "%Y%m%d%H%i%s")
  def getFormat(kind: String, standard: String): String =
    getFormats((kind.toLowerCase, standard.toLowerCase))

  // ------------------------------------------------------- SQL registration

  /** Register the MySQL spellings into the session's function registry.
    *
    * Builders construct catalyst expression trees DIRECTLY (not via the
    * Column API, whose lazily-resolved nodes cannot live inside a
    * registry builder) — whole-stage codegen treats the result exactly
    * like hand-written SQL. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DateType, LongType, StringType, TimestampType}
    val reg = spark.sessionState.functionRegistry
    def add(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    def fmtOf(e: Expression): Expression = DateFormatClass(e, Literal("EEEE"))
    val epochDate = Cast(Literal("0001-01-01"), DateType)

    // the format string must be a literal (translated at plan time, the
    // same place the reference rewrites it to strftime)
    add("mysql_date_format", es => es(1) match {
      case Literal(s, _) if s != null =>
        DateFormatClass(es.head, Literal(translateDateFormat(s.toString)))
      case other => throw new IllegalArgumentException(
        s"mysql_date_format needs a literal format, got $other")
    })
    add("dayname", es => fmtOf(es.head))
    add("monthname", es => DateFormatClass(es.head, Literal("MMMM")))
    add("dayofmonth", es => DayOfMonth(es.head))
    add("curdate", _ => CurrentDate(None))
    add("curtime", _ => DateFormatClass(CurrentTimestamp(), Literal("HH:mm:ss")))
    add("to_days", es =>
      Add(DateDiff(Cast(es.head, DateType), epochDate), Literal(366)))
    add("from_days", es =>
      DateAdd(epochDate, Subtract(es.head, Literal(366))))
    add("convert_tz", es =>
      FromUTCTimestamp(ToUTCTimestamp(es.head, es(1)), es(2)))
    add("mysql_format", es => FormatNumber(es.head, es(1)))
    // explicit date cast: ANSI mode refuses the lossy timestamp→date
    // implicit coercion MySQL applies
    add("adddate", es => DateAdd(Cast(es.head, DateType), es(1)))
    add("subdate", es => DateSub(Cast(es.head, DateType), es(1)))
    add("addtime", es => SecondsToTimestamp(
      Add(UnixSeconds(Cast(es.head, TimestampType)), Cast(es(1), LongType))))
    add("get_format", es => (es.head, es(1)) match {
      case (Literal(k, _), Literal(std, _)) if k != null && std != null =>
        Literal(getFormat(k.toString, std.toString))
      case other => throw new IllegalArgumentException(
        s"get_format needs literal arguments, got $other")
    })
    add("instr_mysql", es => StringInstr(es.head, es(1)))
    add("regexp_substr_mysql", es => RegExpExtract(es.head, es(1), Literal(0)))
  }
}
