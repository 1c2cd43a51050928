package graft

import graft.functions.{AiFunctions, MySqlCompat, UdfRegistry}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** MySQL-compat + AI function semantics beyond the oracle gate. */
class CompatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = graft.engine.Session.build("compat-spec")
    MySqlCompat.register(s)
    AiFunctions.register(s)
    s
  }

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").first().get(0)

  test("date_format specifier translation") {
    assert(MySqlCompat.translateDateFormat("%Y-%m-%d") === "yyyy-MM-dd")
    assert(MySqlCompat.translateDateFormat("%H:%i:%s") === "HH:mm:ss")
    assert(MySqlCompat.translateDateFormat("%W, %M %e") === "EEEE, MMMM d")
    assert(MySqlCompat.translateDateFormat("%%Y") === "%'Y'")
    assert(one("mysql_date_format(TIMESTAMP '1997-10-04 22:23:00', '%W %M %Y')")
      === "Saturday October 1997")
  }

  test("from_days / to_days are inverse and match the MySQL doc example") {
    // MySQL docs: TO_DAYS('1997-10-07') = 729669
    assert(one("to_days(DATE '1997-10-07')") === 729669)
    assert(one("CAST(from_days(729669) AS STRING)") === "1997-10-07")
    assert(one("CAST(from_days(to_days(DATE '2024-02-29')) AS STRING)") === "2024-02-29")
  }

  test("dayname/monthname/dayofmonth/curdate") {
    assert(one("dayname(DATE '2026-01-01')") === "Thursday")
    assert(one("monthname(DATE '2026-01-01')") === "January")
    assert(one("dayofmonth(DATE '2026-01-31')") === 31)
    assert(one("curdate() = current_date()") === true)
  }

  test("convert_tz shifts wall-clock time between zones") {
    assert(one("CAST(convert_tz(TIMESTAMP '2004-01-01 12:00:00', 'GMT', 'MET') AS STRING)")
      === "2004-01-01 13:00:00") // MySQL doc example
  }

  test("addtime adds seconds; adddate/subdate add days") {
    assert(one("CAST(addtime(TIMESTAMP '2007-12-31 23:59:59', 2) AS STRING)")
      === "2008-01-01 00:00:01")
    assert(one("CAST(adddate(DATE '2008-01-01', 31) AS STRING)") === "2008-02-01")
    assert(one("CAST(subdate(DATE '2008-01-01', 31) AS STRING)") === "2007-12-01")
  }

  test("get_format returns MySQL standard format strings") {
    assert(one("get_format('date', 'ISO')") === "%Y-%m-%d")
    assert(one("get_format('datetime', 'usa')") === "%Y-%m-%d %H.%i.%s")
    assert(one("mysql_date_format(DATE '2026-06-07', get_format('date', 'INTERNAL'))")
      === "20260607")
  }

  test("llm / to_markdown / doc_hash are deterministic and composable") {
    val a = one("llm('what is spark')")
    val b = one("llm('what is spark')")
    assert(a === b)
    assert(a.toString.startsWith("LLM[") && a.toString.contains("]: WHAT IS SPARK"))
    assert(one("to_markdown('body')") === "# Document\n\nbody")
    assert(one("doc_hash('abc')") === "900150983cd24fb0d6963f7d28e17f72")
    // built-in hash is NOT shadowed (d02 regression guard)
    assert(one("hash('abc')").isInstanceOf[Int])
  }

  test("BYOM UdfRegistry registers typed scalar functions") {
    val r = new UdfRegistry(spark)
    r.registerScalar[String, Int]("strlen2", (s: String) => s.length * 2)
    r.registerScalar2[Int, Int, Int]("addmul", (a: Int, b: Int) => (a + b) * 2)
    assert(one("strlen2('abcd')") === 8)
    assert(one("addmul(2, 3)") === 10)
    assert(r.list().map(_._1) === Seq("strlen2", "addmul"))
  }
}
