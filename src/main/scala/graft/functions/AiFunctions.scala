package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** AI scalar functions + BYOM user-function registry (SURVEY §2.8 layer 3;
  * reference MINDSDB_SQL_FUNCTIONS = {llm, to_markdown, hash} at
  * query_planner.py:61, implementations
  * interfaces/functions/controller.py:131-190, BYOM registration
  * :37-112, :217-248).
  *
  * `llm` and `to_markdown` stand in for network model calls with
  * DETERMINISTIC stubs (the oracle must reproduce them); the expression
  * shape — a scalar function applied per row, batched by the engine —
  * is the real contract. A production deployment swaps the stub body
  * for a `mapPartitions` batch API client without touching callers.
  * `hash` is md5, matching the reference's content-hash role.
  */
object AiFunctions {

  /** Deterministic llm stub: tagged digest + echo of the prompt head.
    * (controller.py:131-154 calls a chat model here.) */
  def llm(prompt: Column): Column =
    concat(lit("LLM["), substring(md5(prompt), 1, 8), lit("]: "),
      upper(substring(prompt, 1, 24)))

  /** Deterministic to_markdown stub: heading + body
    * (controller.py:155-190 converts documents/URLs). */
  def toMarkdown(text: Column): Column =
    concat(lit("# Document\n\n"), text)

  /** Content hash (md5 hex) — reference uses it for dedup keys. */
  def hashFn(c: Column): Column = md5(c.cast("string"))

  /** Register `llm`, `to_markdown`, `doc_hash` as SQL functions.
    *
    * Builders construct resolved catalyst trees directly. The reference
    * names its content hash `hash`; here it registers as `doc_hash`
    * because Spark's built-in `hash` (murmur3) is load-bearing in other
    * operators — silently changing its semantics session-wide would be a
    * correctness hazard, which is exactly the reference's own
    * unknown-function guard concern (sql.py:300-313). */
  /** Driver-side evaluation of the same deterministic `llm` stub (for
    * per-turn chat flows where the prompt is one string, not a column) —
    * byte-identical to the Catalyst expression: LLM[first-8-of-md5]:
    * UPPER(first 24 chars). */
  def llmLocal(prompt: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(prompt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = md.map(b => f"$b%02x").mkString
    s"LLM[${hex.take(8)}]: ${prompt.take(24).toUpperCase}"
  }

  /** (name, return type, definition) for information_schema.routines —
    * kept next to [[register]] so the catalog row list cannot drift from
    * what is actually registered. */
  val routineRows: Seq[(String, String, String)] = Seq(
    ("llm", "varchar", "LLM[<md5-8>]: UPPER(substr(prompt, 1, 24)) — deterministic stub behind the real call shape"),
    ("to_markdown", "varchar", "'# Document\\n\\n' || text"),
    ("doc_hash", "varchar", "md5(cast(x AS string))"),
    ("topk_pairs", "array<struct<key:bigint,payload:bigint>>",
      "mergeable top-k aggregate: k (key, payload) pairs, key DESC"),
    ("hll_estimate", "double",
      "mergeable HyperLogLog distinct-count aggregate (m=1024, md5 hash)"),
    ("hll_registers", "binary",
      "storable HLL sketch: the raw 1 KiB register array for later union"),
    ("hll_union_estimate", "double",
      "distinct estimate from unioned stored hll_registers sketches"))

  /** SQL-defined functions created at runtime (CREATE FUNCTION … RETURN
    * expr — Spark 4's SQL scalar UDFs), name → (return type, body);
    * surfaced through information_schema.routines beside the built-ins.
    * OR REPLACE overwrites by key. */
  private val userRoutineMap =
    new scala.collection.concurrent.TrieMap[String, (String, String)]()
  def addUserRoutine(name: String, typ: String, body: String): Unit =
    userRoutineMap(name.toLowerCase) = (typ, body)
  def dropUserRoutine(name: String): Unit =
    userRoutineMap.remove(name.toLowerCase)
  def userRoutines: Seq[(String, String, String)] =
    userRoutineMap.toSeq.sortBy(_._1).map { case (n, (t, b)) => (n, t, b) }

  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val reg = spark.sessionState.functionRegistry
    def add(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    def md5Of(e: Expression): Expression = Md5(Cast(e, BinaryType))

    add("llm", es => {
      val p = es.head
      Concat(Seq(
        Literal("LLM["), Substring(md5Of(p), Literal(1), Literal(8)),
        Literal("]: "), Upper(Substring(p, Literal(1), Literal(24)))))
    })
    add("to_markdown", es => Concat(Seq(Literal("# Document\n\n"), es.head)))
    add("doc_hash", es => md5Of(Cast(es.head, StringType)))

    // graft's mergeable top-k aggregate (functions/TopK.scala) on the SQL
    // surface: topk_pairs(key, payload, k). The analyzer wraps the
    // returned AggregateFunction in an AggregateExpression; k must be a
    // foldable integer literal (it sizes the aggregation buffer).
    add("topk_pairs", es => {
      require(es.length == 3, "topk_pairs(key BIGINT, payload BIGINT, k INT)")
      val k = es(2) match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case Literal(v: Long, org.apache.spark.sql.types.LongType) => v.toInt
        case other => throw new IllegalArgumentException(
          s"topk_pairs k must be an integer literal, got $other")
      }
      TopKPairs(
        Cast(es(0), org.apache.spark.sql.types.LongType),
        Cast(es(1), org.apache.spark.sql.types.LongType), k)
    })

    // mergeable HLL distinct estimate (functions/Hll.scala) on the SQL
    // surface: hll_estimate(v) — values hash by their string form
    add("hll_estimate", es => {
      require(es.length == 1, "hll_estimate(v)")
      graft.functions.HllSketch(Cast(es.head, StringType))
    })
    // the storable sketch lifecycle: hll_registers materializes the 1 KiB
    // register array (write it to a daily sketch table); later rollups
    // union stored sketches WITHOUT rescanning raw history
    add("hll_registers", es => {
      require(es.length == 1, "hll_registers(v)")
      graft.functions.HllRegisters(Cast(es.head, StringType))
    })
    add("hll_union_estimate", es => {
      require(es.length == 1, "hll_union_estimate(sketch BINARY)")
      graft.functions.HllUnion(es.head)
    })
  }
}

/** BYOM-style user function registry (functions/controller.py:37-112):
  * engines expose typed methods that become session-scoped SQL
  * functions. Spark-side, scalar lambdas register as UDFs; prefer
  * [[AiFunctions]]-style expression compositions for hot paths. */
final class UdfRegistry(spark: SparkSession) {
  private val registered = scala.collection.mutable.LinkedHashMap[String, String]()

  def registerScalar[A, B](name: String, f: A => B)(
      implicit ta: scala.reflect.runtime.universe.TypeTag[A],
      tb: scala.reflect.runtime.universe.TypeTag[B]): Unit = {
    spark.udf.register(name, org.apache.spark.sql.functions.udf(f))
    registered(name) = s"${ta.tpe} => ${tb.tpe}"
  }

  def registerScalar2[A, B, C](name: String, f: (A, B) => C)(
      implicit ta: scala.reflect.runtime.universe.TypeTag[A],
      tb: scala.reflect.runtime.universe.TypeTag[B],
      tc: scala.reflect.runtime.universe.TypeTag[C]): Unit = {
    spark.udf.register(name, org.apache.spark.sql.functions.udf(f))
    registered(name) = s"(${ta.tpe}, ${tb.tpe}) => ${tc.tpe}"
  }

  def list(): Seq[(String, String)] = registered.toSeq
}
