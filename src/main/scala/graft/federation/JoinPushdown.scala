package graft.federation

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** Whole-join pushdown to a single remote source — the Spark analog of
  * the reference planner's "if every table in the (sub)query lives in one
  * integration, ship the whole query there" rule (query_planner.py:
  * 787-807; join flattening plan_join.py:185-223, single-source shipping
  * plan_join.py:61-94).
  *
  * Runs in the `User Provided Optimizers` batch, AFTER V2 scan planning:
  * by then each mem-source leaf is a [[DataSourceV2ScanRelation]] whose
  * [[MemScan]] carries its provenance (table, pushed filters, pruned
  * columns). A LEFT-DEEP TREE of joins (inner / left / right / full /
  * cross) whose leaves are all scans of the SAME catalog is:
  *
  *   1. flattened into (leaves, join edges),
  *   2. RENDERED to one SQL statement in the source's dialect —
  *      `SELECT … FROM t0 JOIN t1 ON … LEFT JOIN t2 ON …` with each
  *      leaf's pushed filters/pruning re-expressed as a subquery — the
  *      exact text a JDBC handler would ship over the wire
  *      ([[SqlRender]]; reference `utilities/render/sqlalchemy_render
  *      .py:112`), and
  *   3. EXECUTED by the source's engine stand-in ([[MemEngine]]): an
  *      isolated SparkSession playing the remote database, which plans
  *      its own hash joins over the raw registry rows — no driver-side
  *      nested loop anywhere.
  *
  * The result replaces the whole subtree as a [[LocalRelation]]: the
  * joins disappear from the outer Spark plan entirely. At 100 TB the win
  * is the reference's: against a remote warehouse the joined/filtered
  * result crosses the wire instead of N full tables. Anything the
  * renderer cannot express (exotic ON expressions, aggregated/limited
  * leaves, non-left-deep shapes) falls back to per-table fetch with
  * Spark executing the join — correct either way.
  */
object SingleSourceJoinPushdown extends Rule[LogicalPlan] {

  private case class Leaf(scan: DataSourceV2ScanRelation, prov: MemScanProvenance)

  private val supportedTypes: Set[JoinType] =
    Set(Inner, Cross, LeftOuter, RightOuter, FullOuter)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // transformDown, not Up: the TOP of the largest pushable tree must
    // match first — bottom-up would materialize an inner two-leaf join
    // before the three-leaf tree above it could be seen whole
    case j: Join => pushWholeTree(j).getOrElse(j)
  }

  private def pushWholeTree(j: Join): Option[LogicalPlan] = flatten(j) match {
    case Some((leaves, edges)) if leaves.size >= 2 && sameCatalog(leaves) =>
      try {
        val sql = SqlRender.renderJoin(j.output, leaves.map(l => (l.scan, l.prov)),
          edges, SqlRender.Dialect.spark)
        val rows = MemEngine.run(sql, leaves.map(_.prov.table).distinct)
        val schema = StructType(j.output.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        val conv = CatalystTypeConverters.createToCatalystConverter(schema)
        MemTables.renderedSql += sql
        leaves.map(_.prov.table).sliding(2).foreach {
          case Seq(a, b) => MemTables.pushedJoins += ((a, b))
          case _ =>
        }
        Some(LocalRelation(j.output,
          rows.map(r => conv(r).asInstanceOf[InternalRow])))
      } catch {
        // an unrenderable corner is not an error — the join stays in
        // Spark (per-table fetch), which is the reference's fallback too
        case NonFatal(_) => None
      }
    case _ => None
  }

  /** Left-deep flattening: `Join(Join(Join(s0,s1),s2),s3)` →
    * (Seq(s0..s3), edges) where edge i joins the accumulated prefix with
    * leaf i+1 (the reference flattens the same way, plan_join.py:185).
    * A non-leaf right side fails the match here; transformDown then
    * descends and pushes the inner tree on its own. */
  private def flatten(p: LogicalPlan)
      : Option[(Seq[Leaf], Seq[(JoinType, Option[Expression])])] = p match {
    case Join(l, r, jt, cond, _) if supportedTypes.contains(jt) =>
      for {
        (ll, le) <- flatten(l)
        rl <- asLeaf(r)
      } yield (ll :+ rl, le :+ ((jt, cond)))
    // a USING join (and column pruning) leaves attribute-only Projects
    // between nested joins — transparent for flattening, the kept
    // attributes still resolve to their leaves by exprId
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      flatten(child)
    case other => asLeaf(other).map(l => (Seq(l), Nil))
  }

  private def asLeaf(p: LogicalPlan): Option[Leaf] = p match {
    case s: DataSourceV2ScanRelation => s.scan match {
      // an aggregated/limited scan is already a complete answer in the
      // source — re-joining it inside a bigger pushed query would apply
      // the limit at the wrong point; leave those to Spark
      case m: MemScan => m.provenance
        .filterNot(pv => pv.aggregated || pv.limited).map(Leaf(s, _))
      case _ => None
    }
    // column pruning may interpose an attribute-only Project between
    // joins; it renames/compute nothing, so it is transparent here
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      asLeaf(child)
    case _ => None
  }

  private def sameCatalog(leaves: Seq[Leaf]): Boolean = {
    val names = leaves.map(_.scan.relation.catalog.map(_.name()))
    names.forall(_.isDefined) && names.distinct.size == 1
  }

  /** Idempotently install on a session (the driver may hand a session we
    * did not build). */
  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_ eq this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}

/** Renders a pushed single-source subplan to SQL text — the scoped
  * equivalent of the reference's SqlalchemyRender
  * (`utilities/render/sqlalchemy_render.py:112`): one dialect-quoted
  * statement the remote engine executes verbatim. Unsupported syntax
  * throws; the caller treats that as "don't push". */
object SqlRender {

  /** Identifier quoting + literal spelling per target engine. `ansi` is
    * what a Postgres-family JDBC handler would receive; `spark` is the
    * dialect of the in-sandbox stand-in engine. */
  final case class Dialect(quoteChar: String) {
    def q(ident: String): String =
      quoteChar + ident.replace(quoteChar, quoteChar + quoteChar) + quoteChar
  }
  object Dialect {
    val ansi: Dialect = Dialect("\"")
    val spark: Dialect = Dialect("`")
  }

  def renderJoin(
      out: Seq[Attribute],
      leaves: Seq[(DataSourceV2ScanRelation, MemScanProvenance)],
      edges: Seq[(JoinType, Option[Expression])],
      d: Dialect): String = {
    // which leaf (→ alias tN) owns each attribute, by exprId
    val owner: Map[ExprId, (Int, String)] = leaves.zipWithIndex.flatMap {
      case ((scan, _), i) => scan.output.map(a => a.exprId -> ((i, a.name)))
    }.toMap

    def qual(a: Attribute): String = {
      val (i, n) = owner.getOrElse(a.exprId,
        throw new UnsupportedOperationException(s"attribute $a not from a pushed leaf"))
      s"t$i.${d.q(n)}"
    }

    def ex(e: Expression): String = e match {
      case a: AttributeReference => qual(a)
      case Literal(v, t) => lit(v, t)
      case EqualTo(l, r) => s"${ex(l)} = ${ex(r)}"
      case EqualNullSafe(l, r) => s"${ex(l)} IS NOT DISTINCT FROM ${ex(r)}"
      case LessThan(l, r) => s"${ex(l)} < ${ex(r)}"
      case LessThanOrEqual(l, r) => s"${ex(l)} <= ${ex(r)}"
      case GreaterThan(l, r) => s"${ex(l)} > ${ex(r)}"
      case GreaterThanOrEqual(l, r) => s"${ex(l)} >= ${ex(r)}"
      case And(l, r) => s"(${ex(l)} AND ${ex(r)})"
      case Or(l, r) => s"(${ex(l)} OR ${ex(r)})"
      case Not(c) => s"(NOT ${ex(c)})"
      case IsNull(c) => s"${ex(c)} IS NULL"
      case IsNotNull(c) => s"${ex(c)} IS NOT NULL"
      case In(v, list) if list.forall(_.isInstanceOf[Literal]) =>
        s"${ex(v)} IN (${list.map(ex).mkString(", ")})"
      case other =>
        throw new UnsupportedOperationException(s"unrenderable ON expression: $other")
    }

    def leafSql(i: Int): String = {
      val (_, pv) = leaves(i)
      if (pv.filters.isEmpty && pv.columns == pv.allColumns) s"${d.q(pv.table)} t$i"
      else {
        // pushed filters + pruning re-expressed so the source still
        // evaluates them — they are gone from the Spark plan
        val cols = pv.columns.map(d.q).mkString(", ")
        val where =
          if (pv.filters.isEmpty) ""
          else " WHERE " + pv.filters.map(filterSql(_, d)).mkString(" AND ")
        s"(SELECT $cols FROM ${d.q(pv.table)}$where) t$i"
      }
    }

    val from = new StringBuilder(leafSql(0))
    edges.zipWithIndex.foreach { case ((jt, cond), i) =>
      val kw = jt match {
        case Inner => if (cond.isDefined) "JOIN" else "CROSS JOIN"
        case Cross => "CROSS JOIN"
        case LeftOuter => "LEFT JOIN"
        case RightOuter => "RIGHT JOIN"
        case FullOuter => "FULL JOIN"
        case other => throw new UnsupportedOperationException(s"join type $other")
      }
      from ++= s" $kw ${leafSql(i + 1)}"
      cond.foreach(c => from ++= s" ON ${ex(c)}")
    }
    // positional aliases c0..cN: the wire schema is the Join's output
    // order, independent of source-side column-name collisions
    val select = out.zipWithIndex
      .map { case (a, k) => s"${qual(a)} AS c$k" }.mkString(", ")
    s"SELECT $select FROM $from"
  }

  /** V1 pushed filters back to SQL (the column names are the source's). */
  def filterSql(f: sources.Filter, d: Dialect): String = f match {
    case sources.EqualTo(a, v) => s"${d.q(a)} = ${litAny(v)}"
    case sources.EqualNullSafe(a, v) => s"${d.q(a)} IS NOT DISTINCT FROM ${litAny(v)}"
    case sources.GreaterThan(a, v) => s"${d.q(a)} > ${litAny(v)}"
    case sources.GreaterThanOrEqual(a, v) => s"${d.q(a)} >= ${litAny(v)}"
    case sources.LessThan(a, v) => s"${d.q(a)} < ${litAny(v)}"
    case sources.LessThanOrEqual(a, v) => s"${d.q(a)} <= ${litAny(v)}"
    case sources.In(a, vs) => s"${d.q(a)} IN (${vs.map(litAny).mkString(", ")})"
    case sources.IsNull(a) => s"${d.q(a)} IS NULL"
    case sources.IsNotNull(a) => s"${d.q(a)} IS NOT NULL"
    case sources.And(l, r) => s"(${filterSql(l, d)} AND ${filterSql(r, d)})"
    case sources.Or(l, r) => s"(${filterSql(l, d)} OR ${filterSql(r, d)})"
    case sources.Not(c) => s"(NOT ${filterSql(c, d)})"
    case other => throw new UnsupportedOperationException(s"unrenderable filter: $other")
  }

  private def lit(v: Any, t: DataType): String = (v, t) match {
    case (null, _) => "NULL"
    case (s: org.apache.spark.unsafe.types.UTF8String, _) => quoteStr(s.toString)
    case (n, _: NumericType) => n.toString
    case (b: Boolean, _) => b.toString.toUpperCase
    case other => throw new UnsupportedOperationException(s"unrenderable literal: $other")
  }

  private def litAny(v: Any): String = v match {
    case null => "NULL"
    case s: String => quoteStr(s)
    case n: java.lang.Number => n.toString
    case b: java.lang.Boolean => b.toString.toUpperCase
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case other => throw new UnsupportedOperationException(s"unrenderable literal: $other")
  }

  private def quoteStr(s: String): String = "'" + s.replace("'", "''") + "'"
}

/** The remote database stand-in: executes rendered SQL text against the
  * registry's RAW rows in an isolated SparkSession (fresh session state:
  * no mem catalog, no pushdown rule — so no recursion), the way a JDBC
  * handler would hand the text to the remote engine. The stand-in engine
  * plans its own hash joins; swapping it for a real connection is the
  * one seam left when egress unblocks. */
object MemEngine {
  def run(sql: String, tables: Seq[String]): Seq[Row] = {
    val engine = SparkSession.active.newSession()
    tables.foreach { t =>
      val (schema, rows) = MemTables.registry.getOrElse(t,
        throw new IllegalStateException(s"mem table $t not registered"))
      engine.createDataFrame(rows.asJava, schema).createOrReplaceTempView(t)
    }
    engine.sql(sql).collect().toSeq
  }
}
