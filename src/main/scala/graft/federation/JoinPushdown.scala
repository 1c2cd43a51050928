package graft.federation

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalLimit, LogicalPlan, Project, Sort}
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
  * columns). A TREE of joins — any shape, left-deep or bushy (a bushy
  * right side renders as a parenthesized sub-join) — of inner / left /
  * right / full / cross joins whose leaves are all scans of the SAME
  * catalog is:
  *
  *   1. flattened into a [[PushTree]],
  *   2. RENDERED to one SQL statement in the source's dialect —
  *      `SELECT … FROM t0 JOIN t1 ON … LEFT JOIN t2 ON …` with each
  *      leaf's pushed filters/pruning re-expressed as a subquery — the
  *      exact text a JDBC handler would ship over the wire
  *      ([[SqlRender]]; reference `utilities/render/sqlalchemy_render
  *      .py:112`), and
  *   3. replaced by a LAZY [[RenderedSqlScan]] — a DSv2 leaf carrying
  *      the statement text. NOTHING executes at optimizer time: EXPLAIN
  *      over a pushed plan shows the statement without running it. The
  *      remote round trip happens at the first action, inside the
  *      scan's `planInputPartitions` — the exact shape
  *      `spark.read.jdbc(query)` takes — executed by the source's
  *      engine stand-in ([[MemEngine]]): an isolated SparkSession
  *      playing the remote database, which plans its own hash joins
  *      over the raw registry rows. Result rows flow to the outer plan
  *      through executor partitions, not a driver-side literal plan.
  *
  * The joins disappear from the outer Spark plan entirely. At 100 TB the
  * win is the reference's: against a remote warehouse the joined/filtered
  * result crosses the wire instead of N full tables. Anything the
  * renderer cannot express (exotic ON expressions, aggregated/limited
  * leaves) falls back to per-table fetch with Spark executing the join —
  * correct either way.
  */
/** A flattened same-catalog join tree, ready to render. */
sealed trait PushTree
object PushTree {
  final case class LeafNode(scan: DataSourceV2ScanRelation,
      prov: MemScanProvenance) extends PushTree
  final case class JoinNode(left: PushTree, right: PushTree,
      jt: JoinType, cond: Option[Expression]) extends PushTree
  def leaves(t: PushTree): Seq[LeafNode] = t match {
    case l: LeafNode => Seq(l)
    case JoinNode(l, r, _, _) => leaves(l) ++ leaves(r)
  }
}

object SingleSourceJoinPushdown extends Rule[LogicalPlan] {

  private val supportedTypes: Set[JoinType] =
    Set(Inner, Cross, LeftOuter, RightOuter, FullOuter)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // transformDown, not Up: the TOP of the largest pushable tree must
    // match first — bottom-up would materialize an inner two-leaf join
    // before the three-leaf tree above it could be seen whole.
    // An Aggregate OVER a same-catalog join tree ships as one GROUP BY
    // statement — the reference's "whole query to one integration" case
    // (query_planner.py:787-807); at 100 TB only |groups| rows cross the
    // wire. Single-leaf aggregates are already handled by the DSv2
    // SupportsPushDownAggregates path and stay out of this rule.
    case agg @ Aggregate(groups, aggs, child, _) =>
      pushAggTree(agg, groups, aggs, child).getOrElse(agg)
    // ORDER BY … LIMIT k over a same-catalog tree ships whole: the
    // source returns the finished top-k (the join analog of the leaf
    // SupportsPushDownTopN path — k rows cross the wire, not the join)
    case lim @ GlobalLimit(Literal(n: Int, _),
        LocalLimit(_, TopNShape(order, child))) =>
      pushTopNTree(lim, order, n, child).getOrElse(lim)
    // IN / EXISTS subqueries arrive as semi/anti joins — they ship as
    // correlated [NOT] EXISTS subqueries in the rendered statement
    case j @ Join(_, _, LeftSemi | LeftAnti, _, _) =>
      pushSemiTree(j).getOrElse(j)
    case j: Join => pushWholeTree(j).getOrElse(j)
  }

  private def pushSemiTree(j: Join): Option[LogicalPlan] =
    (flatten(j.left), flatten(j.right)) match {
      case (Some(lt), Some(rt)) =>
        val lvs = PushTree.leaves(lt) ++ PushTree.leaves(rt)
        if (lvs.size < 2 || !sameCatalog(lvs) || !engineServes(lvs)) None
        else try {
          val sql = SqlRender.renderSemi(j.output, lt, rt,
            anti = j.joinType == LeftAnti, j.condition, SqlRender.Dialect.spark)
          // the semi's one join edge: outer-side tables × subquery tables
          val edges = for {
            a <- PushTree.leaves(lt).map(_.prov.table).distinct
            b <- PushTree.leaves(rt).map(_.prov.table).distinct
          } yield (a, b)
          pushedScan(sql, lvs, edges, j.output)
        } catch { case NonFatal(_) => None }
      case _ => None
    }

  /** Sort[true] optionally narrowed by an attribute-only Project (the
    * optimizer places the final pruning ABOVE the sort when the sort key
    * is not selected — `SELECT id ORDER BY score LIMIT k`). The sort key
    * needs no place in the SELECT list: SQL orders by any input column. */
  private object TopNShape {
    def unapply(p: LogicalPlan): Option[(Seq[SortOrder], LogicalPlan)] = p match {
      case Sort(order, true, child, _) => Some((order, child))
      case Project(pl, Sort(order, true, child, _))
          if pl.forall(_.isInstanceOf[AttributeReference]) => Some((order, child))
      case _ => None
    }
  }

  private def pushTopNTree(lim: LogicalPlan, order: Seq[SortOrder], n: Int,
      child: LogicalPlan): Option[LogicalPlan] =
    // the engine returns rows in ORDER BY order, and LocalRelation
    // preserves row order — the observable ordering survives without a
    // Sort node (which could not re-resolve a projected-away sort key)
    pushTree(child, lim.output)(
      SqlRender.renderTopN(lim.output, order, n, _, SqlRender.Dialect.spark))

  private def pushAggTree(agg: Aggregate, groups: Seq[Expression],
      aggs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] =
    pushTree(child, agg.output)(
      SqlRender.renderAggregate(groups, aggs, _, SqlRender.Dialect.spark))

  private def pushWholeTree(j: Join): Option[LogicalPlan] =
    pushTree(j, j.output)(
      SqlRender.renderJoin(j.output, _, SqlRender.Dialect.spark))

  /** Flatten, render, and replace with a lazy [[RenderedSqlScan]] over
    * the statement. Any unrenderable corner is not an error — the
    * subtree stays in Spark (per-table fetch), which is the reference's
    * fallback too. */
  private def pushTree(p: LogicalPlan, out: Seq[Attribute])(
      render: PushTree => String): Option[LogicalPlan] = flatten(p) match {
    case Some(tree) =>
      val lvs = PushTree.leaves(tree)
      if (lvs.size < 2 || !sameCatalog(lvs) || !engineServes(lvs)) None
      else try pushedScan(render(tree), lvs, joinEdges(tree), out)
      catch { case NonFatal(_) => None }
    case None => None
  }

  /** Pure plan-time catalog check: only ship a statement whose every
    * leaf the source's engine actually serves (a JDBC handler knows its
    * own table catalog the same way). information_schema / mindsdb
    * meta-tables reuse the same DSv2 `MemTable` machinery but are served
    * live from session state, not the remote registry — joins over them
    * stay in Spark (the old eager path failed into this fallback at
    * optimize time; the lazy path must decide it up front). */
  private def engineServes(lvs: Seq[PushTree.LeafNode]): Boolean =
    lvs.forall(l => l.scan.relation.catalog.exists(_.isInstanceOf[MemCatalog]) &&
      MemTables.registry.contains(l.prov.table))

  /** The actual join edges of a pushed tree — for each [[PushTree
    * .JoinNode]], every (left-subtree table × right-subtree table) pair:
    * the pairs co-resident across that join boundary in the shipped
    * statement. (Adjacent-leaf `sliding(2)` pairs would misstate bushy
    * shapes: `people ⋈ (depts ⋈ sites)` never joins people to depts
    * directly in leaf order.) */
  private def joinEdges(tree: PushTree): Seq[(String, String)] = tree match {
    case _: PushTree.LeafNode => Seq.empty
    case PushTree.JoinNode(l, r, _, _) =>
      val own = for {
        a <- PushTree.leaves(l).map(_.prov.table).distinct
        b <- PushTree.leaves(r).map(_.prov.table).distinct
      } yield (a, b)
      joinEdges(l) ++ joinEdges(r) ++ own
  }

  /** Replace the subtree with a LAZY [[RenderedSqlRelation]] leaf over
    * the rendered statement. PURE at plan time: no remote execution, no
    * recording — both happen at the first action, inside the physical
    * node's `doExecute` (see [[RenderedSqlScanExec]]), so EXPLAIN and
    * re-optimization never touch the source. The leaf reuses the
    * subtree's own output attributes, so parent references resolve by
    * exprId unchanged. */
  private def pushedScan(sql: String, lvs: Seq[PushTree.LeafNode],
      edges: Seq[(String, String)], out: Seq[Attribute]): Option[LogicalPlan] = {
    // pure plan-time validation: PARSE (never execute) the rendered
    // statement so a renderer corner-case surfaces here, where the
    // enclosing try falls back to Spark-side execution — the safety the
    // old execute-at-plan-time path had, without its side effects
    SparkSession.active.sessionState.sqlParser.parsePlan(sql)
    val attrs = out.map(_.toAttribute.asInstanceOf[AttributeReference])
    Some(RenderedSqlRelation(sql, lvs.map(_.prov.table).distinct, edges, attrs))
  }

  /** Tree flattening — BOTH sides recurse, so bushy shapes push too; a
    * bushy right side renders as a parenthesized sub-join. This goes
    * BEYOND the reference, whose get_join_sequence only walks left-deep
    * trees (plan_join.py:185 raises on a joined right side); parity is
    * the left-deep subset. */
  private def flatten(p: LogicalPlan): Option[PushTree] = p match {
    case Join(l, r, jt, cond, _) if supportedTypes.contains(jt) =>
      for { lt <- flatten(l); rt <- flatten(r) }
        yield PushTree.JoinNode(lt, rt, jt, cond)
    // a USING join (and column pruning) leaves attribute-only Projects
    // between nested joins — transparent for flattening, the kept
    // attributes still resolve to their leaves by exprId
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      flatten(child)
    case s: DataSourceV2ScanRelation => s.scan match {
      // an aggregated/limited scan is already a complete answer in the
      // source — re-joining it inside a bigger pushed query would apply
      // the limit at the wrong point; leave those to Spark
      case m: MemScan => m.provenance
        .filterNot(pv => pv.aggregated || pv.limited)
        .map(PushTree.LeafNode(s, _))
      case _ => None
    }
    case _ => None
  }

  private def sameCatalog(leaves: Seq[PushTree.LeafNode]): Boolean = {
    val names = leaves.map(_.scan.relation.catalog.map(_.name()))
    names.forall(_.isDefined) && names.distinct.size == 1
  }

  /** Idempotently install on a session (the driver may hand a session we
    * did not build): the pushdown rule plus the strategy that plans its
    * [[RenderedSqlRelation]] leaves. */
  def ensure(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.exists(_ eq this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    if (!spark.experimental.extraStrategies.exists(_ eq RenderedSqlStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RenderedSqlStrategy
  }
}

/** A pushed statement as a LAZY leaf relation — the in-sandbox twin of
  * `spark.read.jdbc(query)`'s JDBCRelation: the relation IS the rendered
  * SQL text, and nothing executes until the first action reaches
  * [[RenderedSqlScanExec.doExecute]]. EXPLAIN shows the statement
  * without running it. The reference streams the same boundary as
  * TableResponse chunks (integrations/libs/response.py).
  *
  * Why a custom leaf + [[RenderedSqlStrategy]] rather than a DSv2 scan:
  * a DSv2 scan fetches either in `planInputPartitions` (which Spark
  * calls at PLAN time — `supportsColumnar`/`outputPartitioning` probes —
  * so EXPLAIN would execute the remote statement) or in the partition
  * readers (which run on task slots; the stand-in engine is Spark in
  * the SAME scheduler, so readers holding every slot starve the nested
  * fetch job — a real JDBC reader blocks on a socket, not on cluster
  * slots, so only the in-process stand-in deadlocks). `doExecute` is the
  * one hook that is (a) driver-side with all task slots free, and
  * (b) reached ONLY at action time, never by EXPLAIN. */
case class RenderedSqlRelation(sql: String, tables: Seq[String],
    joinEdges: Seq[(String, String)], output: Seq[Attribute])
    extends org.apache.spark.sql.catalyst.plans.logical.LeafNode {
  override def simpleString(maxFields: Int): String =
    s"RenderedSqlScan ${tables.mkString(",")} [$sql]"
  /** Remote-result size is unknown before execution — claim the default
    * (large) size so the optimizer never auto-broadcasts it. */
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = conf.defaultSizeInBytes)
}

/** Plans [[RenderedSqlRelation]] → [[RenderedSqlScanExec]]; installed by
  * [[SingleSourceJoinPushdown.ensure]]. */
object RenderedSqlStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    plan match {
      case r: RenderedSqlRelation =>
        RenderedSqlScanExec(r.sql, r.tables, r.joinEdges, r.output) :: Nil
      case _ => Nil
    }
}

/** Executes a pushed statement at ACTION time: `doExecute` runs on the
  * driver before any task launches (every slot free for the stand-in
  * engine's own jobs), records the wire telemetry once, and hands the
  * result out as `parallelize` partitions — rows stream to the outer
  * plan through executor tasks, in contiguous slices, so partition
  * concatenation preserves the statement's row order and a pushed
  * ORDER BY … LIMIT survives collect() without a Spark-side Sort. At
  * the real JDBC seam this node is replaced by `spark.read.jdbc`'s scan
  * (per-partition range fetches inside the readers) — execution time
  * either way, never optimizer time. */
case class RenderedSqlScanExec(sql: String, tables: Seq[String],
    joinEdges: Seq[(String, String)], output: Seq[Attribute])
    extends org.apache.spark.sql.execution.LeafExecNode {
  override def simpleString(maxFields: Int): String =
    s"RenderedSqlScan ${tables.mkString(",")} [$sql]"
  override protected def doExecute(): org.apache.spark.rdd.RDD[InternalRow] = {
    val fetched = MemEngine.run(sql, tables)
    MemTables.record(sql, joinEdges)
    // a fully-pruned scan (schema ∅) renders as `SELECT 1 …`: drop the
    // placeholder column, the row COUNT is the payload
    val rows = if (output.isEmpty) fetched.map(_ => Row.empty) else fetched
    val schema = StructType(output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    val n = math.max(1, math.min(8, rows.length))
    sparkContext.parallelize(rows, n).mapPartitions { it =>
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(schema)
      val proj = UnsafeProjection.create(schema)
      it.map(r => proj(conv(r).asInstanceOf[InternalRow]))
    }
  }
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

  /** Shared rendering context for one pushed tree: attribute ownership,
    * scalar-expression rendering, and the FROM clause. */
  private final class Ctx(tree: PushTree, d: Dialect) {
    private val leaves: Seq[PushTree.LeafNode] = PushTree.leaves(tree)
    // which leaf (→ alias tN) owns each attribute, by exprId
    private val owner: Map[ExprId, (Int, String)] = leaves.zipWithIndex.flatMap {
      case (l, i) => l.scan.output.map(a => a.exprId -> ((i, a.name)))
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
      // the optimizer collapses post-join scalar projections (e.g. a
      // COALESCE over an outer join's null extension) into the pushed
      // node's result expressions — render the common ones
      case Coalesce(children) => s"COALESCE(${children.map(ex).mkString(", ")})"
      case other =>
        throw new UnsupportedOperationException(s"unrenderable ON expression: $other")
    }

    private def leafSql(l: PushTree.LeafNode): String = {
      val i = leaves.indexWhere(_ eq l)
      val pv = l.prov
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

    def fromClause(): String = renderTree(tree)

    /** render one side of the tree as a FROM fragment (for subqueries) */
    def fragment(t: PushTree): String = renderTree(t)

    private def renderTree(t: PushTree): String = t match {
      case l: PushTree.LeafNode => leafSql(l)
      case PushTree.JoinNode(lt, rt, jt, cond) =>
        val kw = jt match {
          case Inner => if (cond.isDefined) "JOIN" else "CROSS JOIN"
          case Cross => "CROSS JOIN"
          case LeftOuter => "LEFT JOIN"
          case RightOuter => "RIGHT JOIN"
          case FullOuter => "FULL JOIN"
          case other => throw new UnsupportedOperationException(s"join type $other")
        }
        // SQL joins are left-associative, so a left JoinNode renders
        // flat; a bushy RIGHT side needs its own parentheses
        val rhs = rt match {
          case _: PushTree.JoinNode => s"(${renderTree(rt)})"
          case _ => renderTree(rt)
        }
        s"${renderTree(lt)} $kw $rhs" + cond.fold("")(c => s" ON ${ex(c)}")
    }
  }

  /** Positional select list c0..cN: the wire schema is the plan output
    * order, independent of source-side column-name collisions. A
    * zero-column output (Catalyst prunes everything when the parent
    * only counts rows) renders as the constant `1` — row multiplicity
    * is the whole payload, and SQL has no empty select list. */
  private def selectList(out: Seq[Attribute], qual: Attribute => String): String =
    if (out.isEmpty) "1 AS c_one"
    else out.zipWithIndex.map { case (a, k) => s"${qual(a)} AS c$k" }.mkString(", ")

  def renderJoin(
      out: Seq[Attribute],
      tree: PushTree,
      d: Dialect): String = {
    val ctx = new Ctx(tree, d)
    s"SELECT ${selectList(out, ctx.qual)} FROM ${ctx.fromClause()}"
  }

  /** Semi/anti join as a correlated [NOT] EXISTS subquery — the SQL a
    * planner ships for IN / EXISTS predicates when both sides live in
    * one source. The ON condition references the outer aliases from
    * inside the subquery (standard correlation); anti's NOT EXISTS
    * reproduces Spark's LeftAnti null semantics exactly (a null
    * condition never satisfies, so the row is kept). */
  def renderSemi(
      out: Seq[Attribute],
      ltree: PushTree,
      rtree: PushTree,
      anti: Boolean,
      cond: Option[Expression],
      d: Dialect): String = {
    val ctx = new Ctx(PushTree.JoinNode(ltree, rtree, Inner, None), d)
    val select = selectList(out, ctx.qual)
    val existsKw = if (anti) "NOT EXISTS" else "EXISTS"
    val where = cond.fold("")(c => s" WHERE ${ctx.ex(c)}")
    s"SELECT $select FROM ${ctx.fragment(ltree)} " +
      s"WHERE $existsKw (SELECT 1 FROM ${ctx.fragment(rtree)}$where)"
  }

  /** ORDER BY … LIMIT k over a join tree as one statement — the source
    * does the sort and ships only k rows. */
  def renderTopN(
      out: Seq[Attribute],
      order: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
      n: Int,
      tree: PushTree,
      d: Dialect): String = {
    val ctx = new Ctx(tree, d)
    val select = selectList(out, ctx.qual)
    val orderBy = order.map { so =>
      import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst}
      val dir = if (so.direction == Ascending) "ASC" else "DESC"
      val nulls = if (so.nullOrdering == NullsFirst) "NULLS FIRST" else "NULLS LAST"
      s"${ctx.ex(so.child)} $dir $nulls"
    }.mkString(", ")
    s"SELECT $select FROM ${ctx.fromClause()} ORDER BY $orderBy LIMIT $n"
  }

  /** Whole aggregate-over-join as one GROUP BY statement — COUNT/SUM/
    * MIN/MAX/AVG over grouped attributes; anything fancier (DISTINCT,
    * FILTER, non-attribute groups) throws → the caller leaves the
    * aggregate in Spark. */
  def renderAggregate(
      groups: Seq[Expression],
      aggs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      tree: PushTree,
      d: Dialect): String = {
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    val ctx = new Ctx(tree, d)
    def aggSql(e: Expression): String = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) => "COUNT(*)"
          case Count(Seq(c)) => s"COUNT(${ctx.ex(c)})"
          case s: Sum => s"SUM(${ctx.ex(s.child)})"
          case m: Min => s"MIN(${ctx.ex(m.child)})"
          case m: Max => s"MAX(${ctx.ex(m.child)})"
          case a: Average => s"AVG(${ctx.ex(a.child)})"
          case other =>
            throw new UnsupportedOperationException(s"unrenderable aggregate: $other")
        }
      case other => ctx.ex(other)
    }
    val select =
      if (aggs.isEmpty) "1 AS c_one" // all columns pruned: rows-only payload
      else aggs.zipWithIndex.map { case (ne, k) =>
        val body = ne match {
          case a: AttributeReference => ctx.qual(a)
          case al: Alias => aggSql(al.child)
          case other =>
            throw new UnsupportedOperationException(s"unrenderable select item: $other")
        }
        s"$body AS c$k"
      }.mkString(", ")
    val groupBy =
      if (groups.isEmpty) ""
      else " GROUP BY " + groups.map(ctx.ex).mkString(", ")
    s"SELECT $select FROM ${ctx.fromClause()}$groupBy"
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
  def run(sql: String, tables: Seq[String]): Seq[Row] =
    runWithSchema(sql, tables)._2

  /** Same execution, returning the result schema too (the native_query
    * route needs it to rebuild a typed DataFrame from the row batch). */
  def runWithSchema(sql: String, tables: Seq[String])
      : (org.apache.spark.sql.types.StructType, Seq[Row]) = {
    val engine = SparkSession.active.newSession()
    tables.foreach { t =>
      val (schema, rows) = MemTables.registry.getOrElse(t,
        throw new IllegalStateException(s"mem table $t not registered"))
      engine.createDataFrame(rows.asJava, schema).createOrReplaceTempView(t)
    }
    val df = engine.sql(sql)
    (df.schema, df.collect().toSeq)
  }
}
