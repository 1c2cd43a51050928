package graft.sqlx

import graft.kb.Kb
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  And => EAnd, EqualTo => EEq, Expression, GreaterThan => EGt,
  GreaterThanOrEqual => EGe, Like => ELike, Literal => ELit, Not => ENot,
  Or => EOr}
import org.apache.spark.sql.functions.{col, expr, lit}

/** KB WHERE-clause compiler — the SQL spelling of the knowledge-base
  * search surface (reference: knowledge_base/executor.py:116-154 compiles
  * the WHERE tree into set operations over per-condition searches;
  * controller.py:286-342 lifts relevance/hybrid/rerank params out of the
  * condition list).
  *
  * The clause parses through Catalyst's expression parser. `content`
  * comparisons become semantic conditions (equality/LIKE positive,
  * negation an exclusion set), special equality params become search-mode
  * switches, relevance bounds become thresholds, and any other predicate
  * is a metadata filter evaluated verbatim over the chunk columns.
  */
object KbSql {

  final case class Params(
      minRelevance: Option[Double] = None,
      hybrid: Boolean = false,
      alpha: Double = 0.5,
      rerank: Boolean = false)

  /** Execute `SELECT * FROM <kb> WHERE <where> [LIMIT <limit>]`.
    *
    * `ivfIndex` — `(centroids, nProbe)` when the KB has a CREATE INDEX'd
    * IVF coarse index (the chunk table then carries its `cell`
    * assignment): plain content searches probe only the nearest cells
    * instead of scanning the whole corpus (kb_controller.create_index,
    * command_executor.py:968). */
  def run(spark: SparkSession, chunks: DataFrame, where: String,
      limit: Option[Int], ivfIndex: Option[(DataFrame, Int)] = None): DataFrame =
    runParsed(spark, chunks,
      spark.sessionState.sqlParser.parseExpression(where), limit, ivfIndex)

  /** Canonicalize attribute names: strip table/alias qualifiers (the
    * chunk frame has no qualifiers) and map the reference's public
    * column names onto the chunk schema — `id` is the document id,
    * `chunk_content` the chunk text (executor.py result contract). */
  private def canon(e: Expression): Expression = e.transformUp {
    case u: UnresolvedAttribute =>
      u.nameParts.last.toLowerCase match {
        case "id" => UnresolvedAttribute(Seq("doc_id"))
        case "chunk_content" => UnresolvedAttribute(Seq("content"))
        case _ => UnresolvedAttribute(Seq(u.nameParts.last))
      }
  }

  /** Same, for a WHERE tree already parsed by the statement router (the
    * one-parse route hands the Filter condition over directly). */
  def runParsed(spark: SparkSession, chunks: DataFrame, where: Expression,
      limit: Option[Int], ivfIndex: Option[(DataFrame, Int)] = None): DataFrame = {
    val top = flattenAnd(canon(where))
    val (paramExprs, condExprs) = top.partition(isParam)
    val p = toParams(paramExprs)
    val k = limit.getOrElse(Kb.DefaultLimit)
    require(condExprs.nonEmpty,
      "knowledge-base query needs a content or metadata condition")
    val cond = condExprs.map(compile) match {
      case Seq(single) => single
      case many => Kb.And(many)
    }
    val out =
      if (p.hybrid)
        Kb.hybridSearch(chunks, positiveQuery(cond), p.alpha, metaFilter(cond), k)
      else if (p.rerank)
        Kb.vectorSearch(chunks, positiveQuery(cond), metaFilter(cond), k,
          p.minRelevance, Some(new Kb.KeywordBoostReranker))
      else if (isSimple(cond)) ivfIndex match {
        // plain content [+ metadata] — threshold applies BEFORE top-k,
        // exactly like the direct vectorSearch API
        case Some((cents, nProbe)) =>
          Kb.vectorSearchIvf(chunks.filter(metaFilter(cond)), cents,
            positiveQuery(cond), nProbe, k, p.minRelevance)
        case None =>
          Kb.vectorSearch(chunks, positiveQuery(cond), metaFilter(cond), k, p.minRelevance)
      }
      else {
        val searched = Kb.search(chunks, cond, k)
        p.minRelevance.fold(searched)(t => searched.filter(col("relevance") > t))
      }
    // standard search projection (executor.py result columns)
    val cols = Seq("chunk_id", "doc_id", "content", "distance", "relevance")
      .filter(out.columns.contains)
    out.select(cols.map(col): _*)
  }

  // ------------------------------------------------------------ the tree

  private def flattenAnd(e: Expression): Seq[Expression] = e match {
    case EAnd(l, r) => flattenAnd(l) ++ flattenAnd(r)
    case x => Seq(x)
  }
  private def flattenOr(e: Expression): Seq[Expression] = e match {
    case EOr(l, r) => flattenOr(l) ++ flattenOr(r)
    case x => Seq(x)
  }

  private def isContent(a: UnresolvedAttribute): Boolean =
    a.name.equalsIgnoreCase("content")

  private def str(v: Any): String = String.valueOf(v)

  /** WHERE tree → [[Kb.Cond]]; n-ary AND/OR (the reference's executor
    * works on flattened condition lists — binary nesting would change
    * AND semantics, which string-joins sibling positive contents). */
  private[sqlx] def compile(e: Expression): Kb.Cond = e match {
    case EAnd(_, _) => Kb.And(flattenAnd(e).map(compile))
    case EOr(_, _) => Kb.Or(flattenOr(e).map(compile))
    case EEq(a: UnresolvedAttribute, ELit(v, _)) if isContent(a) => Kb.ContentIs(str(v))
    case EEq(ELit(v, _), a: UnresolvedAttribute) if isContent(a) => Kb.ContentIs(str(v))
    case ELike(a: UnresolvedAttribute, ELit(v, _), _) if isContent(a) => Kb.ContentIs(str(v))
    case ENot(EEq(a: UnresolvedAttribute, ELit(v, _))) if isContent(a) => Kb.ContentNot(str(v))
    case ENot(ELike(a: UnresolvedAttribute, ELit(v, _), _)) if isContent(a) => Kb.ContentNot(str(v))
    case other => Kb.Meta(expr(other.sql))
  }

  // ----------------------------------------------------------- parameters

  private val ParamNames = Set("hybrid_search", "hybrid_search_alpha", "reranking")

  private def isParam(e: Expression): Boolean = e match {
    case EEq(a: UnresolvedAttribute, _: ELit) => ParamNames(a.name.toLowerCase)
    case EGe(a: UnresolvedAttribute, _: ELit) => a.name.equalsIgnoreCase("relevance")
    case EGt(a: UnresolvedAttribute, _: ELit) => a.name.equalsIgnoreCase("relevance")
    case _ => false
  }

  private def toParams(es: Seq[Expression]): Params =
    es.foldLeft(Params()) { (p, e) =>
      e match {
        case EEq(a: UnresolvedAttribute, ELit(v, _)) =>
          a.name.toLowerCase match {
            case "hybrid_search" => p.copy(hybrid = str(v).toBoolean)
            case "hybrid_search_alpha" => p.copy(alpha = str(v).toDouble)
            case "reranking" => p.copy(rerank = str(v).toBoolean)
          }
        case EGe(_, ELit(v, _)) => p.copy(minRelevance = Some(str(v).toDouble))
        case EGt(_, ELit(v, _)) => p.copy(minRelevance = Some(str(v).toDouble))
        case other => throw new IllegalArgumentException(s"bad KB param: $other")
      }
    }

  // ------------------------------------------- simple-condition accessors

  /** flat AND of ContentIs/ContentNot/Meta with at least one positive —
    * the shape vectorSearch/hybridSearch take directly. */
  private def isSimple(c: Kb.Cond): Boolean = c match {
    case Kb.ContentIs(_) => true
    case Kb.And(items) =>
      items.forall {
        case Kb.ContentIs(_) | Kb.Meta(_) => true
        case _ => false
      } && items.exists(_.isInstanceOf[Kb.ContentIs])
    case _ => false
  }

  /** positive contents string-AND-joined (executor.py:349-355). */
  private def positiveQuery(c: Kb.Cond): String = c match {
    case Kb.ContentIs(q) => q
    case Kb.And(items) =>
      val qs = items.collect { case Kb.ContentIs(q) => q }
      require(qs.nonEmpty, "hybrid/rerank search needs a positive content condition")
      qs.mkString(" AND ")
    case _ => throw new IllegalArgumentException(
      "hybrid/rerank search supports content [+ metadata] conditions only")
  }

  private def metaFilter(c: Kb.Cond): Column = c match {
    case Kb.And(items) =>
      items.collect { case Kb.Meta(f) => f }.foldLeft(lit(true))(_ && _)
    case _ => lit(true)
  }
}
