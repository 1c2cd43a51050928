package graft.federation

import java.util
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory DSv2 catalog with real pushdown — the Spark-native mirror of
  * the reference's `dummy_data_handler` (tests exercise federated
  * planning against an embedded DuckDB;
  * integrations/handlers/dummy_data_handler/dummy_data_handler.py:13-110)
  * and of the APITable pushdown contract (`list(conditions, limit, sort,
  * targets)` receives pushed FilterConditions,
  * integrations/libs/api_handler.py:285-343).
  *
  * Register with `spark.conf.set("spark.sql.catalog.mem",
  * classOf[MemCatalog].getName)` and address tables as
  * `mem.<name>` — multi-catalog name resolution, cross-source joins, and
  * DSv2 pushdown (filters, column pruning, limit) all flow through the
  * standard Catalyst paths. Pushed filters are recorded per table in
  * [[MemTables.pushed]] so plan-shape tests can assert that predicates
  * actually reached the source (the reference's planner golden tests do
  * the same on FetchDataframeStep queries).
  */
object MemTables {
  /** table name → (schema, rows) */
  val registry: TrieMap[String, (StructType, Seq[Row])] = TrieMap.empty
  /** table name → filters pushed at the last scan planning */
  val pushed: TrieMap[String, Seq[Filter]] = TrieMap.empty
  /** table name → top-k limit pushed at the last scan planning */
  val pushedTopN: TrieMap[String, Int] = TrieMap.empty
  /** (left, right) table pairs whose join was evaluated source-side
    * ([[SingleSourceJoinPushdown]]) — plan-shape tests assert on this. */
  val pushedJoins: scala.collection.mutable.ArrayBuffer[(String, String)] =
    scala.collection.mutable.ArrayBuffer.empty
  /** SQL text rendered for each whole-subplan pushdown, in execution
    * order — the exact string a JDBC source would receive; specs assert
    * its shape ([[SingleSourceJoinPushdown]], [[SqlRender]]). */
  val renderedSql: scala.collection.mutable.ArrayBuffer[String] =
    scala.collection.mutable.ArrayBuffer.empty

  def register(name: String, schema: StructType, rows: Seq[Row]): Unit =
    registry(name) = (schema, rows)

  /** Telemetry cap: the buffers are observability, not state — bounded
    * so repeated executions in one long-lived session can't grow them
    * without limit. */
  private val MaxRecorded = 512

  /** Record one pushed statement's wire telemetry — called at EXECUTION
    * time from [[RenderedSqlScan.planInputPartitions]], never at plan
    * time, so EXPLAIN/re-optimization leave the buffers untouched. */
  def record(sql: String, edges: Seq[(String, String)]): Unit = synchronized {
    renderedSql += sql
    if (renderedSql.size > MaxRecorded)
      renderedSql.remove(0, renderedSql.size - MaxRecorded)
    pushedJoins ++= edges
    if (pushedJoins.size > MaxRecorded)
      pushedJoins.remove(0, pushedJoins.size - MaxRecorded)
  }
}

class MemCatalog extends TableCatalog {
  private var catalogName = "mem"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    MemTables.registry.keys.map(n => Identifier.of(namespace, n)).toArray

  override def loadTable(ident: Identifier): Table =
    MemTables.registry.get(ident.name()) match {
      case Some((schema, rows)) => new MemTable(ident.name(), schema, rows)
      case None =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Seq(catalogName, ident.name()))
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    MemTables.register(ident.name(), schema, Seq.empty)
    new MemTable(ident.name(), schema, Seq.empty)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    loadTable(ident)

  override def dropTable(ident: Identifier): Boolean =
    MemTables.registry.remove(ident.name()).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    MemTables.registry.remove(oldIdent.name()).foreach { case (s, r) =>
      MemTables.register(newIdent.name(), s, r)
    }
}

class MemTable(tableName: String, tableSchema: StructType, rows: Seq[Row])
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(tableName, tableSchema, rows)
}

/** ScanBuilder with the three classic pushdowns. Filters the source can
  * evaluate are accepted (removed from the Spark plan); the rest are
  * returned for Spark to re-apply — exactly the reference's split
  * between handler-pushed FilterConditions and the local SubSelectStep
  * re-filter (query_planner.py:456-481). */
class MemScanBuilder(tableName: String, fullSchema: StructType, rows: Seq[Row])
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.{Expression => CExpr, FieldReference, NullOrdering, SortDirection, SortOrder}

  private var requiredSchema = fullSchema
  private var accepted: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var topN: Option[(Array[SortOrder], Int)] = None
  private var aggregation: Option[Aggregation] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(MemFilterEval.supported(fullSchema, _))
    accepted = ok
    MemTables.pushed(tableName) = ok.toSeq
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(required: StructType): Unit =
    requiredSchema =
      if (aggregation.isDefined) required // post-aggregation output shape
      else StructType(fullSchema.fields.filter(f => required.fieldNames.contains(f.name)))

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  // ---- ORDER BY … LIMIT k pushdown: the source returns the finished
  // top-k (the reference ships ORDER BY/LIMIT to the handler the same
  // way, query_planner.py:456-481 + handler-side sort). COMPLETE
  // pushdown (isPartiallyPushed=false): Spark drops its own Sort+Limit
  // — k rows cross the boundary, not the table.
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean =
    if (aggregation.isDefined ||
        !orders.forall(o => refName(o.expression()).isDefined)) false
    else { topN = Some((orders, n)); MemTables.pushedTopN(tableName) = n; true }

  override def isPartiallyPushed(): Boolean = false

  private def topNOrdering(orders: Array[SortOrder]): Ordering[Row] =
    new Ordering[Row] {
      override def compare(x: Row, y: Row): Int =
        orders.iterator.map { o =>
          val i = fullSchema.fieldIndex(refName(o.expression()).get)
          val (a, b) = (x.get(i), y.get(i))
          val c = (a, b) match {
            case (null, null) => 0
            case (null, _) => if (o.nullOrdering() == NullOrdering.NULLS_FIRST) -1 else 1
            case (_, null) => if (o.nullOrdering() == NullOrdering.NULLS_FIRST) 1 else -1
            case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
          }
          if (o.direction() == SortDirection.DESCENDING) -c else c
        }.find(_ != 0).getOrElse(0)
    }

  // ---- whole-aggregate pushdown: the DSv2-native form of the
  // reference's ship-the-whole-query-to-the-source planning
  // (query_planner.py:787-807) — MIN/MAX/SUM/COUNT(*) with GROUP BY
  // evaluate source-side; Spark sees finished groups.

  private def refName(e: CExpr): Option[String] = e match {
    case f: org.apache.spark.sql.connector.expressions.NamedReference
        if f.fieldNames().length == 1 => Some(f.fieldNames()(0))
    case _ => None
  }

  private def aggSupported(agg: Aggregation): Boolean =
    agg.groupByExpressions.forall(refName(_).isDefined) &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => refName(m.column).isDefined
        case m: Max => refName(m.column).isDefined
        case s: Sum => !s.isDistinct && refName(s.column).isDefined
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean = aggSupported(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (aggSupported(agg)) {
      aggregation = Some(agg)
      // the scan's output IS the aggregated shape from here on:
      // group-by columns first, then one column per aggregate — Spark
      // matches positionally in that order (V2 pushdown layout)
      val groupFields = agg.groupByExpressions.toSeq.map(e =>
        fullSchema(refName(e).get))
      val aggFields = agg.aggregateExpressions.toSeq.zipWithIndex.map {
        case (_: CountStar, i) => StructField(s"agg_$i", LongType)
        case (m: Min, i) => StructField(s"agg_$i", fullSchema(refName(m.column).get).dataType)
        case (m: Max, i) => StructField(s"agg_$i", fullSchema(refName(m.column).get).dataType)
        case (s: Sum, i) =>
          val t = fullSchema(refName(s.column).get).dataType match {
            case LongType | IntegerType | ShortType | ByteType => LongType
            case other => other
          }
          StructField(s"agg_$i", t)
        case (other, _) => throw new UnsupportedOperationException(other.toString)
      }
      requiredSchema = StructType(groupFields ++ aggFields)
      true
    } else false

  override def build(): Scan = {
    // source-side evaluation: filter → aggregate|project → limit happen
    // HERE, before rows ever enter Spark
    val filtered = rows.filter(r => accepted.forall(MemFilterEval.eval(fullSchema, r, _)))
    val out = aggregation match {
      case Some(agg) => MemAggEval.eval(fullSchema, filtered, agg)
      case None =>
        // top-k sorts on FULL rows (the sort key may be pruned from the
        // output), then projects
        val ordered = topN.fold(filtered) { case (orders, n) =>
          filtered.sorted(topNOrdering(orders)).take(n)
        }
        val idx = requiredSchema.fieldNames.map(fullSchema.fieldIndex)
        ordered.map(r => Row.fromSeq(idx.toSeq.map(r.get)))
    }
    val limited = limit.fold(out)(out.take)
    new MemScan(requiredSchema, limited,
      Some(MemScanProvenance(tableName, accepted.toSeq,
        requiredSchema.fieldNames.toSeq, fullSchema.fieldNames.toSeq,
        aggregated = aggregation.isDefined,
        limited = limit.isDefined || topN.isDefined)))
  }
}

/** What a [[MemScan]] is, in source terms: the table it reads plus every
  * pushdown folded into it — exactly the facts a SQL renderer needs to
  * re-express the scan as `(SELECT cols FROM table WHERE fs) alias` when
  * a whole join tree ships to the source as one query. Aggregated or
  * limited scans are complete answers already and never re-render inside
  * a larger pushed query. */
case class MemScanProvenance(
    table: String,
    filters: Seq[Filter],
    columns: Seq[String],
    allColumns: Seq[String],
    aggregated: Boolean,
    limited: Boolean)

/** Driver-side (i.e. "source"-side) evaluation of pushed aggregates. */
object MemAggEval {
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.FieldReference

  private def name(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[org.apache.spark.sql.connector.expressions.NamedReference].fieldNames()(0)

  def eval(schema: StructType, rows: Seq[Row], agg: Aggregation): Seq[Row] = {
    val groupCols = agg.groupByExpressions.toSeq.map(name)
    val groupIdx = groupCols.map(schema.fieldIndex)
    def numeric(v: Any): Double = v.asInstanceOf[java.lang.Number].doubleValue()
    // a GLOBAL aggregate over zero rows still yields exactly one row
    // (COUNT=0, MIN/MAX/SUM=NULL) — grouping by key would yield none
    val groups: Seq[(Seq[Any], Seq[Row])] =
      if (groupCols.isEmpty) Seq((Seq.empty[Any], rows))
      else rows.groupBy(r => groupIdx.map(r.get)).toSeq
    groups.map { case (key, grp) =>
      val aggVals = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => grp.size.toLong
        case m: Min =>
          val vals = grp.map(_.get(schema.fieldIndex(name(m.column)))).filter(_ != null)
          if (vals.isEmpty) null
          else vals.reduce((a, b) =>
            if (a.asInstanceOf[Comparable[Any]].compareTo(b) <= 0) a else b)
        case m: Max =>
          val vals = grp.map(_.get(schema.fieldIndex(name(m.column)))).filter(_ != null)
          if (vals.isEmpty) null
          else vals.reduce((a, b) =>
            if (a.asInstanceOf[Comparable[Any]].compareTo(b) >= 0) a else b)
        case s: Sum =>
          val i = schema.fieldIndex(name(s.column))
          // SQL SUM skips NULLs and is NULL over an all-NULL (or empty)
          // group — pushdown must be transparent vs Spark's own SUM.
          val nonNull = grp.filterNot(_.isNullAt(i))
          // `: Any` blocks Scala's numeric unification — without it the
          // Long branch silently widens to Double to match the other arm
          val v: Any =
            if (nonNull.isEmpty) null
            else schema.fields(i).dataType match {
              case LongType | IntegerType | ShortType | ByteType =>
                nonNull.map(r => numeric(r.get(i)).toLong).sum
              case _ => nonNull.map(r => numeric(r.get(i))).sum
            }
          v
        case other => throw new UnsupportedOperationException(other.toString)
      }
      Row.fromSeq(key ++ aggVals)
    }
  }
}

class MemScan(schema: StructType, val memRows: Seq[Row],
    val provenance: Option[MemScanProvenance] = None) extends Scan with Batch {
  /** post-pushdown rows — [[SingleSourceJoinPushdown]] reads these to
    * evaluate a whole join source-side. */
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // split into 2 partitions to keep the multi-partition path honest
    val data = memRows.map(_.toSeq.toArray)
    val (a, b) = data.splitAt((data.length + 1) / 2)
    Array(MemPartition(a.toArray), MemPartition(b.toArray))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MemReaderFactory(schema)
}

case class MemPartition(data: Array[Array[Any]]) extends InputPartition

class MemReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val it = partition.asInstanceOf[MemPartition].data.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          current = conv(Row.fromSeq(it.next().toIndexedSeq)).asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Row-level evaluation of V1 filters the mem source accepts. */
object MemFilterEval {
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case EqualNullSafe(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _) => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case In(a, _) => schema.fieldNames.contains(a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case Or(l, r) => supported(schema, l) && supported(schema, r)
    case Not(c) => supported(schema, c)
    case _ => false
  }

  @annotation.nowarn("msg=exhaustive")
  def eval(schema: StructType, row: Row, f: Filter): Boolean = {
    def v(attr: String): Any = row.get(schema.fieldIndex(attr))
    def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b.asInstanceOf[Any])
    f match {
      // SQL equality is three-valued: a null operand compares UNKNOWN
      // (row rejected), never null == null. EqualNullSafe is the <=>
      // spelling that does match nulls.
      case EqualTo(a, value) => value != null && v(a) != null && v(a) == value
      case EqualNullSafe(a, value) => v(a) == value
      case GreaterThan(a, value) => v(a) != null && cmp(v(a), value) > 0
      case GreaterThanOrEqual(a, value) => v(a) != null && cmp(v(a), value) >= 0
      case LessThan(a, value) => v(a) != null && cmp(v(a), value) < 0
      case LessThanOrEqual(a, value) => v(a) != null && cmp(v(a), value) <= 0
      case In(a, values) => values.contains(v(a))
      case IsNull(a) => v(a) == null
      case IsNotNull(a) => v(a) != null
      case And(l, r) => eval(schema, row, l) && eval(schema, row, r)
      case Or(l, r) => eval(schema, row, l) || eval(schema, row, r)
      case Not(c) => !eval(schema, row, c)
    }
  }
}
