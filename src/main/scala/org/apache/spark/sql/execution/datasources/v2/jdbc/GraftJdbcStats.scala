package org.apache.spark.sql.execution.datasources.v2.jdbc

import java.util.OptionalLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics => V2Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.jdbc.JDBCRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StringType, StructType}

/** ANALYZE statistics for remote JDBC tables, fed into Catalyst's
  * cost-based optimizer through the DSv2 scan-statistics seam.
  *
  * Spark's `JDBCScan` does not implement `SupportsReportStatistics`, so
  * a `DataSourceV2ScanRelation` over a remote table reports
  * `defaultSizeInBytes` (effectively "infinitely large") and a remote
  * dimension table can never win a build side or a broadcast without
  * shuffling first. The reference keeps per-integration row counts in
  * its data catalog (`ANALYZE`/metadata collection,
  * integrations/utilities handlers) and plans with them; here the same
  * numbers flow into the standard Spark channel instead:
  *
  *  - [[GraftJdbcStats.analyze]] runs one COUNT per underlying relation
  *    (pushed to the remote engine as an aggregate) and records
  *    (url, table) → rowCount/size.
  *  - [[GraftJdbcStats.Attach]] — registered in
  *    `experimental.extraOptimizations` ("User Provided Optimizers",
  *    the LAST optimizer batch, after Join Reorder) — rewraps the scan
  *    in a [[GraftJdbcStats.StatsScan]], a `V1ScanWrapper` that
  *    additionally implements `SupportsReportStatistics`, so
  *    `DataSourceV2ScanRelation.computeStats` reports the recorded
  *    cardinality to PHYSICAL planning — build-side and broadcast
  *    selection. (CostBasedJoinReorder runs earlier and does not see
  *    these numbers; multi-way remote join ORDER is unchanged by
  *    ANALYZE — only the join STRATEGY benefits.)
  *
  * Lives in Spark's package because `JDBCScan`/`V1ScanWrapper` are
  * `private[sql]`; contains no Spark code, only delegation.
  */
object GraftJdbcStats {

  /** (jdbc url, remote table name) -> (rowCount, sizeInBytes) */
  private val registry = TrieMap.empty[(String, String), (Long, Long)]

  /** The catalog path hands tables around as `"APP"."SUPPLIER"` while
    * the V1 reader says `SUPPLIER` — normalize both to one key. */
  private def key(url: String, table: String): (String, String) =
    (url, table.replace("\"", "").toUpperCase.stripPrefix("APP."))

  def put(url: String, table: String, rows: Long, bytes: Long): Unit =
    registry(key(url, table)) = (rows, bytes)

  def get(url: String, table: String): Option[(Long, Long)] =
    registry.get(key(url, table))

  /** Drop the recorded stats for one remote table — called by every
    * write-back / remote-DML path so broadcast and build-side decisions
    * never plan on a pre-write COUNT (the same staleness class
    * Catalog.refreshCboStatsAfterWrite closes for warehouse tables).
    * The next ANALYZE re-establishes the number; until then the scan
    * reports the conservative default estimate again. */
  def invalidate(url: String, table: String): Unit =
    registry.remove(key(url, table))

  /** Raw remote DML (native_query) names its table inside opaque SQL —
    * drop every entry for that connection rather than parse it. */
  def invalidateUrl(url: String): Unit =
    registry.keys.filter(_._1 == url).foreach(registry.remove)

  def clear(): Unit = registry.clear()

  /** Same row-width convention as the engine catalog's buildCboStats:
    * fixed-width types by defaultSize, strings at Spark's default 20B
    * estimate plus offset. */
  private def rowWidth(schema: StructType): Long =
    schema.fields.map { f =>
      f.dataType match {
        case StringType => 28L
        case dt => dt.defaultSize.toLong
      }
    }.sum.max(8L)

  /** ANALYZE a frame that scans remote JDBC tables: ONE COUNT(*) per
    * underlying relation (pushed to the remote engine as a complete
    * aggregate — metadata-sized traffic at any table size). Each
    * relation is counted SEPARATELY through a fresh single-table read —
    * counting the composite frame once and recording that number for
    * every relation would stamp a join's output cardinality onto each
    * input table. Returns the single-relation count when the frame is
    * one table (the common ANALYZE TABLE path), the last relation's
    * count otherwise; None if the frame has no JDBC scan. */
  def analyze(df: DataFrame): Option[Long] = {
    val rels: Seq[(String, Map[String, String], String, StructType)] =
      df.queryExecution.analyzed.collect {
        case r: DataSourceV2Relation => r.table match {
          case t: JDBCTable =>
            Seq((t.jdbcOptions.url, t.jdbcOptions.parameters.toMap,
              t.jdbcOptions.tableOrQuery, t.schema))
          case _ => Nil
        }
        case lr: LogicalRelation => lr.relation match {
          case j: JDBCRelation =>
            Seq((j.jdbcOptions.url, j.jdbcOptions.parameters.toMap,
              j.jdbcOptions.tableOrQuery, j.schema))
          case _ => Nil
        }
      }.flatten
    if (rels.isEmpty) None
    else if (rels.size == 1) {
      // one relation: the frame IS the table (modulo pushable filters) —
      // count it directly, no second connection needed
      val (url, _, table, schema) = rels.head
      val n = df.count()
      put(url, table, n, n * rowWidth(schema))
      Some(n)
    } else {
      var last: Option[Long] = None
      rels.foreach { case (url, params, table, schema) =>
        val n = df.sparkSession.read.format("jdbc").options(params).load().count()
        put(url, table, n, n * rowWidth(schema))
        last = Some(n)
      }
      last
    }
  }

  /** A `V1ScanWrapper` that reports the ANALYZE-recorded cardinality.
    * Subclasses the wrapper (not `Scan` directly) so every downstream
    * pattern match — `DataSourceV2Strategy`'s V1 branch, explain
    * formatting of pushed operators — keeps seeing the shape it
    * expects; only `computeStats` observes the added interface. */
  final class StatsScan(v1: V1Scan, handled: Seq[Filter],
      ops: PushedDownOperators, val rows: Long, val bytes: Long)
      extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
    override def estimateStatistics(): V2Statistics = new V2Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }
    // the inherited case-class equality would make the stats-bearing
    // wrapper == the plain one, so TreeNode.transform (which keeps the
    // original node when the rewrite compares fastEquals) would silently
    // drop the replacement
    override def canEqual(that: Any): Boolean = that.isInstanceOf[StatsScan]
    override def equals(that: Any): Boolean = that match {
      case s: StatsScan =>
        s.v1Scan == v1Scan && s.handledFilters == handledFilters &&
          s.pushedDownOperators == pushedDownOperators &&
          s.rows == rows && s.bytes == bytes
      case _ => false
    }
    override def hashCode(): Int =
      (super.hashCode * 31 + rows.hashCode) * 31 + bytes.hashCode
  }

  /** Post-pushdown rule: attach recorded statistics to un-aggregated
    * JDBC scans. Scans with pushed aggregates/limits produce group-count
    * rows, not table rows — those keep the default estimate. Pushed
    * predicates are allowed: the full-table count is then an upper
    * bound, which can only under-broadcast (safe), never hold a
    * broadcast past its true size.
    *
    * Registered through `experimental.extraOptimizations` ("User
    * Provided Optimizers" — the batch AFTER V2ScanRelationPushDown has
    * produced the `V1ScanWrapper(JDBCScan)` shape this matches, and
    * before physical planning reads `optimizedPlan.stats` for
    * build-side/broadcast selection). Spark 4's "Pre CBO Rules" batch
    * is NOT usable for this: it runs before scan pushdown, when the
    * relation is still an unwrapped DataSourceV2Relation. */
  object Attach extends Rule[LogicalPlan] {
    def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case r @ DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _)
          if !w.isInstanceOf[StatsScan] => w.v1Scan match {
        case j: JDBCScan
            if j.pushedAggregateColumn.isEmpty && j.groupByColumns.isEmpty &&
               j.pushedLimit == 0 =>
          registry.get(key(j.relation.jdbcOptions.url,
              j.relation.jdbcOptions.tableOrQuery)) match {
            case Some((rows, bytes)) =>
              r.copy(scan = new StatsScan(
                w.v1Scan, w.handledFilters, w.pushedDownOperators, rows, bytes))
            case None => r
          }
        case _ => r
      }
    }
  }

  /** Idempotently register [[Attach]] on a session (same late-binding
    * seam as SingleSourceJoinPushdown — works on sessions this library
    * did not build). */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_ eq Attach))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Attach
}
