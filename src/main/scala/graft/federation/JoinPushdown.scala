package graft.federation

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Predicate
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types.{StructField, StructType}

/** Whole-join pushdown to a single remote source — the Spark analog of
  * the reference planner's "if every table in the (sub)query lives in one
  * integration, ship the whole query there" rule (query_planner.py:
  * 787-807; joins plan_join.py:61-94).
  *
  * Runs in the `User Provided Optimizers` batch, AFTER V2 scan planning:
  * by then each mem-source leaf is a [[DataSourceV2ScanRelation]] whose
  * [[MemScan]] already holds the filtered/projected/limited rows the
  * source would return. An INNER join whose two sides are scans of the
  * SAME catalog is evaluated source-side (for this in-memory source: on
  * the driver, exactly where the "remote" rows live) and replaced with a
  * [[LocalRelation]] — the join disappears from the Spark plan entirely,
  * so no per-table fetch, no exchange, no join executor.
  *
  * At 100 TB the win is the same as the reference's: against a remote
  * warehouse the joined/filtered result crosses the wire instead of the
  * two full tables. Only Inner joins push (outer-join null-extension
  * belongs to the engine that owns the smaller side's absence semantics),
  * and only when both sides come from one catalog — cross-integration
  * joins stay in Spark, as in the reference.
  */
object SingleSourceJoinPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l: DataSourceV2ScanRelation, r: DataSourceV2ScanRelation, Inner, cond, _)
        if l.scan.isInstanceOf[MemScan] && r.scan.isInstanceOf[MemScan] &&
          sameCatalog(l, r) =>
      val lScan = l.scan.asInstanceOf[MemScan]
      val rScan = r.scan.asInstanceOf[MemScan]
      val attrs = j.output
      val schema = StructType(attrs.map(a => StructField(a.name, a.dataType, a.nullable)))
      val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      val pred = cond.map(Predicate.create(_, attrs))
      val joined = for {
        lr <- lScan.memRows
        rr <- rScan.memRows
        row = conv(Row.fromSeq(lr.toSeq ++ rr.toSeq)).asInstanceOf[InternalRow]
        if pred.forall(_.eval(row))
      } yield row
      MemTables.pushedJoins +=
        ((tableName(l), tableName(r)))
      LocalRelation(attrs, joined)
  }

  private def sameCatalog(l: DataSourceV2ScanRelation, r: DataSourceV2ScanRelation): Boolean =
    (l.relation.catalog, r.relation.catalog) match {
      case (Some(a), Some(b)) => a.name() == b.name()
      case _ => false
    }

  private def tableName(s: DataSourceV2ScanRelation): String =
    s.relation.identifier.map(_.name()).getOrElse(s.relation.table.name())

  /** Idempotently install on a session (the driver may hand a session we
    * did not build). */
  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_ eq this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
