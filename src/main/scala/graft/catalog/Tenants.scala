package graft.catalog

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession

/** Per-tenant object namespaces (the reference threads a `company_id`
  * through every controller so same-named objects under different
  * companies are fully isolated —
  * tests/integration/flows/test_company_independent.py; ctx.company_id in
  * jobs_controller.py:292 etc.).
  *
  * Each tenant id maps to its OWN (Catalog, Warehouse, Jobs) triple over
  * the shared SparkSession: models, databases, KBs, views, warehouse
  * tables and jobs all live inside the triple, so isolation is by
  * construction rather than by row-filtering. The default tenant ("") is
  * the server's pre-existing shared state, so tenancy is opt-in and the
  * single-tenant path is unchanged.
  *
  * Meta-table correctness across tenants rests on the thread-local
  * provider binding in [[InfoSchema]]/[[MindsdbTables]]: constructing a
  * session over a tenant's triple rebinds the current thread to that
  * tenant's frames.
  */
final class Tenants(spark: SparkSession, sfDir: String,
    defaultState: Tenants.State) {

  private val states = TrieMap[String, Tenants.State]("" -> defaultState)

  private def normalize(id: String): String = id.trim.toLowerCase

  /** The tenant's state triple, created lazily on first use (the
    * reference auto-creates the company scope on first request). */
  def of(id: String): Tenants.State =
    states.getOrElseUpdate(normalize(id), Tenants.State(
      new Catalog(spark, sfDir), Warehouse.temp(spark),
      new graft.incremental.Jobs))

  def default: Tenants.State = defaultState
  def list(): Seq[String] = states.keys.toSeq.sorted
  /** every live tenant triple (default included) — the jobs daemon
    * ticks all of them, the reference scheduler's all-companies pass. */
  def allStates(): Seq[Tenants.State] = states.values.toSeq
}

object Tenants {
  final case class State(catalog: Catalog, warehouse: Warehouse,
      jobs: graft.incremental.Jobs)

  /** `SET tenant = 'x'` / `SET company_id = 'x'` — the session-level
    * tenant switch (the reference carries company_id on the connection
    * context; SET is this build's spelling of that attribute). */
  private val SetTenant =
    """(?is)\s*SET\s+(?:SESSION\s+)?(?:tenant|company_id)\s*=\s*'?([\w.-]*)'?\s*;?\s*""".r

  def switchStatement(sql: String): Option[String] = sql match {
    case SetTenant(id) => Some(id)
    case _ => None
  }
}
