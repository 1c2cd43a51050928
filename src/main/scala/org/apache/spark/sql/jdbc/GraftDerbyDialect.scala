package org.apache.spark.sql.jdbc

/** Spark's Derby dialect with the V2 pushdown capabilities switched on.
  *
  * Spark 4.1 gates DSv2 join / limit pushdown on the JDBC dialect
  * (`JdbcDialect.supportsJoin` / `supportsLimit`, both default-false) and
  * ships `DerbyDialect` with neither enabled. Derby itself handles both:
  * ANSI joins since forever, and SQL:2008 `FETCH FIRST n ROWS ONLY`
  * instead of the non-standard `LIMIT` (which is why the stock dialect's
  * `getLimitClause` returns the empty string). This subclass — placed in
  * this package because `DerbyDialect` is `private[jdbc]` — turns the
  * capabilities on and spells the limit clause in Derby's syntax, so
  * Spark's own JDBC pushdown machinery (`JDBCScanBuilder`'s
  * SupportsPushDownJoin/Limit/TopN) renders joins and top-k into the one
  * statement the embedded engine executes.
  *
  * OFFSET stays off: `JdbcSQLQueryBuilder` appends LIMIT before OFFSET
  * (MySQL order), while Derby requires `OFFSET … FETCH …`; Spark applies
  * the offset itself, which is always correct.
  *
  * Registered once by [[graft.federation.JdbcDb.ensureDialect]] —
  * `JdbcDialects.registerDialect` prepends, so this wins over the stock
  * Derby dialect for every `jdbc:derby:` URL in the session.
  */
object GraftDerbyDialect {
  /** The stock dialect is `private[jdbc]`, so the subclass stays private
    * here and callers receive it as the public [[JdbcDialect]]. */
  def apply(): JdbcDialect = new Impl

  private class Impl extends DerbyDialect {
    override def supportsJoin: Boolean = true
    override def supportsLimit: Boolean = true
    override def getLimitClause(limit: Integer): String =
      if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""
  }
}
