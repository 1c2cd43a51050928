package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One named group of operators, each exposed as a (session, sfDir) => DataFrame
  * plus (when SQL-expressible) a DuckDB oracle query over the same parquet
  * tables. SparkEntry merges all packs.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Cross-engine determinism helpers.
  *
  * Floating-point SUM is order-dependent; Spark shuffles partial aggregates in
  * nondeterministic order, so `sum(double)` hash-compares unreliably against a
  * single-threaded DuckDB run. Casting inputs to DECIMAL makes the sum exact
  * (associative), after which one final cast to DOUBLE is deterministic on
  * both engines. Use `dsum`/`davg` for any money/quantity aggregate that must
  * hash-match the oracle; the plain double column stays in the scan so parquet
  * statistics still prune.
  */
object Parity {
  /** Exact sum of a double column: decimal(18,4) inputs, double out. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact sum of a product of two double columns. */
  def dsum2(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 4)) * b.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Order-insensitive average: exact decimal sum, single double division. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(lit(1))

  /** Oracle-side (DuckDB SQL) spellings of the same. */
  def oSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def oSum2(a: String, b: String): String =
    s"CAST(SUM(CAST($a AS DECIMAL(18,4)) * CAST($b AS DECIMAL(18,4))) AS DOUBLE)"
  def oAvg(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
}
