package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators live in graft.queries.* packs (each a QueryPack with a
  * DataFrame implementation and, where SQL-expressible, a DuckDB oracle).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(Relational, TextOps, Dedup, Similarity, Events, KbPack, ModelPack, WritesPack,
      FederationPack, CompatPack, MultimodalPack, GraphOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Knowledge-base semantic search — the reference's flagship capability:
    * chunked ingest + deterministic embeddings + relevance-ranked top-k. */
  def entry(spark: SparkSession): DataFrame =
    KbPack.queries("k02_kb_semantic_search")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
