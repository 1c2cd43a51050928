package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history builder — the dimension-
  * versioning verb a warehouse DML surface needs next to MERGE
  * (Kimball's SCD2; the reference's writeback story stops at plain
  * INSERT/UPDATE). From an observed change stream, produce one row per
  * RUN of equal attribute values per key: `valid_from` = first
  * observation of the run, `valid_to` = start of the next run (null
  * while current), plus an `is_current` flag.
  *
  * Scale shape: both passes are windows PARTITIONED BY the dimension
  * key — one shuffle on the key, per-key task state is a single lag/lead
  * row, never a global or unpartitioned window. Consecutive equal states
  * collapse (a re-observed unchanged attribute does not open a version),
  * which is what bounds history size by change count, not observation
  * count — the property that matters when the change stream is 100 TB of
  * events but dimensions change rarely.
  */
object Scd {

  /** @param changes observation stream (key, ts, tie, attrs…)
    * @param tie     deterministic order within equal timestamps
    * @param attrs   tracked attribute columns; a version opens when ANY
    *                of them differs from the previous observation */
  def history(changes: DataFrame, key: Column, ts: Column, tie: Column,
      attrs: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    val state = struct(attrs: _*)
    val runs = changes
      .withColumn("__prev", lag(state, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= state)
      .select(key.as("key") +: attrs :+ ts.as("valid_from") :+ tie.as("__tie"): _*)
    val w2 = Window.partitionBy(col("key")).orderBy(col("valid_from"), col("__tie"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__tie")
  }
}
