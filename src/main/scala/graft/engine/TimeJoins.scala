package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel joins the reference expresses through its time-series
  * planner (SURVEY §2.9; reference planner/plan_join.py builds per-group
  * "latest row at or before t" context the same way) and that plain Spark
  * lacks as built-ins: the as-of join and the point-in-interval (range)
  * join.
  *
  * Both are written to survive 100 TB:
  *
  *   - `asofBackward` never builds the range cross-product. Both sides are
  *     tagged and unioned, shuffled ONCE on the equi-keys, and the match is
  *     a carry-forward window (`last(_, ignoreNulls)`) whose state is O(1)
  *     per row. A naive `l.ts >= r.ts` theta join is quadratic per key;
  *     this is n log n for the sort and nothing else.
  *
  *   - `pointInInterval` replaces the non-equi containment predicate with
  *     an equi-join on (keys, coarse time bucket): each interval explodes
  *     to the few buckets it overlaps, each point lands in exactly ONE
  *     bucket, so every qualifying pair materializes exactly once and no
  *     dedup pass is needed. Join fan-out is bounded by
  *     ceil(intervalLength/bucketWidth)+1 per interval row instead of the
  *     full per-key cross product a range predicate would force through
  *     BroadcastNestedLoopJoin.
  */
object TimeJoins {

  /** Left as-of-backward join: for each left row, the single latest right
    * row with `right(rightTime) <= left(leftTime)` and equal `keys`.
    * Ties on rightTime are broken by the ascending `tieBreak` columns
    * (largest wins), which must make right rows unique per (keys, time).
    * Right payload columns are exposed under `rightPrefix`; left rows with
    * no prior right row keep NULLs (left-join semantics).
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String],
      rightPrefix: String): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq

    // one frame, two sides: side=0 rows carry the right payload forward,
    // side=1 rows read it. At equal time, side=0 sorts first (<=) and the
    // tie-break columns sort ascending so the carried value is the winner.
    val rightTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__side")) ++
          payload.map(c => col(c).as(s"__r_$c")) ++
          leftCols.filterNot(keys.contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__side")) ++
          payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) ++
          leftCols.filterNot(keys.contains).map(col): _*)

    val order: Seq[Column] = col("__t") +: col("__side") +:
      tieBreak.map(c => col(s"__r_$c"))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightTagged.unionByName(leftTagged)
      .select(
        col("*") +:
          payload.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__c_$c")): _*)

    carried
      .filter(col("__side") === 1)
      .select(
        leftCols.map(col) ++
          payload.map(c => col(s"__c_$c").as(s"$rightPrefix$c")): _*)
  }

  /** Point-in-interval equi-banded join: pairs every `points` row with
    * every `intervals` row sharing `keys` whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`. Timestamps are
    * banded at `bucketSeconds` granularity; only (keys, bucket) matches
    * are ever shuffled together. Returns the pair frame (interval columns
    * first, point payload under `pointPrefix`).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketSeconds: Long,
      pointPrefix: String): DataFrame = {
    val micros = bucketSeconds * 1000000L
    val p = points.select(
      keys.map(col) ++
        points.columns.filterNot(keys.contains).map(c => col(c).as(s"$pointPrefix$c")): _*)
      .withColumn("__bucket", floor(unix_micros(col(s"$pointPrefix$pointCol")) / micros))
    val iv = intervals
      .withColumn("__bucket", explode(sequence(
        floor(unix_micros(col(startCol)) / micros),
        floor(unix_micros(col(endCol)) / micros))))
    iv.join(p, keys :+ "__bucket")
      .filter(col(s"$pointPrefix$pointCol").between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
