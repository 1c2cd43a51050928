package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join (builder brief: "salting for skew"; complements
  * AQE's skew-join splitting for the cases AQE can't fix, e.g. a single
  * hot key in a sort-merge join against a mid-sized right side).
  *
  * The big side gets a uniform per-row salt; the small side replicates
  * `saltFactor` times, once per salt value. The join key becomes
  * (key, salt), so one hot key spreads over `saltFactor` reducers. Cost:
  * small side inflates ×saltFactor — use for mid-sized right sides that
  * are too big to broadcast but tolerable to replicate.
  */
object Skew {

  /** Join types whose semantics survive small-side replication: inner and
    * left-ish joins never emit unmatched SMALL-side rows, so the
    * saltFactor copies are invisible. right/full outer would emit each
    * unmatched small-side row once per salt value — rejected. */
  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType " +
        "(right/full outer would replicate unmatched small-side rows per salt)")
    // deterministic per-row salt from the full row content (hashing the
    // key alone would co-locate the hot key again)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
