package graft.incremental

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent `LAST`-keyword watermark store (SURVEY §2.11; reference
  * interfaces/query_context/context_controller.py:293-344, 440-471 +
  * LastQuery in query_context/last_query.py).
  *
  * Reference semantics, reproduced exactly:
  *  - first sight of a query: LAST initializes to the CURRENT MAX of the
  *    tracked column (`_get_init_last_values`) — the first run returns
  *    no rows and later runs return only what arrived since;
  *  - subsequent runs substitute the stored value into `ts > LAST`;
  *  - after execution, a result callback advances the watermark to the
  *    max value seen in the results (`_result_callback`).
  *
  * State is one tiny JSON map (query id → epoch micros) rewritten
  * atomically; only a scalar crosses the driver per run — the filter
  * itself is a pushed-down scan predicate, so at 100 TB an incremental
  * run reads only the parquet row groups past the watermark.
  */
final class Watermarks(dir: String) {
  Files.createDirectories(Paths.get(dir))
  private val file = Paths.get(dir, "watermarks.json")

  private def load(): Map[String, Long] =
    if (!Files.exists(file)) Map.empty
    else Files.readString(file).split("[,{}]").toSeq
      .map(_.trim).filter(_.contains(":"))
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
      }.toMap

  private def save(m: Map[String, Long]): Unit = {
    val tmp = Paths.get(dir, "watermarks.json.tmp")
    Files.writeString(tmp,
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}"))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def get(queryId: String): Option[Long] = load().get(queryId)
  def set(queryId: String, micros: Long): Unit = save(load() + (queryId -> micros))

  /** The stored watermark is one Long; timestamps track as epoch micros,
    * numeric columns as their Long value (the reference tracks either —
    * its test_last_coalesce uses an int column). */
  private def keyExpr(df: DataFrame, tsCol: String) =
    df.schema.find(_.name == tsCol).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) =>
        unix_micros(col(tsCol))
      case Some(_) => col(tsCol).cast(org.apache.spark.sql.types.LongType)
      case None => unix_micros(col(tsCol)) // dotted/qualified: assume ts
    }

  /** Apply `tsCol > LAST` to a frame. First sight initializes the
    * watermark to the frame's current max and yields the empty increment
    * (reference init semantics); later calls filter past the stored
    * value. Call [[advance]] with the result after a successful run. */
  def applyLast(df: DataFrame, tsCol: String, queryId: String): DataFrame =
    get(queryId) match {
      case Some(wm) => df.filter(keyExpr(df, tsCol) > wm)
      case None =>
        val mx = df.agg(max(keyExpr(df, tsCol))).first()
        if (!mx.isNullAt(0)) set(queryId, mx.getLong(0))
        df.filter(lit(false))
    }

  /** `tsCol > COALESCE(LAST, <default>)` (context_controller.py's
    * coalesce override, proven by the reference's test_last_coalesce):
    * first sight filters past the GIVEN default instead of swallowing
    * history — the caller supplies the default-filtered frame — and the
    * result callback advances the watermark as usual. */
  def applyLastDefault(df: DataFrame, tsCol: String, queryId: String,
      firstRun: DataFrame => DataFrame): DataFrame =
    get(queryId) match {
      case Some(wm) => df.filter(keyExpr(df, tsCol) > wm)
      case None => firstRun(df)
    }

  /** Advance the watermark from a run's results (result callback,
    * context_controller.py:440-471). No-op on an empty increment. */
  def advance(results: DataFrame, tsCol: String, queryId: String): Unit = {
    val mx = results.agg(max(keyExpr(results, tsCol))).first()
    if (!mx.isNullAt(0)) {
      val v = mx.getLong(0)
      if (get(queryId).forall(_ < v)) set(queryId, v)
    }
  }
}
