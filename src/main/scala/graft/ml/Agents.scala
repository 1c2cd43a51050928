package graft.ml

import graft.functions.AiFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Agents-as-table (SURVEY §1.3; reference
  * interfaces/agents/agents_controller.py:70, executor wiring
  * sql_query.py:150-161): an agent behaves like a predictor whose output
  * is an `answer` column — `SELECT ... FROM questions JOIN agent`
  * completes every question row.
  *
  * The completion function defaults to the deterministic [[AiFunctions.llm]]
  * stub; a real deployment swaps in a batched API client behind the same
  * row-wise contract (the reference calls
  * agents_controller.get_completion per frame,
  * apply_predictor_step.py:36-53).
  */
object Agents {

  /** Apply an agent to a question column: adds `answer`. */
  def answer(questions: DataFrame, questionCol: String,
      complete: Column => Column = AiFunctions.llm): DataFrame =
    questions.withColumn("answer", complete(col(questionCol)))
}
