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
      complete: Column => Column = AiFunctions.llm,
      promptTemplate: Option[String] = None): DataFrame =
    questions.withColumn("answer",
      complete(withTemplate(col(questionCol), promptTemplate)))

  /** `prompt_template` participates in the completion prompt (the
    * reference sends it as the system message; the deterministic stand-in
    * prefixes it, so a template change visibly changes the answer —
    * test_agent_new_syntax asserts the template reaches the LLM call). */
  private def withTemplate(prompt: Column, template: Option[String]): Column =
    template.fold(prompt)(t => concat(lit(t), lit(" :: "), prompt))

  /** Retrieval-augmented agent: each distinct question retrieves its
    * top-1 chunk from a linked knowledge base (the k02 scan shape —
    * questions BROADCAST against the chunk store, one window argmin per
    * question) and the completion runs over question + retrieved context.
    * Reference: `CREATE AGENT … USING data = {knowledge_bases: […]}`
    * (agents_controller.py:33-52 check_agent_data / AgentParamsData; the
    * SQL agent mode answers from the linked KBs). Questions with no
    * retrievable context (empty KB) complete with empty context rather
    * than vanishing. */
  /** Text2SQL-skill agent (reference skill type `text2sql`,
    * interfaces/storage/db.py:434; the LLM writes SQL restricted to the
    * skill's database/tables — env-blocked here, so the deterministic
    * stand-in resolves the first allowlisted table named in the question
    * and answers with a real aggregation over it). The per-table profile
    * (one COUNT(*) row each) is computed ONCE and broadcast — the
    * question side never scans the data tables, so this holds at any
    * corpus size: |tables| rows cross the network, not table rows.
    * Questions naming no allowlisted table fall through to the plain
    * completion stub (the reference answers "cannot answer" similarly).
    */
  def answerTextToSql(questions: DataFrame, questionCol: String,
      tables: Seq[(String, DataFrame)],
      complete: Column => Column = AiFunctions.llm,
      promptTemplate: Option[String] = None): DataFrame = {
    val profile = tables.map { case (n, df) =>
      df.groupBy().agg(count(lit(1)).as("__n")).select(lit(n).as("__t"), col("__n"))
    }.reduce(_.union(_))
    // first allowlisted table mentioned in the question, in declared order
    val matched = tables.map(_._1).foldRight(lit(null).cast("string")) {
      (n, rest) => when(lower(col(questionCol)).contains(n.toLowerCase), lit(n)).otherwise(rest)
    }
    questions.withColumn("__t", matched)
      .join(broadcast(profile), Seq("__t"), "left")
      .withColumn("answer",
        when(col("__t").isNotNull,
          concat(col("__t"), lit(" has "), col("__n").cast("string"), lit(" rows")))
        .otherwise(complete(withTemplate(col(questionCol), promptTemplate))))
      .drop("__t", "__n")
  }

  /** One skill of a multi-skill agent, in dispatch order (the reference's
    * `skills` association on an agent, db.py:423/434 — an agent composes
    * several skills and routes each question to the first one capable of
    * answering it). */
  sealed trait AgentSkill
  /** capable when the question names an allowlisted table */
  final case class TextToSqlSkill(tables: Seq[(String, DataFrame)]) extends AgentSkill
  /** capable when the top retrieved chunk's relevance ≥ `minRelevance`
    * AND the chunk is lexically grounded in the question (shares ≥1
    * token of ≥3 chars) — the deterministic stand-in for the reference's
    * reranker relevance gate: retrieval that shares no terms with the
    * question is evidence of nothing and must not outrank later skills */
  final case class KbSkill(chunks: DataFrame, minRelevance: Double = 0.0) extends AgentSkill

  /** ORDERED multi-skill dispatch, first-capable-answers: every skill
    * contributes a nullable candidate-answer column (null = "not
    * capable"), and the final answer is `coalesce(candidates…, plain
    * completion)` — one declarative plan, no per-question driver loop.
    * Each skill keeps its single-skill plan shape (profiles and top-1
    * retrievals broadcast against the question side), so N skills cost N
    * broadcast joins, never N scans of the question table. */
  def answerMultiSkill(questions: DataFrame, questionCol: String,
      skills: Seq[AgentSkill],
      complete: Column => Column = AiFunctions.llm): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var df = questions
    var helperCols = Seq.empty[String]
    val candidates = skills.zipWithIndex.map {
      case (TextToSqlSkill(tables), i) =>
        val profile = tables.map { case (n, d) =>
          d.groupBy().agg(count(lit(1)).as(s"__n_$i")).select(lit(n).as(s"__t_$i"), col(s"__n_$i"))
        }.reduce(_.union(_))
        val matched = tables.map(_._1).foldRight(lit(null).cast("string")) {
          (n, rest) => when(lower(col(questionCol)).contains(n.toLowerCase), lit(n)).otherwise(rest)
        }
        df = df.withColumn(s"__t_$i", matched)
          .join(broadcast(profile), Seq(s"__t_$i"), "left")
        helperCols ++= Seq(s"__t_$i", s"__n_$i")
        when(col(s"__t_$i").isNotNull,
          concat(col(s"__t_$i"), lit(" has "), col(s"__n_$i").cast("string"), lit(" rows")))
      case (KbSkill(chunks, minRel), i) =>
        val qs = questions.select(col(questionCol).as(s"__q_$i")).distinct()
          .withColumn("__qe", graft.kb.Kb.embed(col(s"__q_$i")))
        // two-phase sharded ranking (the k17 shape): no task ever holds
        // the whole chunk corpus for one question
        val scored = chunks.crossJoin(broadcast(qs))
          .withColumn(s"__d_$i", round(lit(1.0) -
            graft.functions.VectorFunctions.cosineSim(col("emb"), col("__qe")), 4))
        val top1 = graft.kb.Kb.shardedTopK(scored, col(s"__q_$i"),
            Seq(col(s"__d_$i"), col("chunk_id")), 1, "__rk", col("chunk_id"))
          .select(col(s"__q_$i"), col("content").as(s"__ctx_$i"),
            round(lit(1.0) / (lit(1.0) + col(s"__d_$i")), 4).as(s"__rel_$i"))
        df = df.join(broadcast(top1), df(questionCol) === col(s"__q_$i"), "left")
        helperCols ++= Seq(s"__q_$i", s"__ctx_$i", s"__rel_$i")
        def toks(c: Column) =
          filter(split(lower(c), "\\W+"), t => length(t) >= 3)
        when(col(s"__rel_$i") >= minRel &&
            arrays_overlap(toks(col(s"__ctx_$i")), toks(col(questionCol))),
          complete(concat(col(questionCol), lit(" ctx: "), col(s"__ctx_$i"))))
    }
    df.withColumn("answer",
        coalesce(candidates :+ complete(col(questionCol)): _*))
      .drop(helperCols: _*)
  }

  def answerWithKb(questions: DataFrame, questionCol: String, chunks: DataFrame,
      complete: Column => Column = AiFunctions.llm,
      promptTemplate: Option[String] = None): DataFrame = {
    val qs = questions.select(col(questionCol).as("__q")).distinct()
      .withColumn("__q_emb", graft.kb.Kb.embed(col("__q")))
    // two-phase sharded ranking (the k17 shape): no task ever holds the
    // whole chunk corpus for one question
    val scored = chunks.crossJoin(broadcast(qs))
      .withColumn("__dist", round(lit(1.0) -
        graft.functions.VectorFunctions.cosineSim(col("emb"), col("__q_emb")), 4))
    val top1 = graft.kb.Kb.shardedTopK(scored, col("__q"),
        Seq(col("__dist"), col("chunk_id")), 1, "__rk", col("chunk_id"))
      .select(col("__q"), col("content").as("__ctx"))
    questions.join(broadcast(top1), questions(questionCol) === col("__q"), "left")
      .withColumn("answer",
        complete(withTemplate(
          concat(col(questionCol), lit(" ctx: "), coalesce(col("__ctx"), lit(""))),
          promptTemplate)))
      .drop("__q", "__ctx")
  }
}
