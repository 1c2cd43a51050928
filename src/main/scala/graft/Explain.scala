package graft

import graft.engine.Session

/** Plan-audit utility: print the executed plan of one or more named
  * queries (default sf0.001). Usage:
  *   sbt "runMain graft.Explain s04_ann_lsh [q01_pricing_summary ...]"
  * Prints exchange counts and the formatted plan — the review loop for
  * "is this the plan you'd want at 100 TB".
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Session.build("graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // materialize so AQE finalizes (codegen markers appear)
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      val nEx = "Exchange".r.findAllIn(plan).length
      // codegen stages appear as "*(n)" prefixes in the final plan
      val nCodegen = """\*\((\d+)\)""".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(s"==== $name  exchanges=$nEx codegen_stages=$nCodegen ====")
      df.explain("formatted")
    }
    spark.stop()
  }
}
