package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + merge-invariance of the TopKPairs aggregate
  * (functions/TopK.scala): the result must not depend on partitioning —
  * the partial buffers serialize through the shuffle and merge
  * associatively, so 1, 3, and 32 input partitions must agree bit-for-bit
  * with a single-threaded reference.
  */
class TopKSpec extends AnyFunSuite {

  lazy val spark = graft.engine.Session.build("topk-spec")

  test("top-5 per group under (key DESC, payload ASC); invariant across partitionings") {
    import spark.implicits._
    val data = (1 to 1000).map(i => (((i * 37) % 101).toLong, i % 7, i.toLong))
    val ref = data.groupBy(_._2).map { case (g, rows) =>
      g -> rows.map(r => (r._1, r._3)).sortBy { case (k, p) => (-k, p) }.take(5)
    }
    for (parts <- Seq(1, 3, 32)) {
      val got = data.toDF("k", "g", "p").repartition(parts)
        .groupBy($"g")
        .agg(graft.functions.TopK.topk($"k", $"p", 5).as("top"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[Row](1).map(x => (x.getLong(0), x.getLong(1))).toList)
        .toMap
      assert(got == ref, s"partitioning $parts diverged from reference")
    }
  }

  test("topk_pairs on the SQL surface matches the Column API aggregate") {
    import spark.implicits._
    graft.functions.AiFunctions.register(spark)
    val df = (1 to 100).map(i => (((i * 13) % 37).toLong, i % 3, i.toLong))
      .toDF("k", "g", "p")
    df.createOrReplaceTempView("tk_spec")
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getInt(0) ->
        r.getSeq[Row](1).map(x => (x.getLong(0), x.getLong(1))).toList).toMap
    val viaSql = shape(spark.sql(
      "SELECT g, topk_pairs(k, p, 2) AS top FROM tk_spec GROUP BY g").collect())
    val viaApi = shape(df.groupBy($"g")
      .agg(graft.functions.TopK.topk($"k", $"p", 2).as("top")).collect())
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("null keys/payloads are skipped; k larger than the group returns the whole group") {
    import spark.implicits._
    val df = Seq(
      (Some(5L), 1, Some(10L)), (None, 1, Some(11L)),
      (Some(7L), 1, None), (Some(3L), 1, Some(12L))).toDF("k", "g", "p")
    val got = df.groupBy($"g")
      .agg(graft.functions.TopK.topk($"k", $"p", 10).as("top"))
      .collect().head.getSeq[Row](1).map(x => (x.getLong(0), x.getLong(1)))
    assert(got == Seq((5L, 10L), (3L, 12L)))
  }
}
