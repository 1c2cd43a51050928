package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics + merge-invariance of the HllSketch aggregate
  * (functions/Hll.scala): register buffers must merge associatively, so
  * any partitioning of the input yields the bit-identical estimate; the
  * estimate must track exact distinct counts; and the plan must be a
  * partial-aggregating ObjectHashAggregate, never a distinct expansion.
  */
class HllSpec extends AnyFunSuite {

  lazy val spark = graft.engine.Session.build("hll-spec")

  test("estimate is invariant across partitionings (mergeable registers)") {
    import spark.implicits._
    val data = (1 to 20000).map(i => (i % 7, (i * 31) % 5000))
    val ests = Seq(1, 3, 32).map { parts =>
      data.toDF("g", "v").repartition(parts)
        .groupBy($"g")
        .agg(graft.functions.Hll.hllEstimate($"v").as("est"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    }
    assert(ests(0) == ests(1) && ests(1) == ests(2),
      s"estimates changed with partitioning: $ests")
  }

  test("estimate tracks exact distinct within 3 sigma at m=1024") {
    import spark.implicits._
    // HLL standard error at m=1024 is 1.04/sqrt(1024) = 3.25%; assert
    // the 3-sigma envelope (~10%) — a fixed dataset is ONE draw, and
    // this suite observed a legitimate 2-sigma draw at n=10000
    for (n <- Seq(100, 1000, 10000)) {
      val est = (1 to n).map(i => i * 1000003L).toDF("v")
        .agg(graft.functions.Hll.hllEstimate($"v")).first().getDouble(0)
      assert(math.abs(est / n - 1.0) < 0.0975, s"n=$n est=$est off by >3 sigma")
    }
  }

  test("duplicates do not move the estimate; nulls are skipped") {
    import spark.implicits._
    val once = (1 to 500).map(i => Some(i)).toDF("v")
      .agg(graft.functions.Hll.hllEstimate($"v")).first().getDouble(0)
    val dups = ((1 to 500) ++ (1 to 500) ++ (1 to 500)).map(Some(_))
      .toDF("v").agg(graft.functions.Hll.hllEstimate($"v")).first().getDouble(0)
    val withNulls = ((1 to 500).map(Some(_)) ++ Seq.fill(200)(None))
      .toDF("v").agg(graft.functions.Hll.hllEstimate($"v")).first().getDouble(0)
    assert(once == dups, "re-inserting values moved the registers")
    assert(once == withNulls, "nulls reached the registers")
  }

  test("plans as a partial ObjectHashAggregate, no distinct expansion") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 3, i)).toDF("g", "v")
      .groupBy($"g").agg(graft.functions.Hll.hllEstimate($"v").as("est"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"not object-hash:\n$plan")
    assert(plan.contains("partial_"), s"no map-side combine:\n$plan")
    assert(!plan.contains("Expand"), s"distinct-style Expand appeared:\n$plan")
  }
}
