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

  test("stored-sketch union == direct estimate, bit-for-bit (incl. overlaps)") {
    import spark.implicits._
    // three OVERLAPPING daily batches (each user active on two days)
    val days = Seq(
      (1 to 400).map(("d1", _)),
      (200 to 600).map(("d2", _)),
      (400 to 800).map(("d3", _))).flatten
    val direct = days.toDF("day", "v")
      .agg(graft.functions.Hll.hllEstimate($"v")).first().getDouble(0)
    // sketch per day → write → read back → union the STORED registers
    val tmp = java.nio.file.Files.createTempDirectory("hll_spec").toString
    days.toDF("day", "v").groupBy($"day")
      .agg(graft.functions.Hll.hllRegisters($"v").as("sk"))
      .write.mode("overwrite").parquet(tmp)
    val viaStore = spark.read.parquet(tmp)
      .agg(graft.functions.Hll.hllUnionEstimate($"sk")).first().getDouble(0)
    assert(direct == viaStore,
      s"stored-union $viaStore != direct $direct — overlap double-counted or registers corrupted")
  }

  test("SQL surface matches the Column API for all three hll functions") {
    import spark.implicits._
    graft.functions.AiFunctions.register(spark)
    val df = (1 to 3000).map(i => (i % 4, i * 17)).toDF("g", "v")
    df.createOrReplaceTempView("hll_sql_spec")
    val sql = spark.sql(
      "SELECT g, hll_estimate(v) AS e FROM hll_sql_spec GROUP BY g")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val api = df.groupBy($"g").agg(graft.functions.Hll.hllEstimate($"v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(sql == api, "SQL-registered hll_estimate diverged from the Column API")
    // sketch → union through SQL: shard-level sketches re-unioned per
    // group must equal the direct per-group estimate
    val unioned = spark.sql(
      """SELECT g, hll_union_estimate(sk) AS u
         FROM (SELECT g, hll_registers(v) AS sk
               FROM hll_sql_spec GROUP BY g, v % 10)
         GROUP BY g""")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(unioned == api,
      "SQL hll_union_estimate over sharded hll_registers diverged from the direct estimate")
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
