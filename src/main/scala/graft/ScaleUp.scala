package graft

import org.apache.spark.sql.functions._

/** Scale-rehearsal data builder: replicates the sf0.1 corpus tables to a
  * larger synthetic SF for PERFORMANCE rehearsal only (never for oracle
  * correctness — oracles always run on the driver's own testdata).
  *
  * Straight replication would be a dishonest rehearsal: identical text
  * copies make every replica a perfect near-duplicate of its original,
  * exploding pairwise dedup output quadratically in the factor, which no
  * real 10x corpus does. Instead each replica keeps the ORIGINAL
  * internal duplicate structure while decorrelating across replicas:
  *  - documents: replica i tags ~35% of token positions (hash-selected,
  *    deterministic) with a replica suffix — trigram shingle survival
  *    drops to ~27%, far below the tau=0.5 dedup thresholds, while
  *    within-replica text is untouched;
  *  - embeddings: replica i applies a deterministic per-replica sign
  *    pattern (a Rademacher diagonal, hash-selected per dimension) — an
  *    orthogonal transform, so norms and every WITHIN-replica inner
  *    product are preserved exactly, while cross-replica cosine
  *    decorrelates for ANY factor (the earlier dimension-rotation only
  *    worked for factor < dim: slice length went negative past it, and
  *    replica i and i+dim would have been identical copies).
  *
  * Usage: ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    val spark = graft.engine.Session.build("graft-scaleup")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val rep = explode(sequence(lit(0L), lit(factor - 1L))).as("rep")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    docs.select(col("*"), rep)
      .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc)
      .withColumn("text",
        when(col("rep") === 0, col("text")).otherwise(concat_ws(" ",
          transform(split(col("text"), "\\s+"), (t, i) =>
            when(pmod(xxhash64(t, i, col("rep")), lit(100)) < 35,
              concat(t, lit("~"), col("rep"))).otherwise(t)))))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head.getLong(0) + 1
    emb.select(col("*"), rep)
      .withColumn("vec_id", col("vec_id") + col("rep") * maxVec)
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, j) =>
            when(pmod(xxhash64(col("rep"), j), lit(2)) === 1,
              (x * lit(-1.0f)).cast("float")).otherwise(x))))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // events: replica-decorrelated — NEW user ids per replica (sessions,
    // funnels, cohorts scale linearly in users, as a real 10x product
    // would; identical users would instead deepen every per-user window
    // by 10x, which no growing product does), new event ids, timestamps
    // unchanged (the temporal span of the rehearsal window is a property
    // of the window, not the scale). Read through the schema-aware
    // loader so a TIMESTAMP(NANOS) source normalizes once here.
    val ev = graft.engine.Tables.table(spark, srcDir, "events")
    val maxEv = ev.agg(max("event_id")).head.getLong(0) + 1
    val maxUser = ev.agg(max("user_id")).head.getLong(0) + 1
    ev.select(col("*"), rep)
      .withColumn("event_id", col("event_id") + col("rep") * maxEv)
      .withColumn("user_id", col("user_id") + col("rep") * maxUser)
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // TPC-H fact+dim tables: replica-disjoint key offsets, preserving
    // every foreign key (order→lineitem, lineitem→part/supplier,
    // order→customer). Each replica is a disjoint subgraph — node and
    // edge counts scale linearly while per-order basket density stays
    // fixed, which is exactly the g-pack's declared scaling model (part
    // count grows with the data; the co-purchase graph stays sparse).
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    // each offset comes from the DIMENSION's own key space, not the
    // fact side's: TPC-H leaves ~1/3 of customers orderless, so the
    // fact-side max can undershoot the dimension max and overlapping
    // replica ranges would mint duplicate dimension keys (fan-out in
    // every join). Fact FKs are a subset of the dimension range, so the
    // dimension-derived offset preserves every FK too.
    val maxOrder = ord.agg(max("o_orderkey")).head.getLong(0) + 1
    val maxCust = spark.read.parquet(s"$srcDir/customer.parquet")
      .agg(max("c_custkey")).head.getLong(0) + 1
    val maxPart = spark.read.parquet(s"$srcDir/part.parquet")
      .agg(max("p_partkey")).head.getLong(0) + 1
    val maxSupp = spark.read.parquet(s"$srcDir/supplier.parquet")
      .agg(max("s_suppkey")).head.getLong(0) + 1

    ord.select(col("*"), rep)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * maxOrder)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * maxCust)
      .drop("rep").repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    li.select(col("*"), rep)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * maxOrder)
      .withColumn("l_partkey", col("l_partkey") + col("rep") * maxPart)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * maxSupp)
      .drop("rep").repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // replicas must be DISJOINT in every identifying column, not just
    // the key: TPC-H entity names encode the key ('Customer#000000042'),
    // so a replica keeping the source name would collide with its
    // original — name-keyed operators (entity resolution's deletion-
    // neighborhood join, any name groupBy) then measure replica-count
    // fan-out instead of data scaling. Rewrite the name from the
    // OFFSET key, same format.
    def scaleDim(name: String, key: String, maxKey: Long,
        nameCol: Option[(String, String)] = None): Unit = {
      val base = spark.read.parquet(s"$srcDir/$name.parquet")
        .select(col("*"), rep)
        .withColumn(key, col(key) + col("rep") * maxKey)
      val renamed = nameCol.fold(base) { case (c, prefix) =>
        base.withColumn(c, concat(lit(prefix), lpad(col(key), 9, "0")))
      }
      renamed.drop("rep").repartition(8)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    scaleDim("customer", "c_custkey", maxCust, Some(("c_name", "Customer#")))
    scaleDim("supplier", "s_suppkey", maxSupp, Some(("s_name", "Supplier#")))
    scaleDim("part", "p_partkey", maxPart)

    // region/nation are constant-size reference tables at every SF
    Seq("region", "nation").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"),
        java.nio.file.Paths.get(s"$outDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    spark.stop()
  }
}
