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
  *  - documents: replica i REPLACES ~50% of token positions
  *    (hash-selected, deterministic per (token, position, replica)) with
  *    a replica-hashed token. Replacement, not suffix-tagging: the round-6
  *    tagging decorrelated SHINGLES (trigram survival ~27%, MinHash-safe)
  *    but not SIMHASH — a tagged token still hashes near its original's
  *    feature set, hamming stayed ≤16/64, and every doc sat in a
  *    factor-sized cross-replica band cluster, so band-proposed candidate
  *    pairs grew quadratically in the factor (measured: d11's verify
  *    went from 4.8 s at sf0.1 to >20 min per pass at factor 100 — a
  *    corpus artifact; no real 100x corpus multiplies per-doc duplicate
  *    cardinality by the growth factor). Replacing the token with an
  *    unrelated hash word flips the feature itself: expected simhash
  *    hamming rises to ~24-32/64, P(any 16-bit band unchanged) collapses,
  *    and shingle survival drops below tagging's (0.5^3 = 12.5%).
  *    Within-replica dup structure is preserved: the replacement is a
  *    pure function of (token, position, replica), so two documents that
  *    were duplicates inside a replica stay duplicates;
  *  - embeddings: replica i applies a deterministic per-replica sign
  *    pattern (a Rademacher diagonal, hash-selected per dimension) — an
  *    orthogonal transform, so norms and every WITHIN-replica inner
  *    product are preserved exactly, while cross-replica cosine
  *    decorrelates for ANY factor (the earlier dimension-rotation only
  *    worked for factor < dim: slice length went negative past it, and
  *    replica i and i+dim would have been identical copies).
  *
  * Usage: ScaleUp <srcSfDir> <outDir> <factor> [tables]
  * `tables` (optional, comma-separated) rebuilds only the named tables —
  * corpus-definition iterations shouldn't pay for re-replicating the
  * 60M-row fact tables they don't touch.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (srcDir, outDir, factorS) = (args(0), args(1), args(2))
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    val factor = factorS.toInt
    val spark = graft.engine.Session.build("graft-scaleup")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val rep = explode(sequence(lit(0L), lit(factor - 1L))).as("rep")

    if (wanted("documents")) {
      val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
      docs.select(col("*"), rep)
        .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc)
        .withColumn("text",
          when(col("rep") === 0, col("text")).otherwise(concat_ws(" ",
            transform(split(col("text"), "\\s+"), (t, i) =>
              when(pmod(xxhash64(t, i, col("rep")), lit(100)) < 50,
                lower(substring(hex(xxhash64(t, i, col("rep"), lit(7))), 1, 6)))
                .otherwise(t)))))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }

    if (wanted("embeddings")) {
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
    }

    // events: replica-decorrelated — NEW user ids per replica (sessions,
    // funnels, cohorts scale linearly in users, as a real 10x product
    // would; identical users would instead deepen every per-user window
    // by 10x, which no growing product does), new event ids, timestamps
    // unchanged (the temporal span of the rehearsal window is a property
    // of the window, not the scale). Read through the schema-aware
    // loader so a TIMESTAMP(NANOS) source normalizes once here.
    if (wanted("events")) {
      val ev = graft.engine.Tables.table(spark, srcDir, "events")
      val maxEv = ev.agg(max("event_id")).head.getLong(0) + 1
      val maxUser = ev.agg(max("user_id")).head.getLong(0) + 1
      ev.select(col("*"), rep)
        .withColumn("event_id", col("event_id") + col("rep") * maxEv)
        .withColumn("user_id", col("user_id") + col("rep") * maxUser)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    // TPC-H fact+dim tables: replica-disjoint key offsets, preserving
    // every foreign key (order→lineitem, lineitem→part/supplier,
    // order→customer). Each replica is a disjoint subgraph — node and
    // edge counts scale linearly while per-order basket density stays
    // fixed, which is exactly the g-pack's declared scaling model (part
    // count grows with the data; the co-purchase graph stays sparse).
    // each offset comes from the DIMENSION's own key space, not the
    // fact side's: TPC-H leaves ~1/3 of customers orderless, so the
    // fact-side max can undershoot the dimension max and overlapping
    // replica ranges would mint duplicate dimension keys (fan-out in
    // every join). Fact FKs are a subset of the dimension range, so the
    // dimension-derived offset preserves every FK too.
    // All lazy: a selective `tables` rebuild must not scan (or require
    // the presence of) the TPC-H files it was told to skip.
    lazy val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    lazy val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    lazy val maxOrder = ord.agg(max("o_orderkey")).head.getLong(0) + 1
    lazy val maxCust = spark.read.parquet(s"$srcDir/customer.parquet")
      .agg(max("c_custkey")).head.getLong(0) + 1
    lazy val maxPart = spark.read.parquet(s"$srcDir/part.parquet")
      .agg(max("p_partkey")).head.getLong(0) + 1
    lazy val maxSupp = spark.read.parquet(s"$srcDir/supplier.parquet")
      .agg(max("s_suppkey")).head.getLong(0) + 1

    if (wanted("orders")) ord.select(col("*"), rep)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * maxOrder)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * maxCust)
      .drop("rep").repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    if (wanted("lineitem")) li.select(col("*"), rep)
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
    def scaleDim(name: String, key: String, maxKey: => Long,
        nameCol: Option[(String, String)] = None): Unit = {
      if (!wanted(name)) return
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
    Seq("region", "nation").filter(wanted).foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"),
        java.nio.file.Paths.get(s"$outDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    spark.stop()
  }
}
