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
  *  - embeddings: replica i rotates the vector dimensions by i — norms
  *    and value distributions are preserved, cross-replica cosine decorrelates.
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
        when(col("rep") === 0, col("embedding")).otherwise(concat(
          slice(col("embedding"), (col("rep") + 1).cast("int"),
            size(col("embedding")) - col("rep").cast("int")),
          slice(col("embedding"), lit(1), col("rep").cast("int")))))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // remaining tables byte-copy (events carries TIMESTAMP(NANOS) that a
    // read-rewrite would coerce)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"),
        java.nio.file.Paths.get(s"$outDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    spark.stop()
  }
}
