package graft

import graft.queries._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantics tests for every QueryPack entry on sf0.001.
  * Deep value correctness is covered by the DuckDB oracle gate
  * (tools/compare_oracle.py / driver t2); these specs assert structural
  * invariants and cross-operator consistency that the oracle can't see
  * (e.g. LSH recall vs brute force).
  */
class QueryPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("every query runs and yields a non-degenerate result") {
    // genuinely empty on this data; m32: sf0.001 has no orderkey in the
    // test slice (4500, 6000], and an empty test set is zero rows by the
    // oracle-mirrored contract (grouped final agg == the oracle's GROUP BY)
    val allowEmpty = Set("q09_anti_join", "q13_except", "m32_conformal_intervals")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      if (!allowEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("repetition stats match a hand computation") {
    val row = TextOps.queries("t09_repetition_stats")(spark, dir)
      .filter(col("doc_id") === 7).first()
    val text = graft.engine.Tables.table(spark, dir, "documents")
      .filter(col("doc_id") === 7).select("text").first().getString(0)
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val g2 = toks.sliding(2).map(_.mkString(" ")).toSeq
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val topWord = toks.groupBy(identity).values.map(_.size).max
    val top2g = g2.groupBy(identity).values.map(_.size).max
    assert(row.getAs[Int]("n_tokens") === toks.length)
    assert(row.getAs[Int]("n_distinct") === toks.distinct.length)
    assert(row.getAs[Double]("top_word_frac") === r4(topWord.toDouble / toks.length))
    assert(row.getAs[Double]("dup_2gram_frac") === r4(1.0 - g2.distinct.length.toDouble / g2.length))
    assert(row.getAs[Double]("top_2gram_frac") === r4(top2g.toDouble / g2.length))
  }

  test("pii redaction finds exactly the planted email/phone/ip per doc") {
    val out = TextOps.queries("t10_pii_redact")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Int]("n_emails") === 1 &&
      r.getAs[Int]("n_phones") === 1 && r.getAs[Int]("n_ips") === 1))
    // redaction strips every doc-specific PII token: duplicate texts
    // (the corpus has exact dups) collapse to the same fingerprint
    val nTexts = graft.engine.Tables.table(spark, dir, "documents")
      .select("text").distinct().count()
    assert(out.map(_.getAs[String]("redacted_fp")).distinct.length.toLong === nTexts)
  }

  test("sequence packing conserves tokens; bins cover contiguous doc ranges") {
    val bins = TextOps.queries("t11_sequence_packing")(spark, dir)
      .orderBy(col("bin_id")).collect()
    assert(bins.length > 1)
    val totalFromBins = bins.map(_.getAs[Long]("bin_tokens")).sum
    val total = TextOps.queries("t02_token_count")(spark, dir)
      .agg(sum(col("ws_tokens"))).first().getLong(0)
    assert(totalFromBins === total)
    bins.sliding(2).foreach { w =>
      assert(w(1).getAs[Long]("first_doc") === w(0).getAs[Long]("last_doc") + 1)
    }
  }

  test("except is a real set difference (reference executes it as UNION)") {
    val all = spark.range(10).toDF("k")
    val some = spark.range(4).toDF("k")
    val diff = all.except(some).collect().map(_.getLong(0)).sorted
    assert(diff.sameElements(Array(4L, 5L, 6L, 7L, 8L, 9L)))
  }

  test("minhash LSH recovers the high-jaccard pairs found exactly") {
    val exact = Dedup.queries("d01_jaccard_pairs")(spark, dir)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.queries("d02_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus should contain near-duplicate pairs")
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (found ${lsh.size}, exact ${exact.size})")
  }

  test("ann lsh finds planted near-duplicate neighbors") {
    // LSH can only be judged on data that HAS near neighbors: plant 10
    // perturbed copies of base vectors among 200 random ones and require
    // the ANN to surface the planted twin as top-1 for most queries.
    val rnd = new scala.util.Random(123)
    def vec(): Seq[Double] = Seq.fill(64)(rnd.nextGaussian())
    val base = (0 until 10).map(i => (i.toLong, vec()))
    val twins = base.map { case (i, v) =>
      (i + 1000L, v.map(x => x + rnd.nextGaussian() * 0.05))
    }
    val noise = (0 until 200).map(i => (i + 2000L, vec()))
    val e = spark.createDataFrame(base ++ twins ++ noise).toDF("vec_id", "v")
    val ann = Similarity.annTopK(spark, e, col("vec_id") < 10, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hit = (0 until 10).count(i => ann.get(i.toLong).contains(i + 1000L))
    assert(hit >= 8, s"ANN found only $hit/10 planted twins: $ann")
  }

  test("ann lsh on testdata returns candidates for most queries") {
    val ann = Similarity.queries("s04_ann_lsh")(spark, dir)
      .filter(col("rnk") === 1).count()
    assert(ann >= 10, s"ANN returned top-1 for only $ann of 20 queries")
  }

  test("simhash: identical token arrays produce identical fingerprints") {
    import graft.functions.VectorFunctions.simhash64
    val df = spark.createDataFrame(Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "c")), (3L, Seq("x", "y", "z"))
    )).toDF("id", "toks").select(col("id"), simhash64(col("toks")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("cosine similarity expression: orthogonal/parallel sanity") {
    import graft.functions.VectorFunctions.cosineSim
    val df = spark.createDataFrame(Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 1.0), Seq(-1.0, -1.0))
    )).toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)
  }

  test("sessionize: session ids are contiguous from 1 per user") {
    val sess = Events.queries("e02_sessionize")(spark, dir)
    val bad = sess.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"),
        countDistinct("session_id").as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
      .count()
    assert(bad == 0)
  }
}
