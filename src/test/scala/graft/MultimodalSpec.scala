package graft

import graft.multimodal.Multimodal._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level invariants of the multimodal plumbing. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("multimodal-spec")

  test("header parse inverts synthesis for every id, both formats") {
    val df = spark.range(0, 500).select(col("id"), synthImage(col("id")).as("img"))
      .select(col("id"),
        imageFormat(col("img")).as("f"),
        imageWidth(col("img")).as("w"),
        imageHeight(col("img")).as("h"))
    val bad = df.filter(
      col("f") =!= when(col("id") % 2 === 0, "png").otherwise("jpeg") ||
        col("w") =!= (lit(16) + col("id") % 64).cast("int") ||
        col("h") =!= (lit(16) + (col("id") * 7) % 64).cast("int"))
    assert(bad.count() === 0)
  }

  test("unknown magic is sniffed as unknown") {
    val df = spark.range(1).select(unhex(lit("0000000000000000DEADBEEF")).as("img"))
    assert(df.select(imageFormat(col("img"))).first().getString(0) === "unknown")
  }

  test("frameOffsets samples every Nth byte offset") {
    val df = spark.range(1).select(unhex(lit("00" * 10)).as("p"))
    val offs = df.select(frameOffsets(col("p"), 4)).first().getSeq[Int](0)
    assert(offs === Seq(0, 4, 8))
  }

  test("decodeFeatures preserves rows and computes the byte mean in batches") {
    val df = spark.range(0, 1000).select(col("id"), synthImage(col("id")).as("img"))
    val out = decodeFeatures(df, "id", "img", batchSize = 64)
    assert(out.count() === 1000)
    // mean over 16 bytes: magic sum + width + height over 16
    val bad = out.filter(
      abs(col("mean_byte") -
        ((when(col("id") % 2 === 0, 425).otherwise(1110) +
          (lit(16) + col("id") % 64) + (lit(16) + (col("id") * 7) % 64)) / 16.0)) > 1e-9)
    assert(bad.count() === 0)
  }
}
