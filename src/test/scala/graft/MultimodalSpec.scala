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

  test("real PNG encode→decode round-trips every sample exactly") {
    val ids = spark.range(0, 50).select(col("id"))
    val stats = decodePngStats(encodePngGray(ids, "id"), "id", "png")
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L until 50L).foreach { id =>
      val (w, h) = pngDims(id)
      val expectedSum =
        (for (x <- 0 until w; y <- 0 until h) yield pngPixel(id, x, y).toLong).sum
      val expectedRsum =
        (for (bx <- 0 until w / 2; by <- 0 until h / 2) yield
          (pngPixel(id, 2 * bx, 2 * by) + pngPixel(id, 2 * bx + 1, 2 * by) +
            pngPixel(id, 2 * bx, 2 * by + 1) + pngPixel(id, 2 * bx + 1, 2 * by + 1)).toLong / 4).sum
      val r = stats(id)
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getLong(3) === expectedSum, s"sum_px mismatch for id=$id")
      assert(r.getLong(6) === expectedRsum, s"resized_sum mismatch for id=$id")
    }
  }

  test("PNG bytes are a real PNG file (magic + IHDR), not a synthetic header") {
    val png = encodePngGray(spark.range(7, 8).select(col("id")), "id")
      .collect().head.getAs[Array[Byte]]("png")
    assert(png.take(8).map(_ & 0xFF).map(i => f"$i%02X").mkString === "89504E470D0A1A0A")
    assert(new String(png.slice(12, 16), "US-ASCII") === "IHDR")
    // IHDR carries the real dims big-endian
    val (w, h) = pngDims(7L)
    def be4(off: Int) = (0 until 4).map(i => (png(off + i) & 0xFF) << (8 * (3 - i))).sum
    assert(be4(16) === w && be4(20) === h)
  }

  test("JPEG codec is live too: lossy round-trip stays within tolerance") {
    // JPEG is lossy so it cannot be oracle-gated; assert the JDK codec
    // encodes+decodes with bounded error on a smooth gradient.
    val w = 32; val h = 32
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (x <- 0 until w; y <- 0 until h)
      img.getRaster.setSample(x, y, 0, (x * 4 + y * 3) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(back.getWidth === w && back.getHeight === h)
    val meanErr = (for (x <- 0 until w; y <- 0 until h) yield
      math.abs(back.getRaster.getSample(x, y, 0) - img.getRaster.getSample(x, y, 0))).sum / (w * h).toDouble
    assert(meanErr < 32.0, s"mean abs error $meanErr")
  }
}
