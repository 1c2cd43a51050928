package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images/audio/video ride as opaque `binary`
  * columns with typed metadata extracted by expressions, and heavy
  * decode work runs as batched `mapPartitions` (the Scala analog of
  * `mapInPandas`). The reference has no multimodal pipeline — this is
  * the training-data-scale capability the north star adds; the file
  * plumbing mirrors its file-reader dispatch
  * (integrations/utilities/files/file_reader.py:85-223).
  *
  * Real codec libraries are not present in this environment, so the
  * DECODE step is a deterministic stub over the real byte plumbing:
  * schema, batching, and partitioning are production-shaped; the pixel
  * math is a placeholder a codec drop-in replaces.
  *
  * Header parsing is pure built-in expressions (substring/hex/conv on
  * binary) — codegen'd, no UDF, no custom Expression needed.
  */
object Multimodal {

  val PngMagic = "89504E470D0A1A0A"
  val JpegMagic = "FFD8FFE000104A46"

  /** Deterministic 16-byte fake image: 8-byte magic + 4-byte big-endian
    * width + 4-byte big-endian height, derived from a numeric id. Even
    * ids are png, odd jpeg; dims in [16, 80). */
  def synthImage(id: Column): Column = {
    val magic = when(id % 2 === 0, unhex(lit(PngMagic))).otherwise(unhex(lit(JpegMagic)))
    val width = lit(16) + id % 64
    val height = lit(16) + (id * 7) % 64
    def be4(v: Column): Column = unhex(lpad(hex(v), 8, "0"))
    concat(magic, be4(width), be4(height))
  }

  /** Magic-byte sniff (the binary analog of FormatDetector). */
  def imageFormat(img: Column): Column =
    when(hex(substring(img, 1, 8)) === PngMagic, "png")
      .when(hex(substring(img, 1, 4)) === "FFD8FFE0", "jpeg")
      .otherwise("unknown")

  /** Big-endian u32 at byte offset 9 / 13 — header dims. */
  def imageWidth(img: Column): Column =
    conv(hex(substring(img, 9, 4)), 16, 10).cast(IntegerType)
  def imageHeight(img: Column): Column =
    conv(hex(substring(img, 13, 4)), 16, 10).cast(IntegerType)

  // ------------------------------------------------------------- audio

  /** little-endian integer encode/decode as pure expressions — WAV/RIFF
    * headers are LE where image headers are BE. */
  private def le(v: Column, n: Int): Column =
    concat((0 until n).map { i =>
      unhex(lpad(hex(shiftright(v.cast(LongType), 8 * i) % 256), 2, "0"))
    }: _*)
  private def leInt(b: Column, off: Int, n: Int): Column =
    (0 until n).map { i =>
      conv(hex(substring(b, off + i, 1)), 16, 10).cast(LongType) * (1L << (8 * i))
    }.reduce(_ + _)

  /** Deterministic 44-byte canonical WAV header derived from a numeric
    * id: RIFF/WAVE/fmt/data chunks with PCM fields (channels 1-2, rate
    * 8-40 kHz, 8/16/24 bit, data size 1000-1999). */
  def synthWav(id: Column): Column = {
    val channels = (lit(1) + id % 2).cast(LongType)
    val rate = (lit(8000) + (id % 5) * 8000).cast(LongType)
    val bits = (lit(8) + (id % 3) * 8).cast(LongType)
    val dataSize = (lit(1000) + id % 1000).cast(LongType)
    val byteRate = rate * channels * (bits / 8).cast(LongType)
    val blockAlign = channels * (bits / 8).cast(LongType)
    concat(
      unhex(lit("52494646")), le(lit(36L) + dataSize, 4), // "RIFF" + size
      unhex(lit("57415645")), // "WAVE"
      unhex(lit("666D7420")), le(lit(16L), 4), le(lit(1L), 2), // "fmt ", PCM
      le(channels, 2), le(rate, 4), le(byteRate, 4),
      le(blockAlign, 2), le(bits, 2),
      unhex(lit("64617461")), le(dataSize, 4)) // "data" + size
  }

  /** RIFF/WAVE magic sniff + PCM header fields at their canonical
    * offsets; duration = data bytes / byte rate. All codegen'd
    * expressions over the binary column — no UDF. */
  def audioFormat(b: Column): Column =
    when(hex(substring(b, 1, 4)) === "52494646" &&
      hex(substring(b, 9, 4)) === "57415645", "wav").otherwise("unknown")
  def audioChannels(b: Column): Column = leInt(b, 23, 2)
  def audioSampleRate(b: Column): Column = leInt(b, 25, 4)
  def audioBitsPerSample(b: Column): Column = leInt(b, 35, 2)
  def audioDataSize(b: Column): Column = leInt(b, 41, 4)
  /** duration in whole milliseconds (floor) — rational durations land
    * exactly on round-half boundaries where engines disagree; floor of a
    * correctly-rounded division is engine-stable. */
  def audioDurationMs(b: Column): Column =
    floor(audioDataSize(b).cast(DoubleType) * 1000.0 / leInt(b, 29, 4).cast(DoubleType))
      .cast(LongType)

  // ------------------------------------------------------------- video

  /** Deterministic MP4 `ftyp` box (big-endian size + brand + minor
    * version + one compatible brand) — the container header a video
    * column leads with. Even ids get brand isom, odd mp42. */
  def synthMp4(id: Column): Column = {
    def be4(v: Column): Column = unhex(lpad(hex(v), 8, "0"))
    val brand = when(id % 2 === 0, lit("isom")).otherwise(lit("mp42"))
    concat(
      be4(lit(24)), // box size: 8 header + 4 brand + 4 minor + 8 compat
      lit("ftyp").cast(BinaryType),
      brand.cast(BinaryType),
      be4(lit(512) + id % 256),
      lit("iso2avc1").cast(BinaryType))
  }

  def videoFormat(b: Column): Column =
    when(substring(b, 5, 4).cast(StringType) === "ftyp", "mp4").otherwise("unknown")
  def videoBrand(b: Column): Column = substring(b, 9, 4).cast(StringType)
  def videoMinorVersion(b: Column): Column =
    conv(hex(substring(b, 13, 4)), 16, 10).cast(LongType)
  def videoBoxSize(b: Column): Column =
    conv(hex(substring(b, 1, 4)), 16, 10).cast(LongType)

  /** Frame-sample offsets for a binary payload: every `frameSize`-th
    * byte offset (audio/video sampling plumbing; pure expression). */
  def frameOffsets(payload: Column, frameSize: Int): Column =
    sequence(lit(0), greatest(length(payload) - 1, lit(0)), lit(frameSize))

  /** Batched decode stub: per image, "decode" = mean byte value of the
    * payload (a codec would emit real features here). Runs as
    * mapPartitions over batches — the production shape for model-based
    * image featurization. Input frame needs (idCol: long, imgCol:
    * binary); output adds `mean_byte: double`. */
  def decodeFeatures(df: DataFrame, idCol: String, imgCol: String,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("mean_byte", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val in = df.select(col(idCol).cast(LongType), col(imgCol))
    val decoded = in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          var s = 0L
          var i = 0
          while (i < bytes.length) { s += bytes(i) & 0xFF; i += 1 }
          Row(r.getLong(0), if (bytes.isEmpty) 0.0 else s.toDouble / bytes.length)
        }
      }
    }(enc)
    df.join(decoded, Seq(idCol))
  }
}
