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
  * The synthetic-header paths (below) parse bytes with pure
  * expressions; the PNG path is a REAL codec round-trip — the JDK's
  * built-in `javax.imageio` encodes and decodes actual PNG files, no
  * external library needed. Only formats the JDK lacks (video codecs,
  * OCR) remain stubbed at the decode step.
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

  // ------------------------------------------- real PNG codec (JDK ImageIO)

  /** Deterministic grayscale test pattern dims — even and ≤16 so the
    * closed-form oracle can recompute every decoded statistic. */
  def pngDims(id: Long): (Int, Int) =
    (8 + 2 * (id % 5).toInt, 8 + 2 * ((id * 3) % 5).toInt)

  /** pixel(x, y) = (id·31 + x·7 + y·13) mod 256 — the pattern the
    * encoder rasterizes and the oracle recomputes arithmetically. */
  def pngPixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Encode each row's pattern as a REAL PNG through the JDK-native
    * `javax.imageio` codec (no external library). Raster-level sample
    * writes — no colorspace conversion, so 8-bit gray round-trips
    * losslessly. Runs distributed as mapPartitions; output is
    * (id, png: binary). */
  /** Rasterize one id's pattern and encode through the JDK PNG codec —
    * the per-frame primitive shared by still images and video frames. */
  private def renderPng(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pngPixel(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encodePngGray(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("png", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType)).mapPartitions { it =>
      it.map { r => Row(r.getLong(0), renderPng(r.getLong(0))) }
    }(enc)
  }

  // --------------------------------------------- video frame sampling

  /** frames per video (3..6) and the pattern id of frame k — the
    * closed-form contract the oracle recomputes. */
  def frameCount(id: Long): Int = 3 + (id % 4).toInt
  def framePatternId(id: Long, k: Int): Long = id * 7 + k * 3L

  /** Deterministic multi-frame "video": the synthMp4 ftyp header (24
    * bytes) followed by LENGTH-PREFIXED REAL PNG frames. The container
    * is a stand-in (no codec ships in this sandbox) but every byte of
    * plumbing is real: big-endian framing, per-frame codec payloads,
    * distributed assembly. */
  def encodeVideoFrames(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("video", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bos = new java.io.ByteArrayOutputStream()
        def be4(v: Int): Unit = {
          bos.write((v >>> 24) & 0xff); bos.write((v >>> 16) & 0xff)
          bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
        }
        be4(24)
        bos.write("ftyp".getBytes("US-ASCII"))
        bos.write((if (id % 2 == 0) "isom" else "mp42").getBytes("US-ASCII"))
        be4((512 + id % 256).toInt)
        bos.write("iso2avc1".getBytes("US-ASCII"))
        (0 until frameCount(id)).foreach { k =>
          val png = renderPng(framePatternId(id, k))
          be4(png.length)
          bos.write(png)
        }
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** Walk the container and DECODE every `every`-th frame (the classic
    * frame-sampling step a video-training pipeline runs before feature
    * extraction): skip the ftyp header, follow the length prefixes,
    * decode only sampled frames through the real PNG codec, and emit
    * exact integer stats per sampled frame. Runs distributed as
    * mapPartitions — one task never holds more than its own videos; the
    * non-sampled frames are SKIPPED by offset arithmetic, never decoded
    * (at 100 TB that skip is the point of sampling). */
  def sampleVideoFrames(df: DataFrame, idCol: String, videoCol: String,
      every: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sum_px", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType), col(videoCol)).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        def be4(off: Int): Int =
          ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
            ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        var off = be4(0) // header box size
        var k = 0
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (off + 4 <= bytes.length) {
          val len = be4(off); off += 4
          if (k % every == 0) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes, off, len))
            val raster = img.getRaster
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            out += Row(id, k, w, h, sum)
          }
          off += len
          k += 1
        }
        out
      }
    }(enc)
  }

  /** Decode REAL PNG bytes via ImageIO and emit exact integer stats:
    * dims read from the decoded raster, the sample sum, and the sum of a
    * 2×2-block floor-average downsample (a real resize over decoded
    * pixels). All integers → hash-exact against the closed-form oracle. */
  def decodePngStats(df: DataFrame, idCol: String, pngCol: String,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sum_px", LongType),
      StructField("resized_w", IntegerType), StructField("resized_h", IntegerType),
      StructField("resized_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType), col(pngCol)).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val raster = img.getRaster
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          var rsum = 0L
          var by = 0
          while (by < h / 2) {
            var bx = 0
            while (bx < w / 2) {
              val s4 = raster.getSample(2 * bx, 2 * by, 0) +
                raster.getSample(2 * bx + 1, 2 * by, 0) +
                raster.getSample(2 * bx, 2 * by + 1, 0) +
                raster.getSample(2 * bx + 1, 2 * by + 1, 0)
              rsum += s4 / 4
              bx += 1
            }
            by += 1
          }
          Row(r.getLong(0), w, h, sum, w / 2, h / 2, rsum)
        }
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash) over the DECODED pixels — the
    * classic near-duplicate image fingerprint (threshold each cell of a
    * fixed 8×8 crop against the integer mean; equal-hash images are
    * visual duplicates). All-integer so the closed-form oracle
    * reproduces it bit-for-bit; emitted as the 64-char bit string (no
    * 64-bit sign traps, groupable directly). Batched mapPartitions like
    * every decode stage — embarrassingly parallel, no shuffle before
    * the final hash groupBy. */
  def decodePngAhash(df: DataFrame, idCol: String, pngCol: String,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("ahash", StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType), col(pngCol)).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val raster = img.getRaster
          val px = Array.tabulate(8, 8)((y, x) => raster.getSample(x, y, 0))
          val mean = px.flatten.map(_.toLong).sum / 64
          val bits = new StringBuilder(64)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { bits.append(if (px(y)(x) > mean) '1' else '0'); x += 1 }
            y += 1
          }
          Row(r.getLong(0), bits.toString)
        }
      }
    }(enc)
  }

  // ------------------------------------------- real WAV codec (javax.sound)

  /** Deterministic PCM test signal: n = 64 + id%64 sixteen-bit samples,
    * sample(i) = (((i · (id%7 + 2)) mod 199) − 99) · 256 — all integer,
    * so the closed-form oracle recomputes energy and zero crossings. */
  def wavSampleCount(id: Long): Int = 64 + (id % 64).toInt
  def wavSample(id: Long, i: Int): Int = ((((i * (id % 7 + 2)) % 199) - 99) * 256).toInt

  /** Encode each row's PCM pattern as a REAL 16-bit mono 8 kHz WAV
    * (canonical 44-byte RIFF header + little-endian samples). The decode
    * half goes through the JDK's javax.sound codec, not our own header
    * parser — this upgrades x03's header-level audio story to a live
    * codec, the same move x05 made for images. Runs distributed as
    * mapPartitions; output (id, wav: binary). */
  def encodePcmWav(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("wav", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = wavSampleCount(id)
        val dataLen = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
        bb.put("WAVE".getBytes("US-ASCII")); bb.put("fmt ".getBytes("US-ASCII"))
        bb.putInt(16); bb.putShort(1); bb.putShort(1) // PCM, mono
        bb.putInt(8000); bb.putInt(8000 * 2)          // sample rate, byte rate
        bb.putShort(2); bb.putShort(16)               // block align, bits
        bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
        var i = 0
        while (i < n) { bb.putShort(wavSample(id, i).toShort); i += 1 }
        Row(id, bb.array())
      }
    }(enc)
  }

  /** Decode REAL WAV bytes through javax.sound.sampled.AudioSystem (the
    * JDK codec resolves the format and strips the container) and emit
    * exact integer stats over the DECODED samples: count, energy
    * (sum of squares), zero crossings (sign-change count). Integers →
    * hash-exact against the closed-form oracle. */
  def decodeWavStats(df: DataFrame, idCol: String, wavCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("n_samples", LongType),
      StructField("sum_sq", LongType), StructField("zero_cross", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType), col(wavCol)).mapPartitions { it =>
      it.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected decoded format: $fmt")
        val bytes = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var sumSq = 0L; var zc = 0L; var nn = 0L
        var prev = 0; var first = true
        while (bb.remaining() >= 2) {
          val v = bb.getShort.toInt
          sumSq += v.toLong * v
          if (!first && ((prev < 0) != (v < 0))) zc += 1
          prev = v; first = false; nn += 1
        }
        Row(r.getLong(0), nn, sumSq, zc)
      }
    }(enc)
  }

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
