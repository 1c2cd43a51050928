package graft.queries

import graft.engine.Tables
import graft.multimodal.Multimodal._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pack: binary payloads with header metadata
  * extraction and batched decode. The binary column is synthesized
  * deterministically from doc_id so the oracle can verify that parsing
  * the bytes exactly inverts the synthesis — the parse path reads real
  * bytes; the oracle recomputes the expected values arithmetically.
  */
object MultimodalPack extends QueryPack {

  private def imgs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), synthImage(col("doc_id")).as("img"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // header metadata extracted FROM THE BYTES (format sniff + BE dims)
    "x01_image_meta" -> ((s, dir) => {
      imgs(s, dir)
        .select(col("doc_id"),
          imageFormat(col("img")).as("format"),
          imageWidth(col("img")).as("width"),
          imageHeight(col("img")).as("height"),
          length(col("img")).as("n_bytes"))
        .orderBy(col("doc_id"))
    }),

    // WAV/RIFF audio headers: little-endian PCM fields parsed from the
    // bytes by expressions; the oracle inverts the synthesis
    "x03_audio_meta" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), synthWav(col("doc_id")).as("wav"))
        .select(col("doc_id"),
          audioFormat(col("wav")).as("format"),
          audioChannels(col("wav")).as("channels"),
          audioSampleRate(col("wav")).as("sample_rate"),
          audioBitsPerSample(col("wav")).as("bits"),
          audioDataSize(col("wav")).as("data_size"),
          audioDurationMs(col("wav")).as("duration_ms"),
          length(col("wav")).as("n_bytes"))
        .orderBy(col("doc_id"))
    }),

    // MP4 ftyp container header + frame-sample offsets over the payload
    "x04_video_meta" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), synthMp4(col("doc_id")).as("vid"))
        .select(col("doc_id"),
          videoFormat(col("vid")).as("format"),
          videoBrand(col("vid")).as("brand"),
          videoMinorVersion(col("vid")).as("minor_version"),
          videoBoxSize(col("vid")).as("box_size"),
          size(frameOffsets(col("vid"), 8)).as("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // REAL PNG codec round-trip: each doc's deterministic gray pattern
    // is encoded to an actual PNG by the JDK's javax.imageio, decoded
    // back by the same codec in a second distributed stage, and the
    // DECODED pixels produce exact integer stats (sum + a real 2×2
    // floor-average resize). The oracle recomputes every stat from the
    // pattern formula — so a hash match proves the codec round-trip is
    // lossless end to end.
    "x05_png_roundtrip" -> ((s, dir) => {
      val ids = Tables.table(s, dir, "documents").select(col("doc_id"))
      decodePngStats(encodePngGray(ids, "doc_id"), "doc_id", "png")
        .orderBy(col("doc_id"))
    }),

    // REAL WAV codec round-trip (audio sibling of x05): deterministic
    // 16-bit PCM encoded into actual RIFF/WAVE bytes, decoded back by
    // the JDK's javax.sound codec in a second distributed stage, exact
    // integer energy + zero-crossing stats over the DECODED samples.
    // Hash equality against the closed-form oracle proves the audio
    // codec path is sample-exact end to end.
    "x06_wav_roundtrip" -> ((s, dir) => {
      val ids = Tables.table(s, dir, "documents").select(col("doc_id"))
      decodeWavStats(encodePcmWav(ids, "doc_id"), "doc_id", "wav")
        .orderBy(col("doc_id"))
    }),

    // perceptual near-dup IMAGE dedup: average-hash over the DECODED
    // pixels of real PNGs (8×8 crop thresholded at the integer mean —
    // the classic aHash fingerprint), then dup groups by hash equality.
    // The histogram of group sizes is the image-side analog of d17's
    // cluster-size report; the oracle recomputes every hash closed-form
    // from the pattern, so a match proves decode + hash end to end.
    "x07_image_ahash_dedup" -> ((s, dir) => {
      val ids = Tables.table(s, dir, "documents").select(col("doc_id"))
      decodePngAhash(encodePngGray(ids, "doc_id"), "doc_id", "png")
        .groupBy(col("ahash")).agg(count(lit(1)).as("group_size"))
        .groupBy(col("group_size")).agg(count(lit(1)).as("n_groups"))
        .orderBy(col("group_size"))
    }),

    // video frame-sampling end to end: deterministic multi-frame
    // containers (ftyp header + length-prefixed REAL PNG frames) are
    // assembled distributed, then every 2nd frame is DECODED through
    // the real codec — non-sampled frames skip by offset arithmetic,
    // never decoding (the whole point of sampling at scale). The oracle
    // recomputes every sampled frame's dims + pixel sum closed-form, so
    // a hash match proves container walk + sampling + decode together.
    "x08_video_frame_sample" -> ((s, dir) => {
      val ids = Tables.table(s, dir, "documents")
        .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
      sampleVideoFrames(encodeVideoFrames(ids, "doc_id"), "doc_id", "video",
        every = 2)
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // batched mapPartitions decode + per-format aggregate
    "x02_image_features" -> ((s, dir) => {
      decodeFeatures(imgs(s, dir), "doc_id", "img")
        .groupBy(imageFormat(col("img")).as("format"))
        .agg(count(lit(1)).cast("long").as("n"),
          Parity.davg(col("mean_byte")).as("avg_mean_byte"))
        .select(col("format"), col("n"), round(col("avg_mean_byte"), 4).as("avg_mean_byte"))
        .orderBy(col("format"))
    })
  )

  def oracles: Map[String, String] = Map(

    // synth inversion: png for even ids (sum of magic bytes 425), jpeg
    // for odd (1110); dims from the id arithmetic; 16 header bytes
    "x01_image_meta" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        CAST(16 + doc_id % 64 AS INTEGER) AS width,
        CAST(16 + (doc_id * 7) % 64 AS INTEGER) AS height,
        CAST(16 AS INTEGER) AS n_bytes
      FROM documents ORDER BY doc_id""",

    "x04_video_meta" -> """
      SELECT doc_id, 'mp4' AS format,
        CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        CAST(512 + doc_id % 256 AS BIGINT) AS minor_version,
        CAST(24 AS BIGINT) AS box_size,
        CAST(3 AS INTEGER) AS n_frames
      FROM documents ORDER BY doc_id""",

    "x03_audio_meta" -> """
      WITH f AS (
        SELECT doc_id,
          1 + doc_id % 2 AS channels,
          8000 + (doc_id % 5) * 8000 AS sample_rate,
          8 + (doc_id % 3) * 8 AS bits,
          1000 + doc_id % 1000 AS data_size
        FROM documents)
      SELECT doc_id, 'wav' AS format,
        CAST(channels AS BIGINT) AS channels,
        CAST(sample_rate AS BIGINT) AS sample_rate,
        CAST(bits AS BIGINT) AS bits,
        CAST(data_size AS BIGINT) AS data_size,
        CAST(FLOOR(data_size * 1000.0 / CAST(sample_rate * channels * (bits // 8) AS DOUBLE)) AS BIGINT) AS duration_ms,
        CAST(44 AS INTEGER) AS n_bytes
      FROM f ORDER BY doc_id""",

    // every hash recomputed closed-form from the pattern formula — the
    // Spark side read its pixels from REAL decoded PNGs
    "x07_image_ahash_dedup" -> """
      WITH cells AS (
        SELECT d.doc_id, y.y * 8 + x.x AS pos,
          (d.doc_id * 31 + x.x * 7 + y.y * 13) % 256 AS p
        FROM documents d, (SELECT range AS x FROM range(0, 8)) x,
          (SELECT range AS y FROM range(0, 8)) y),
      m AS (SELECT doc_id, SUM(p) // 64 AS mean FROM cells GROUP BY doc_id),
      bits AS (SELECT c.doc_id,
          string_agg(CASE WHEN c.p > m.mean THEN '1' ELSE '0' END, ''
            ORDER BY c.pos) AS ahash
        FROM cells c JOIN m ON c.doc_id = m.doc_id GROUP BY c.doc_id),
      g AS (SELECT ahash, CAST(COUNT(*) AS BIGINT) AS group_size
        FROM bits GROUP BY ahash)
      SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM g GROUP BY group_size ORDER BY group_size""",

    // closed-form recomputation of the decoded-pixel stats: the Spark
    // side reads them from REAL decoded PNGs, so equality proves the
    // JDK codec round-trip is sample-exact
    // sampled frames only (k % 2 = 0 of 3 + id%4 frames), pattern id
    // fid = doc_id*7 + k*3 — the closed-form contract of
    // Multimodal.framePatternId
    "x08_video_frame_sample" -> """
      WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
      f AS (
        SELECT v.doc_id, k.range AS k, v.doc_id * 7 + k.range * 3 AS fid
        FROM v JOIN (SELECT range FROM range(0, 8)) k
          ON k.range < 3 + v.doc_id % 4 AND k.range % 2 = 0),
      dims AS (
        SELECT doc_id, k, fid,
          8 + 2 * (fid % 5) AS w, 8 + 2 * ((fid * 3) % 5) AS h
        FROM f),
      px AS (
        SELECT d.doc_id, d.k, d.w, d.h,
          (d.fid * 31 + x.x * 7 + y.y * 13) % 256 AS p
        FROM dims d
        JOIN (SELECT range AS x FROM range(0, 16)) x ON x.x < d.w
        JOIN (SELECT range AS y FROM range(0, 16)) y ON y.y < d.h)
      SELECT doc_id, CAST(k AS INTEGER) AS frame_idx,
        CAST(MAX(w) AS INTEGER) AS width, CAST(MAX(h) AS INTEGER) AS height,
        CAST(SUM(p) AS BIGINT) AS sum_px
      FROM px GROUP BY doc_id, k ORDER BY doc_id, frame_idx""",

    "x05_png_roundtrip" -> """
      WITH dims AS (
        SELECT doc_id,
          8 + 2 * (doc_id % 5) AS w,
          8 + 2 * ((doc_id * 3) % 5) AS h
        FROM documents),
      px AS (
        SELECT d.doc_id, (d.doc_id * 31 + x.x * 7 + y.y * 13) % 256 AS p
        FROM dims d
        JOIN (SELECT range AS x FROM range(0, 16)) x ON x.x < d.w
        JOIN (SELECT range AS y FROM range(0, 16)) y ON y.y < d.h),
      blocks AS (
        SELECT d.doc_id,
          (((d.doc_id * 31 + (2*bx.b) * 7 + (2*by.b) * 13) % 256)
           + ((d.doc_id * 31 + (2*bx.b+1) * 7 + (2*by.b) * 13) % 256)
           + ((d.doc_id * 31 + (2*bx.b) * 7 + (2*by.b+1) * 13) % 256)
           + ((d.doc_id * 31 + (2*bx.b+1) * 7 + (2*by.b+1) * 13) % 256)) // 4 AS avg4
        FROM dims d
        JOIN (SELECT range AS b FROM range(0, 8)) bx ON bx.b < d.w // 2
        JOIN (SELECT range AS b FROM range(0, 8)) by ON by.b < d.h // 2)
      SELECT d.doc_id,
        CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
        CAST(s.sum_px AS BIGINT) AS sum_px,
        CAST(d.w // 2 AS INTEGER) AS resized_w, CAST(d.h // 2 AS INTEGER) AS resized_h,
        CAST(b.resized_sum AS BIGINT) AS resized_sum
      FROM dims d
      JOIN (SELECT doc_id, SUM(p) AS sum_px FROM px GROUP BY doc_id) s USING (doc_id)
      JOIN (SELECT doc_id, SUM(avg4) AS resized_sum FROM blocks GROUP BY doc_id) b USING (doc_id)
      ORDER BY doc_id""",

    // closed-form recomputation of the decoded-sample stats; equality
    // proves the javax.sound decode returns the exact PCM we encoded
    "x06_wav_roundtrip" -> """
      WITH d AS (
        SELECT doc_id, doc_id % 7 + 2 AS m, 64 + doc_id % 64 AS n
        FROM documents),
      s AS (
        SELECT d.doc_id, i.range AS i,
          ((((i.range * d.m) % 199) - 99) * 256) AS v
        FROM d JOIN (SELECT range FROM range(0, 128)) i ON i.range < d.n),
      w AS (
        SELECT doc_id, v,
          lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM s)
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_samples,
        CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq,
        CAST(SUM(CASE WHEN prev IS NOT NULL AND ((prev < 0) <> (v < 0))
                 THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
      FROM w GROUP BY doc_id ORDER BY doc_id""",

    "x02_image_features" -> s"""
      WITH feats AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
          (CASE WHEN doc_id % 2 = 0 THEN 425 ELSE 1110 END
            + (16 + doc_id % 64) + (16 + (doc_id * 7) % 64)) / 16.0 AS mean_byte
        FROM documents)
      SELECT format, COUNT(*) AS n,
        ROUND(${Parity.oAvg("mean_byte")}, 4) AS avg_mean_byte
      FROM feats GROUP BY format ORDER BY format"""
  )
}
