package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing under the oracle gate: binary media columns derived
  * from `documents` (with planted PNG/JPEG magic prefixes so format
  * sniffing has all branches live), typed metadata, and the batch-shaped
  * feature-extraction stub (rows-only — the kernel is engine-side code by
  * design).
  */
object MultimodalQueries extends Catalog {

  /** documents → media binary: text bytes, with container magics planted on
    * a third of the rows (doc_id%3==0 → PNG, %3==1 → JPEG).
    */
  private def withMedia(df: org.apache.spark.sql.DataFrame) = {
    val png = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    val jpeg = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)
    df.withColumn("media",
      when(col("doc_id") % 3 === 0, concat(lit(png), encode(col("text"), "utf-8")))
        .when(col("doc_id") % 3 === 1, concat(lit(jpeg), encode(col("text"), "utf-8")))
        .otherwise(encode(col("text"), "utf-8")))
  }

  def queries: Map[String, Q] = Map(
    "q_mm_metadata" -> Q(
      t => Multimodal.withMetadata(withMedia(t.documents), "media")
        .select(
          col("doc_id"),
          col("media_meta.format").as("format"),
          col("media_meta.n_bytes").as("n_bytes"),
          // DuckDB's sha256 can't take BLOB, so the oracle-checked hash is
          // over the hex encoding (media_meta.sha256 stays raw-byte, spec'd)
          sha2(hex(col("media")), 256).as("sha"))
        .orderBy(col("doc_id"), col("format"), col("n_bytes"), col("sha")),
      Some("""WITH m AS (
              |  SELECT doc_id,
              |         CASE WHEN doc_id % 3 = 0 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
              |              WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
              |              ELSE encode(text) END AS media
              |  FROM documents)
              |SELECT doc_id,
              |       CASE WHEN substring(hex(media), 1, 8) = '89504E47' THEN 'png'
              |            WHEN substring(hex(media), 1, 6) = 'FFD8FF' THEN 'jpeg'
              |            WHEN substring(hex(media), 1, 8) = '52494646' THEN 'riff'
              |            ELSE 'unknown' END AS format,
              |       CAST(octet_length(media) AS BIGINT) AS n_bytes,
              |       sha256(hex(media)) AS sha
              |FROM m
              |ORDER BY doc_id NULLS FIRST, format NULLS FIRST,
              |         n_bytes NULLS FIRST, sha NULLS FIRST""".stripMargin)),

    // WAV header metadata through pure Column arithmetic (le16/le32 reads +
    // magic checks — fully codegen'd; no kernel, no codec library): the
    // RIFF branch the sniffer routes gains a REAL metadata extract (sample
    // decode stays stubbed; header parsing is public-spec byte layout, not
    // a codec). Genuine canonical PCM containers are built with
    // doc_id-derived parameters through the byte-layout encoder; the oracle
    // replays the parameter formulas, so a parser that misreads any
    // little-endian field fails the exact compare.
    "q_mm_wav" -> Q(
      t => {
        val mkWav = udf((id: Long) => Multimodal.WavCodec.encode(
          channels = (1 + id % 2).toInt,
          sampleRate = (8000 * (1 + id % 3)).toInt,
          bitsPerSample = if (id % 5 == 0) 8 else 16,
          nFrames = (id % 25).toInt))
        t.documents.select(col("doc_id"), mkWav(col("doc_id")).as("media"))
          .select(col("doc_id"),
            Multimodal.sniffFormat(col("media")).as("format"),
            Multimodal.wavHeader(col("media")).as("w"))
          .select(col("doc_id"), col("format"),
            col("w.channels").as("channels"),
            col("w.sample_rate").as("sample_rate"),
            col("w.bits_per_sample").as("bits_per_sample"),
            col("w.n_frames").as("n_frames"),
            col("w.duration_ms").as("duration_ms"))
          .orderBy(col("doc_id"), col("format"), col("channels"),
            col("sample_rate"), col("bits_per_sample"), col("n_frames"),
            col("duration_ms"))
      },
      Some("""SELECT doc_id, 'riff' AS format,
              |       CAST(1 + doc_id % 2 AS INTEGER) AS channels,
              |       CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
              |       CAST(CASE WHEN doc_id % 5 = 0 THEN 8 ELSE 16 END AS INTEGER) AS bits_per_sample,
              |       CAST(doc_id % 25 AS BIGINT) AS n_frames,
              |       CAST((doc_id % 25) * 1000 // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms
              |FROM documents
              |ORDER BY doc_id NULLS FIRST, format NULLS FIRST, channels NULLS FIRST,
              |         sample_rate NULLS FIRST, bits_per_sample NULLS FIRST,
              |         n_frames NULLS FIRST, duration_ms NULLS FIRST""".stripMargin)),

    // REAL image decode through javax.imageio (r8 verdict task 4): the
    // planted-magic payloads above are sniffable but not decodable, so this
    // query first builds genuine PNG/JPEG containers — dimensions derived
    // from doc_id, flat doc_id-derived color — through the JDK encoder,
    // then recovers width/height/channels with the JDK DECODER via the
    // batch-shaped decodeDims kernel. The oracle replays only the dims
    // formula; the encode→decode round trip over real codec bytes happens
    // entirely engine-side, so a decoder returning anything but the true
    // dimensions (or a router mis-sniffing the real magic bytes) fails the
    // exact compare.
    "q_mm_dims" -> Q(
      t => {
        val mkImage = udf((id: Long) => Multimodal.ImageIoDecode.encode(
          if (id % 2 == 0) "png" else "jpeg",
          (1 + id % 7).toInt, (1 + id % 5).toInt,
          ((id * 2654435761L) & 0xffffffL).toInt))
        val m = t.documents.select(col("doc_id"), mkImage(col("doc_id")).as("media"))
          .localCheckpoint(true) // encode once; feeds both sniff and decode
        Multimodal.decodeDims(m, "doc_id", "media")
          .join(m.select(col("doc_id"),
            Multimodal.sniffFormat(col("media")).as("format")), "doc_id")
          .select(col("doc_id"), col("format"),
            col("width"), col("height"), col("channels"))
          .orderBy(col("doc_id"), col("format"), col("width"), col("height"),
            col("channels"))
      },
      Some("""SELECT doc_id,
              |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
              |       CAST(1 + doc_id % 7 AS INTEGER) AS width,
              |       CAST(1 + doc_id % 5 AS INTEGER) AS height,
              |       CAST(3 AS INTEGER) AS channels
              |FROM documents
              |ORDER BY doc_id NULLS FIRST, format NULLS FIRST, width NULLS FIRST,
              |         height NULLS FIRST, channels NULLS FIRST""".stripMargin)),

    // REAL perceptual hash under the exact oracle gate: genuine two-tone
    // 16×16 PNGs (left/right halves in doc_id-derived colors) built by the
    // JDK encoder, decoded by the JDK decoder, hashed by the exact-integer
    // aHash kernel (Multimodal.ImageIoDecode.aHash64). PNG is lossless, so
    // the decoded pixels ARE the constructed ones, and the hash collapses
    // analytically: every left cell's mean is grayL, every right cell's is
    // grayR, the global mean is their midpoint — so the hash is the low
    // nibbles (0x0F0F…) when grayL > grayR, the high nibbles (0xF0F0…)
    // when grayR > grayL, and 0 on gray ties. The oracle replays only that
    // closed form from the color formulas; encode→decode→pixel-walk happens
    // entirely engine-side, so a decoder/layout/bit-order defect fails the
    // exact compare. (JPEG is lossy and stays out of the oracle path; the
    // spec covers it with a uniform image, whose hash must be 0 under any
    // DC-preserving codec.)
    "q_mm_phash" -> Q(
      t => {
        val mkImage = udf((id: Long) => Multimodal.ImageIoDecode.encodeHalves(
          "png", 16, 16,
          ((id * 2654435761L) & 0xffffffL).toInt,
          ((id * 1099087573L + 2654435761L) & 0xffffffL).toInt))
        val m = t.documents.select(col("doc_id"), mkImage(col("doc_id")).as("media"))
        Multimodal.perceptualHash(m, "doc_id", "media")
          .orderBy(col("doc_id"), col("phash"))
      },
      Some("""WITH c AS (
              |  SELECT doc_id,
              |         (doc_id * 2654435761) % 16777216 AS rgb_l,
              |         (doc_id * 1099087573 + 2654435761) % 16777216 AS rgb_r
              |  FROM documents
              |), g AS (
              |  SELECT doc_id,
              |         299 * ((rgb_l // 65536) % 256) + 587 * ((rgb_l // 256) % 256)
              |           + 114 * (rgb_l % 256) AS gray_l,
              |         299 * ((rgb_r // 65536) % 256) + 587 * ((rgb_r // 256) % 256)
              |           + 114 * (rgb_r % 256) AS gray_r
              |  FROM c
              |)
              |SELECT doc_id,
              |       CASE WHEN gray_l > gray_r THEN CAST(1085102592571150095 AS BIGINT)
              |            WHEN gray_r > gray_l THEN CAST(-1085102592571150096 AS BIGINT)
              |            ELSE CAST(0 AS BIGINT) END AS phash
              |FROM g
              |ORDER BY doc_id NULLS FIRST, phash NULLS FIRST""".stripMargin)),

    // Frame sampling (Multimodal.sampleBytes): n evenly-spaced single
    // bytes per payload — the video keyframe-sampling shape with byte
    // offsets standing in for frame seeks. Pure Column arithmetic (one
    // position formula + substring per sample), fully codegen'd, map-side
    // only. The oracle rebuilds the identical BLOB and re-reads each
    // sampled byte from its hex dump at the replayed offset, so an
    // off-by-one in the spacing formula or a substring misread fails the
    // exact compare. Positions use floor(i·(len−1)/(n−1)) — endpoints
    // always included, spacing IEEE-identical on both engines.
    "q_mm_frame_sample" -> Q(
      t => withMedia(t.documents)
        .select(col("doc_id"),
          posexplode(Multimodal.sampleBytes(col("media"), 5))
            .as(Seq("frame_idx", "byte_val")))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("byte_val").cast("long").as("byte_val"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH m AS (
              |  SELECT doc_id,
              |         CASE WHEN doc_id % 3 = 0 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
              |              WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
              |              ELSE encode(text) END AS media
              |  FROM documents
              |), s AS (
              |  SELECT doc_id, media, octet_length(media) AS len FROM m
              |)
              |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
              |       CAST(('0x' || substr(hex(media),
              |              2 * CAST(floor(i * (len - 1) / 4) AS INTEGER) + 1, 2))
              |            AS BIGINT) AS byte_val
              |FROM s, range(0, 5) r(i)
              |ORDER BY doc_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin)),

    // Feature extraction through the batch-shaped partition kernel
    // (Multimodal.extractFeatures over the FakeDecode stub — a 16-bin
    // normalized byte histogram). The oracle replays the kernel EXACTLY in
    // integer space: bin(byte) = byte div 16 = the byte's high hex nibble,
    // so per-bin COUNTS are countable from hex(media) positions 1,3,5,…;
    // the Spark side recovers the same integers from the normalized floats
    // as round(h·n_bytes) (error ≤ n_bytes·2⁻²⁴ ≪ ½, so recovery is exact).
    // Integer bins hash identically across engines — no float replay risk —
    // and pin the whole kernel (batching, zip-back, normalization), not
    // just row counts: a shifted bin, a dropped byte, or a misaligned batch
    // all change some count.
    "q_mm_features" -> Q(
      t => {
        val m = withMedia(t.documents).select(col("doc_id"), col("media"))
        val feat = Multimodal.extractFeatures(m, "doc_id", "media")
        feat
          .join(m.select(col("doc_id"),
            octet_length(col("media")).cast("long").as("n_bytes")), "doc_id")
          .select(
            col("doc_id"),
            size(col("features")).as("dim"),
            concat_ws(",", transform(col("features"),
              h => org.apache.spark.sql.functions
                .round(h.cast("double") * col("n_bytes"))
                .cast("long").cast("string")))
              .as("bins"))
          .orderBy(col("doc_id"), col("dim"), col("bins"))
      },
      Some("""WITH m AS (
              |  SELECT doc_id,
              |         CASE WHEN doc_id % 3 = 0 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
              |              WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
              |              ELSE encode(text) END AS media
              |  FROM documents
              |), h AS (
              |  SELECT doc_id, hex(media) AS hx,
              |         CAST(octet_length(media) AS BIGINT) AS n
              |  FROM m
              |)
              |SELECT doc_id, CAST(16 AS INTEGER) AS dim,
              |       array_to_string(list_transform(range(0, 16), i ->
              |         CAST(len(list_filter(range(1, n + 1), p ->
              |           substring(hx, CAST(2*p-1 AS INTEGER), 1)
              |             = substring('0123456789ABCDEF', CAST(i+1 AS INTEGER), 1)))
              |           AS VARCHAR)), ',') AS bins
              |FROM h
              |ORDER BY doc_id NULLS FIRST, dim NULLS FIRST, bins NULLS FIRST""".stripMargin)))
}
