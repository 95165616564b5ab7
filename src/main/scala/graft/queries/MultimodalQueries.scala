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

    // feature extraction: batch-shaped partition kernel (stubbed decode) —
    // engine-side by design, so rows-only; determinism is spec-tested.
    "q_mm_features" -> Q(
      t => {
        val feat = Multimodal.extractFeatures(withMedia(t.documents), "doc_id", "media")
        feat.select(
          col("doc_id"),
          size(col("features")).as("dim"),
          round(aggregate(transform(col("features"), _.cast("double")),
            lit(0.0), (acc, x) => acc + x), 4).as("mass"))
          .orderBy(col("doc_id"), col("dim"), col("mass"))
      },
      None))
}
