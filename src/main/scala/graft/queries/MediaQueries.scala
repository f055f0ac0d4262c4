package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Multimodal

/** Multimodal plumbing demo over synthetic payloads (the testdata has no
  * real media table, so document text bytes stand in as the opaque
  * BINARY column — the plan shapes are what's being exercised).
  */
object MediaQueries {

  /** The stub codec replayed in DuckDB: the payload is the document
    * text's UTF-8 bytes, so md5(text) = md5(payload); the first 15 hex
    * chars parse to the same 60-bit non-negative hash the Scala stub
    * folds from the digest's leading 7.5 bytes (h >> n ≡ h // 2^n for
    * non-negative h). */
  private val FeaturesCte =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |       (['image', 'audio', 'video'])[doc_id % 3 + 1] AS format,
      |       CAST(64 + hh % 1024 AS BIGINT) AS width,
      |       CAST(64 + (hh // 1024) % 1024 AS BIGINT) AS height,
      |       CAST(CASE WHEN doc_id % 3 + 1 = 3 THEN 1 + (hh // 1048576) % 240 ELSE 1 END AS BIGINT) AS n_frames
      |FROM (SELECT doc_id, text,
      |             CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS hh
      |      FROM documents)""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(

    // Pre-decode metadata pass: size / content-hash / chunking, the
    // cheap columnar stage a pipeline runs before paying for decode.
    "q_media_meta" -> QueryDef(
      (s, dir) => Multimodal.payloadMeta(
        Tables.documents(s, dir).select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload"),
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       sha256(text) AS payload_sha256,
        |       CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
        |FROM documents"""),

    // Batched decode via mapPartitions — oracle-verified: the stub codec
    // derives dimensions from the md5-based 60-bit portable hash of the
    // payload bytes, which DuckDB reproduces exactly (same family as the
    // MinHash/SimHash sketches). The mapPartitions batch shape is
    // unchanged; only the fake dimension derivation is portable.
    "q_media_features" -> QueryDef(
      (s, dir) => features(s, dir),
      s"""WITH h AS ($FeaturesCte)
        |SELECT media_id, byte_len, format, width, height, n_frames FROM h"""),

    // Frame-sampling plumbing over the decoded features: one row per
    // sampled frame index, generated BEFORE any per-frame decode so the
    // expensive stage touches only the sample.
    "q_media_frames" -> QueryDef(
      (s, dir) => Multimodal.sampleFrames(features(s, dir), everyN = 30),
      s"""WITH h AS ($FeaturesCte)
        |SELECT media_id, n_frames,
        |       CAST(unnest(generate_series(0, n_frames - 1, 30)) AS BIGINT) AS frame_idx
        |FROM h"""),

    // Resize planning (pure column math on decoded dims): box-fit scale
    // factors the real resizer would apply.
    "q_media_resize" -> QueryDef(
      (s, dir) => Multimodal.resizePlan(features(s, dir), maxDim = 512),
      s"""WITH h AS ($FeaturesCte),
        |sc AS (SELECT media_id, width, height,
        |              least(CAST(512 AS DOUBLE) / width, CAST(512 AS DOUBLE) / height, CAST(1 AS DOUBLE)) AS scale
        |       FROM h)
        |SELECT media_id, width, height, scale,
        |       CAST(floor(width * scale) AS BIGINT) AS resized_w,
        |       CAST(floor(height * scale) AS BIGINT) AS resized_h
        |FROM sc""")
  )


  private def features(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    val media = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFeatures(media).toDF()
  }
}
