package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Multimodal

/** Multimodal plumbing demo over synthetic payloads (the testdata has no
  * real media table, so document text bytes stand in as the opaque
  * BINARY column — the plan shapes are what's being exercised).
  */
object MediaQueries {

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

    // Batched decode via mapPartitions (stubbed codec) — rows-only.
    "q_media_features" -> QueryDef.unverified(
      (s, dir) => features(s, dir)),

    // Frame-sampling plumbing over the decoded features: one row per
    // sampled frame index, generated BEFORE any per-frame decode so the
    // expensive stage touches only the sample — rows-only (derives from
    // the stub codec).
    "q_media_frames" -> QueryDef.unverified(
      (s, dir) => Multimodal.sampleFrames(features(s, dir), everyN = 30)),

    // Resize planning (pure column math on decoded dims): box-fit scale
    // factors the real resizer would apply — rows-only (stub dims).
    "q_media_resize" -> QueryDef.unverified(
      (s, dir) => Multimodal.resizePlan(features(s, dir), maxDim = 512))
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
