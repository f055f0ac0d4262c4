package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * BINARY columns with typed metadata, processed in partition-sized
  * batches. The Spark-side shape (schema, partitioning, batch iteration)
  * is real and tested; the actual codec calls are STUBBED with a
  * deterministic fake (`fakeDecode`) because no image/audio libraries
  * ship in this environment — swap `decodeStub` for a real codec binding
  * (JNI/JEP/ONNX) without touching the plan shape.
  *
  * Scale notes: payloads stay columnar-compressed at rest and are never
  * collected; `withDecodedMeta` is a per-row projection; `mapMediaBatches`
  * is the mapPartitions pattern for codecs that amortize init (model
  * load, decoder context) across a partition — the Scala analogue of
  * Python's `mapInPandas` batch UDF.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  final case class MediaRow(media_id: Long, payload: Array[Byte], format: String)

  /** Decoded, model-ready features (stub fields). Integral fields are
    * Long so downstream outputs hash against BIGINT oracle columns. */
  final case class MediaFeatures(media_id: Long, byte_len: Long, format: String,
                                 width: Long, height: Long, n_frames: Long)

  /** REAL CODEC GOES HERE. Deterministic fake: dimensions derived from
    * the md5 of the payload bytes — the same 60-bit portable base hash
    * as [[Dedup.portableHash64]] (first 15 hex chars of the digest as an
    * integer), so a DuckDB oracle reproduces width/height/n_frames
    * exactly. A production build replaces this one function with e.g. a
    * libjpeg/ffmpeg binding. */
  private def decodeStub(md: java.security.MessageDigest,
                         payload: Array[Byte], format: String): (Long, Long, Long) = {
    md.reset()
    val d = md.digest(payload)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = h >>> 4 // first 15 hex nibbles = 60 bits, always non-negative
    val w = 64 + h % 1024
    val ht = 64 + (h >> 10) % 1024
    val frames = if (format == "video") 1 + (h >> 20) % 240 else 1L
    (w, ht, frames)
  }

  /** Batch feature extraction: one decoder context per partition,
    * amortized across the batch (the mapInPandas-equivalent shape). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder context, model weights)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, f) = decodeStub(md, r.payload, r.format)
        MediaFeatures(r.media_id, r.payload.length.toLong, r.format, w, h, f)
      }
    }
  }

  /** Frame sampling plumbing: one row per sampled frame index (every
    * `everyN`-th frame, always including frame 0). Runs BEFORE decode so
    * a downstream per-frame decoder touches only the sampled subset —
    * the batch shape a video pipeline needs at scale. */
  def sampleFrames(features: DataFrame, everyN: Int): DataFrame =
    features.select(
      col("media_id"), col("n_frames"),
      explode(sequence(lit(0L), col("n_frames") - 1, lit(everyN.toLong))).as("frame_idx"))

  /** Resize planning (pure column math, no decode): target box fit with
    * aspect preserved; emits the scale factor the real resizer would use. */
  def resizePlan(features: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim.toDouble) / col("width"),
      lit(maxDim.toDouble) / col("height"),
      lit(1.0))
    features.select(
      col("media_id"), col("width"), col("height"),
      scale.as("scale"),
      floor(col("width") * scale).cast("long").as("resized_w"),
      floor(col("height") * scale).cast("long").as("resized_h"))
  }

  /** Column-level metadata pass (no decode): cheap filters a curation
    * pipeline runs BEFORE paying for decode — size caps, format routing,
    * content hashing for exact dedup of payloads. */
  def payloadMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("byte_len"),
      sha2(col(binCol), 256).as("payload_sha256"),
      (ceil(length(col(binCol)) / 256.0)).cast("long").as("n_chunks"))
}
