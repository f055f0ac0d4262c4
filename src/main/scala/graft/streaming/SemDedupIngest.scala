package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.SemDedup

/** Streaming face of the semantic ingest family (r14 verdict task 3):
  * a crawl STREAM driven against the standing index — the q_stream_cdc
  * foreachBatch fold applied to dedup. Each micro-batch runs
  * [[SemDedup.dedupIngest]] against the CURRENT standing state
  * (standing wins — the corpus is already curated; min-id within the
  * batch), then the batch's survivors APPEND to the standing store
  * (embeddings + their probed cells under the same frozen quantizer),
  * so a near-dup arriving in a LATER micro-batch loses to an earlier
  * batch's survivor exactly as a re-crawl loses to the historical
  * corpus. Without the fold — per-batch dedup against a frozen
  * standing side only — a near-dup pair straddling two micro-batches
  * would BOTH survive: that's the trap case StreamingSpec pins
  * (stream-folded survivors ≡ the one-shot batch ingest when ids are
  * arrival-monotone, which is the min-id rule's "first wins" reading;
  * with non-monotone ids the fold keeps the EARLIER arrival where the
  * one-shot keeps the smaller id — same cluster, different
  * representative, inherent to any online rule).
  *
  * Scale posture: per-batch cost is the [[SemDedup.dedupIngest]]
  * touched-cell carve-out (standing members of the batch's probed
  * cells only — never a corpus re-assignment), and the standing store
  * grows by survivors only. The store is parquet `batch=<id>`
  * partition directories written in OVERWRITE mode, so a foreachBatch
  * RETRY of the same epoch overwrites its own output instead of
  * double-appending — idempotent replay, the foreachBatch
  * exactly-once discipline (production swaps the store for a
  * transactional table; the fold and the per-batch plan shape are
  * identical). The quantizer stays FROZEN across the stream — the
  * standing-artifact contract; gate a long-running ingest on
  * [[SemDedup.requireFreshQuantizer]] and rebuild via
  * [[SemDedup.probedIndexRebuild]] when the corpus outgrows it.
  */
object SemDedupIngest {

  /** Standing state of a streaming ingest: embeddings and probed cells
    * as parquet partition dirs (`batch=-1` = the seed corpus; `batch=k`
    * = micro-batch k's survivors). Reads list the directory at plan
    * time, so a batch's dedup plan binds to the standing snapshot
    * BEFORE its own append lands — the fold's correctness hinge. */
  final class Store(spark: SparkSession, dir: String,
                    idCol: String, vecCol: String) {
    private val embDir = s"$dir/emb"
    private val cellsDir = s"$dir/cells"

    /** Seed the store with the historical corpus + its probed index
      * (build the index once via [[SemDedup.probedIndexBuild]]). */
    def seed(emb: DataFrame, cells: DataFrame): Unit = {
      emb.select(col(idCol), col(vecCol))
        .write.mode("overwrite").parquet(s"$embDir/batch=-1")
      cells.select(col(idCol), col("cell"), col("rank"))
        .write.mode("overwrite").parquet(s"$cellsDir/batch=-1")
    }

    def standingEmb: DataFrame = spark.read.parquet(embDir).drop("batch")
    def standingCells: DataFrame = spark.read.parquet(cellsDir).drop("batch")

    /** The stream's admitted rows so far: survivor (id, rank-1 cell)
      * across every micro-batch (the seed corpus excluded). */
    def ingested: DataFrame =
      spark.read.parquet(cellsDir).filter(col("batch") >= 0)
        .filter(col("rank") === 1).select(col(idCol), col("cell"))

    private[graft] def writeBatchEmb(batchId: Long, emb: DataFrame): Unit =
      emb.select(col(idCol), col(vecCol))
        .write.mode("overwrite").parquet(s"$embDir/batch=$batchId")

    private[graft] def readBatchEmb(batchId: Long): DataFrame =
      spark.read.parquet(s"$embDir/batch=$batchId")

    private[graft] def readBatchCells(batchId: Long): DataFrame =
      spark.read.parquet(s"$cellsDir/batch=$batchId")

    private[graft] def writeBatchCells(batchId: Long, cells: DataFrame): Unit =
      cells.select(col(idCol), col("cell"), col("rank"))
        .write.mode("overwrite").parquet(s"$cellsDir/batch=$batchId")
  }

  /** The configured writer: `start()` it and feed the (id, vec)
    * stream. Owns its session's Caching entries per batch (released at
    * each batch end — don't interleave other graft operators' cached
    * executions on the same session while an ingest stream is live).
    *
    * `manifest`: the standing quantizer's build-time sizing
    * ([[SemDedup.probedIndexBuild]]). When given, every micro-batch
    * re-checks [[SemDedup.requireFreshQuantizer]] against the CURRENT
    * standing size (one parquet-footer count — metadata, not a scan)
    * BEFORE deduping, so a long-running ingest whose survivors outgrow
    * the frozen quantizer fails the stream LOUDLY at the first stale
    * batch instead of silently compounding per-cell pair work — the
    * continuous-ingest face of the resize lifecycle (rebuild via
    * [[SemDedup.probedIndexRebuild]], re-seed the store, restart). */
  def dedupIngestStream(batches: DataFrame, idCol: String, vecCol: String,
                        threshold: Double,
                        centroids: Seq[(Int, Array[Float])],
                        store: Store,
                        maxCellSize: Option[Int] = None,
                        probes: Int = 2,
                        manifest: Option[SemDedup.QuantizerManifest] = None)
      : DataStreamWriter[Row] =
    batches.writeStream.foreachBatch { (batch: Dataset[Row], id: Long) =>
      try {
        manifest.foreach { m =>
          SemDedup.requireFreshQuantizer(m, store.standingEmb.count())
        }
        val b = batch.toDF()
        // survivors WITH their probed rows (the batch is probed once for
        // the dedup itself — re-assigning survivors for their index rows
        // would be pure waste per batch)
        val survivors = SemDedup.dedupIngestProbed(
          store.standingEmb, store.standingCells, b, idCol, vecCol,
          threshold, centroids, maxCellSize, probes)
        // CELLS write first: this is the action that evaluates the dedup,
        // and its plan reads BOTH standing dirs at their pre-mutation
        // listings (writing into a new batch=<id> subdir of cellsDir is
        // invisible to the same action's own plan-time listing — the
        // established emb-first argument, now on the cells side)
        store.writeBatchCells(id, survivors)
        // embeddings second, derived from the just-written STABLE cell
        // file + the micro-batch source only — no standing read, so the
        // cellsDir mutation above cannot feed back into this plan
        val survIds = store.readBatchCells(id)
          .filter(col("rank") === 1).select(col(idCol))
        store.writeBatchEmb(id, b.join(survIds, Seq(idCol), "left_semi"))
      } finally graft.Caching.release()
    }
}
