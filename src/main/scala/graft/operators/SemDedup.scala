package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over embedding clusters — the SemDeDup recipe
  * (Abbas et al., arXiv:2303.09540): exact/lexical dedup misses
  * paraphrases and re-renderings, so cluster the EMBEDDING space with a
  * coarse quantizer and look for near-duplicates only WITHIN a cluster.
  * The cluster bound is what makes the O(n²) cosine comparison feasible:
  * pair generation is keyed by cell, so total work is Σ|cell|² instead
  * of |corpus|² — the same bound class as the LSH bucket join
  * ([[Dedup.lshCandidates]]), but in semantic space.
  *
  * Stages (each keyed/distributed, nothing collects):
  *   1. assign: nearest frozen centroid per embedding — the constant
  *      centroid frame broadcasts; argmax cosine plans as the native
  *      bounded-heap top-k (rank-1, cell tie-break), identical to the
  *      q_ann_ivf serving rule.
  *   2. candidates: ids-only self-join on the cell key (id1 < id2
  *      canonical), optional per-cell cap against degenerate clusters.
  *   3. exact cosine on re-attached vectors; pairs ≥ threshold are dup
  *      edges.
  *   4. survivor rule: drop every id that appears as the HIGHER id of a
  *      dup edge (min-id greedy, the [[graft.queries.DedupQueries]]
  *      curation rule) — deterministic, one anti join, no iteration.
  *
  * At 100 TB: centroid count scales with corpus (k ≈ n/target-cell) so
  * cells stay bounded; the frozen-centroid posture means assignment is
  * a map-only broadcast stage, and only the (cell)-keyed pair join
  * shuffles. `maxCellSize` is the honest cap for adversarial mass-
  * duplicate corpora (caps candidate generation, trading recall for a
  * hard cost bound — same contract as lshCandidates' bucket cap).
  */
object SemDedup {

  /** (id, cell): nearest-centroid assignment, the q_ann_ivf cell rule
    * (max cosine, cell tie-break). Map-only: centroids broadcast. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[(Int, Array[Float])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cdf = broadcast(centroids.toDF("cell", "center"))
    val scored = emb.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .crossJoin(cdf)
      .withColumn("csim", Similarity.cosine(col("_v"), col("center")))
    // localGroups: per-corpus-row groups off a broadcast cross join —
    // contiguous in one partition, exchange-free single heap pass
    TopK.perGroupNative(scored, Seq("_id"), "csim", Seq("cell"), 1,
        localGroups = true)
      .select(col("_id").as(idCol), col("cell"))
  }

  private def cap(assigned: DataFrame, idCol: String, maxCellSize: Option[Int]): DataFrame =
    maxCellSize match {
      case Some(n) =>
        // deterministic per-cell cap: keep the n smallest ids (the
        // production guard for degenerate clusters; a no-op when every
        // cell is under the cap, which keeps the oracle exact)
        TopK.perGroupNative(
          assigned.withColumn("negid", -col(idCol)), Seq("cell"), "negid",
          Seq(idCol), n).select(col(idCol), col("cell"))
      case None => assigned
    }

  private def edgesOf(emb: DataFrame, assigned: DataFrame, idCol: String,
                      vecCol: String, threshold: Double): DataFrame = {
    val left = assigned.select(col("cell"), col(idCol).as("id1"))
    val right = assigned.select(col("cell"), col(idCol).as("id2"))
    val cand = left.join(right, Seq("cell")).filter(col("id1") < col("id2"))
    val vecs = emb.select(col(idCol), col(vecCol))
    cand
      .join(vecs.select(col(idCol).as("id1"), col(vecCol).as("v1")), Seq("id1"))
      .join(vecs.select(col(idCol).as("id2"), col(vecCol).as("v2")), Seq("id2"))
      .withColumn("cos_sim", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id1"), col("id2"), col("cell"), col("cos_sim"))
  }

  /** Dup edges: (id1, id2, cell, cos_sim) with id1 < id2, cosine ≥
    * threshold, both ids assigned to `cell`. */
  def dupEdges(emb: DataFrame, idCol: String, vecCol: String,
               threshold: Double,
               centroids: Seq[(Int, Array[Float])] = IvfCentroids.cells,
               maxCellSize: Option[Int] = None): DataFrame =
    edgesOf(emb, cap(assign(emb, idCol, vecCol, centroids), idCol, maxCellSize),
      idCol, vecCol, threshold)

  /** Surviving rows of `emb` after semantic dedup: every id that is the
    * higher end of a ≥-threshold intra-cell pair is dropped. Output is
    * (id, cell) — the kept corpus with its cluster assignment. The
    * assignment is Caching-tracked: BOTH the dup-edge branch and the
    * surviving anti-join consume it, and without the cache each branch
    * re-runs the corpus scan AND the broadcast-cosine argmax (the
    * expensive stage) — the Q15 shared-view lesson. Released by the
    * action runner (Verify/Bench/session), so nothing outlives the
    * query. */
  def dedup(emb: DataFrame, idCol: String, vecCol: String,
            threshold: Double,
            centroids: Seq[(Int, Array[Float])] = IvfCentroids.cells,
            maxCellSize: Option[Int] = None): DataFrame = {
    val assigned = graft.Caching.persistTracked(
      assign(emb, idCol, vecCol, centroids))
    val losers = edgesOf(emb, cap(assigned, idCol, maxCellSize),
      idCol, vecCol, threshold)
      .select(col("id2").as(idCol)).distinct()
    assigned.join(losers, Seq(idCol), "left_anti")
  }
}
