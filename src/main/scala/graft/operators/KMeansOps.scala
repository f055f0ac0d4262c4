package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine k-means (Lloyd) steps over an embedding column — the
  * training side of the IVF serving story: [[IvfCentroids]] holds the
  * frozen quantizer, THIS operator is how such a quantizer is (re)fit
  * at corpus scale. One Lloyd iteration = one broadcast-assign pass +
  * one keyed aggregation; no per-iteration driver collect of anything
  * bigger than the k×dim centroid table itself.
  *
  * Determinism discipline: the centroid update is computed in FIXED-
  * POINT — each (float-exact) component is scaled by 2³⁰ and floored to
  * a BIGINT, summed exactly (integer sum = order-independent), and the
  * mean is a SINGLE IEEE division at the end. A double sum would be
  * partition-order dependent and could never hash-match another engine.
  * Same decision class as `ColFns.moneySum`; floor(x·2³⁰) loses < 1e-9
  * per component — noise far below k-means' own convergence tolerance.
  */
object KMeansOps {

  /** Nearest-centroid assignment (max cosine, centroid-id tie-break):
    * (idCol, `_v` vector, cell). Centroids broadcast; the "join" is a
    * crossJoin against k rows, pruned to 1 by the native bounded-heap
    * top-k — identical semantics to the IVF cell assignment
    * (q_ann_ivf's oracle replays it as `row_number() ... crank = 1`).
    */
  def assignCells(emb: DataFrame, idCol: String, vecCol: String,
                  centroids: Seq[(Int, Array[Float])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cdf = broadcast(centroids.toDF("cell", "center"))
    val scored = emb.select(col(idCol), col(vecCol).as("_v"))
      .crossJoin(cdf)
      .withColumn("csim", Similarity.cosine(col("_v"), col("center")))
    TopK.perGroupNative(scored, Seq(idCol), "csim", Seq("cell"), 1)
      .select(col(idCol), col("_v"), col("cell"))
  }

  /** One Lloyd update step: assign every vector to its nearest centroid,
    * then recompute each centroid as the exact per-dimension mean of its
    * members. Returns the updated quantizer in long form:
    * (cell, pos, c_new, n) — k·dim rows, i.e. driver-collectable at any
    * corpus size (the CORPUS never moves; only k×dim aggregates do).
    *
    * Plan: broadcast-assign → posexplode to (cell, pos, component) →
    * fixed-point encode → ONE partial+final agg on (cell, pos). The
    * explode multiplies rows by dim but stays narrow (3 columns) and
    * map-side-combines down to k·dim groups before the shuffle.
    */
  def lloydStep(emb: DataFrame, idCol: String, vecCol: String,
                centroids: Seq[(Int, Array[Float])]): DataFrame = {
    val fp = 1073741824.0 // 2^30
    assignCells(emb, idCol, vecCol, centroids)
      .select(col("cell").cast("long").as("cell"),
        posexplode(col("_v")).as(Seq("pos", "x")))
      .select(col("cell"), col("pos").cast("long").as("pos"),
        floor(col("x").cast("double") * lit(fp)).as("fx"))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .select(col("cell"), col("pos"),
        (col("sfx").cast("double") / (col("n").cast("double") * lit(fp)))
          .as("c_new"),
        col("n"))
  }
}
