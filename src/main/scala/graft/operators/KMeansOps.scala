package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
                  centroids: Seq[(Int, Array[Float])]): DataFrame =
    assignCells(emb, idCol, vecCol, centroidsDf(emb.sparkSession, centroids))

  /** DataFrame-shaped assignment: `centroids` is any small
    * (cell, center ARRAY<DOUBLE>) relation — a literal table on round 1,
    * the PREVIOUS round's computed means afterwards. The frame is
    * broadcast, so when it is itself a k·dim aggregation over the corpus
    * (the iterate path) Spark materializes it as a broadcast-build job —
    * the corpus never re-partitions and nothing ever reaches the driver.
    */
  def assignCells(emb: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame): DataFrame = {
    val scored = emb.select(col(idCol), col(vecCol).as("_v"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", Similarity.cosine(col("_v"), col("center")))
    // localGroups: each corpus row's k scored copies are contiguous in
    // its partition (broadcast cross join) — no exchange, single pass
    TopK.perGroupNative(scored, Seq(idCol), "csim", Seq("cell"), 1,
        localGroups = true)
      .select(col(idCol), col("_v"), col("cell"))
  }

  /** Frozen float centroids, widened to the (cell, center ARRAY<DOUBLE>)
    * broadcast shape. Float→double widening is exact, so assignment
    * against the widened table is bit-identical to the float path. */
  def centroidsDf(spark: SparkSession,
                  centroids: Seq[(Int, Array[Float])]): DataFrame = {
    import spark.implicits._
    centroids.map { case (i, a) => (i, a.map(_.toDouble)) }
      .toDF("cell", "center")
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
                centroids: Seq[(Int, Array[Float])]): DataFrame =
    lloydStep(emb, idCol, vecCol, centroidsDf(emb.sparkSession, centroids))

  /** DataFrame-centroid Lloyd step — the body of [[lloydIterate]].
    *
    * Overflow bound: the per-(cell,pos) BIGINT sum holds while
    * |members| · 2³⁰ · max|x| < 2⁶³, i.e. ~8.6e9 members per cell at
    * unit-scale components — far above any occupancy the cellsFor /
    * trainCentroidsHier sizing rules produce (they hold occupancy near a
    * constant target); only a degenerate k≪corpus call approaches it. */
  def lloydStep(emb: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
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

  /** Long-form (cell, pos, c_new) → the (cell, center ARRAY<DOUBLE>)
    * broadcast shape for the next round. k rows; array_sort on the
    * (pos, c_new) structs gives the components a deterministic order.
    * A cell that lost every member simply vanishes — the next
    * assignment ranks over the surviving cells only, both engines
    * agree by construction. */
  def centroidsFromLong(longForm: DataFrame): DataFrame =
    longForm.groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c_new")))),
        s => s.getField("c_new")).as("center"))

  /** `rounds` Lloyd iterations from the given frozen seed, entirely
    * lazy: each round's centroid table is the previous round's k·dim
    * aggregation, re-entering as a broadcast build. No driver action,
    * no collect, no checkpoint — at k·dim ≪ corpus the plan depth grows
    * by a constant per round while every pass over the data stays one
    * scan + one map-side-combined aggregation. Returns the final round
    * in long form (cell, pos, c_new, n). */
  def lloydIterate(emb: DataFrame, idCol: String, vecCol: String,
                   init: Seq[(Int, Array[Float])], rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var cents = centroidsDf(emb.sparkSession, init)
    var longForm = lloydStep(emb, idCol, vecCol, cents)
    var r = 1
    while (r < rounds) {
      cents = centroidsFromLong(longForm)
      longForm = lloydStep(emb, idCol, vecCol, cents)
      r += 1
    }
    longForm
  }
}
