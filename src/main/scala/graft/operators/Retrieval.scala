package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — the serving-side composition of
  * the engine's two ranking families (keyword BM25, dense ANN top-k).
  *
  * Reciprocal-Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * rrf(d) = Σ_lists 1/(k + rank_list(d)) over the lists that retrieved
  * d. Rank-based and scale-free, so BM25's unbounded scores and
  * cosine's [−1, 1] fuse without score calibration — the reason RRF is
  * the default hybrid in production RAG stacks.
  *
  * Scale posture: inputs are per-query top-k lists, so the fusion join
  * is keyed by (query keys…, doc id) and each key group holds ≤ #lists
  * rows — embarrassingly parallel across queries, no global state; at
  * one query the whole fusion is ≤ Σ k rows. Determinism: 1/(k + rank)
  * is a single IEEE division of exact integers and the cross-list sum
  * folds in FIXED list order, so the fused score is bit-portable
  * (oracle-provable) — never a float sum over a variable row order.
  */
object Retrieval {

  /** Fuse ranked lists by RRF. Every input carries `keyCols` plus a
    * positive integral `rankCol` (1-based, ties already broken — each
    * list must be a total order; a duplicated (keys, rank) row would
    * silently double-count, so callers rank with row_number, never
    * rank(); `assertTotalOrder = true` makes that contract loud: each
    * list pays one window count over its keys — cheap on per-query
    * top-k inputs — and a key appearing twice in one list
    * raise_errors instead of fanning out the full-outer join).
    * NULL-keyed rows are DROPPED per list (the family-wide NULL-id
    * contract, samplePps/splitByHash: a NULL key can never equi-match
    * in the using-join, so keeping such rows would silently pass each
    * list's NULL rows through as separate fused rows — a third silent
    * fate; ranked lists have non-NULL keys by construction, so the
    * filter is a no-op on healthy inputs). Output: `keyCols`, one
    * `rank_i` column per input list in argument order (−1 where list
    * i did not retrieve the id — kept integral rather than NULL for
    * the driver's dtype-sensitive compare; real ranks are ≥ 1), and
    * `rrf_score`.
    */
  def rrfFuse(rankings: Seq[DataFrame], keyCols: Seq[String],
              rankCol: String, k: Int = 60,
              assertTotalOrder: Boolean = false): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k >= 1, s"rrfFuse: smoothing constant k must be >= 1 (got $k)")
    val named = rankings.zipWithIndex.map { case (r, i) =>
      val base = r
        // NULL-key drop (family contract — see scaladoc): applied before
        // the rank gate so a NULL-keyed row is dropped, not raised on
        .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
        .select(keyCols.map(col) :+ col(rankCol).cast("long").as(s"rank_$i"): _*)
        // a rank < 1 (or NULL) would silently skew 1/(k+rank) — the
        // raise_error-filter pattern: free when the contract holds,
        // loud when it doesn't (NULL comparison falls to the error arm)
        .filter(when(col(s"rank_$i") >= 1L, lit(true))
          .otherwise(raise_error(concat(
            lit(s"rrfFuse: ranks must be >= 1 (list $i got "),
            // a NULL rank would null the whole concat and raise a
            // message-less error — coalesce keeps the diagnosis
            coalesce(col(s"rank_$i").cast("string"), lit("NULL")),
            lit(")"))).cast("boolean")))
      if (!assertTotalOrder) base
      else {
        // opt-in tie detection: rank() ties duplicate a key WITHIN one
        // list; the window is keyed by the list's own keys, so on a
        // top-k-per-query input each group is ≤ k rows
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
        base.withColumn("_kn", count(lit(1)).over(w))
          .filter(when(col("_kn") === 1L, lit(true))
            .otherwise(raise_error(concat(
              lit(s"rrfFuse: list $i is not a total order — key ("),
              concat_ws(",", keyCols.map(col(_).cast("string")): _*),
              lit(") appears "), col("_kn").cast("string"),
              lit(" times (rank with row_number, not rank())")))
              .cast("boolean")))
          .drop("_kn")
      }
    }
    // using-column joins coalesce the keys; full outer keeps ids any
    // one list retrieved
    val joined = named.reduce((a, b) => a.join(b, keyCols, "full_outer"))
    val score = rankings.indices
      .map(i => when(col(s"rank_$i").isNull, lit(0.0))
        .otherwise(lit(1.0) / (lit(k.toLong) + col(s"rank_$i")).cast("double")))
      .reduceLeft(_ + _)
    joined.select(
      keyCols.map(col) ++
        rankings.indices.map(i => coalesce(col(s"rank_$i"), lit(-1L)).as(s"rank_$i")) :+
        score.as("rrf_score"): _*)
  }
}
