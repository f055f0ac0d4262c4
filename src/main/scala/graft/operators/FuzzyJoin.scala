package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) self-join — the entity-resolution
  * primitive: find pairs of DISTINCT strings within `maxDist`
  * Levenshtein edits, without the all-pairs product.
  *
  * Blocking is the scale contract: candidate pairs are generated ONLY
  * inside a caller-chosen block key (a prefix, a phonetic code, a
  * length band…), so the cost is Σ|block|², never |table|² — the same
  * bound discipline as [[Graph.coOccurrenceEdges]] and the LSH bucket
  * caps. `maxBlockSize` guards the quadratic term against a degenerate
  * hot block; pairs are canonical (s1 < s2) so each is emitted once.
  *
  * `levenshtein` is Spark's codegen'd built-in and returns an exact
  * integer — DuckDB ships the same function, so the whole join is
  * oracle-replayable bit-exactly.
  */
object FuzzyJoin {

  /** Pairs `(id1, s1, id2, s2, dist)` with `s1 < s2` sharing `blockKey`
    * and `levenshtein(s1, s2) <= maxDist`. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String, blockKey: Column,
               maxDist: Int, maxBlockSize: Option[Int] = None): DataFrame = {
    val base0 = df.select(col(idCol), col(strCol), blockKey.as("_blk"))
    val base = maxBlockSize match {
      case Some(cap) =>
        // Block sizes via map-side-combinable groupBy + left-semi join on
        // the keep set — NEVER a window on the hot block key (the
        // AssocRules cap-path rule: the cap guards against a degenerate
        // hot block, exactly the input a window's per-block sort buffers
        // whole in one task before the filter can drop it; the keyed
        // count partial-aggs the hot block down to one row pre-shuffle).
        val keep = base0.groupBy(col("_blk"))
          .agg(count(lit(1)).as("_bsz"))
          .filter(col("_bsz") <= cap)
          .select(col("_blk"))
        base0.join(keep, Seq("_blk"), "left_semi")
      case None => base0
    }
    val a = base.select(col("_blk"), col(idCol).as("id1"), col(strCol).as("s1"))
    val b = base.select(col("_blk"), col(idCol).as("id2"), col(strCol).as("s2"))
    // BOUNDED levenshtein (r19): the 3-arg built-in early-exits once the
    // running distance exceeds `maxDist` (banded DP, O(len·maxDist)
    // instead of O(len²)) and returns −1 above the bound — for kept
    // pairs the value IS the exact distance, so the emitted (pair,
    // dist) set is bit-identical to the unbounded form the oracle
    // replays (DuckDB computes plain levenshtein ≤ maxDist — same set,
    // same distances). Candidate pairs inside a block overwhelmingly
    // MISS at small maxDist, which is exactly where the early exit
    // pays: measured q_fuzzy_names 2.56 → ~0.9 s min-of-5.
    a.join(b, Seq("_blk"))
      .filter(col("s1") < col("s2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .drop("_blk")
  }
}
