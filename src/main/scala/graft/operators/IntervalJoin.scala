package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed interval self-join: pairs of rows with the same key whose
  * timestamps are within `windowUs`, (strictly) ordered by a total
  * (ts, id) tie-break so each unordered pair appears exactly once.
  *
  * Why not a plain key-equality self-join + range filter: that plan
  * evaluates the range predicate on |key group|² combinations, so one
  * bot-grade hot key with d events across months costs d² work even
  * when almost nothing is within the window. Bucketing time at the
  * window width and joining on (key, bucket) bounds the product to
  * pairs of ADJACENT buckets: work scales with Σ_b d_b·(d_b + d_b₊₁) —
  * the same order as the genuine candidate count — instead of
  * (Σ_b d_b)². A pair within `windowUs` spans at most one bucket
  * boundary, so emitting the left row into its own and the next bucket
  * finds every pair exactly once (no post-join dedup needed).
  */
object IntervalJoin {

  /** @param df       input with (keyCol, idCol, tsCol) — tsCol is an
    *                 integral epoch value in the same unit as windowUs;
    *                 any sign (bucketing is true floor division, so
    *                 negative epochs land in the right bucket too)
    * @param windowUs max ts2 − ts1 for a pair (inclusive); also the
    *                 bucket width
    *
    * NULL handling (SQL-join semantics, unlike [[AsOfJoin]]'s window
    * grouping): a NULL key or NULL ts never equality-joins, so such
    * rows silently appear in NO pair — pre-filter or fill if they
    * should participate. windowUs is capped well under Long.Max/2 so
    * the non-negative-remainder bucketing and the `ts1 + window` upper
    * bound cannot overflow (ANSI mode would throw mid-query). */
  def selfPairs(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
                windowUs: Long): DataFrame = {
    require(windowUs > 0 && windowUs <= (Long.MaxValue >> 2),
      s"window must be in (0, 2^61), got $windowUs")
    val base = df.select(col(keyCol).as("_k"), col(idCol).as("_id"), col(tsCol).as("_ts"))
    // True floor division: `div` truncates toward zero, which for a
    // negative ts not on a bucket boundary lands one bucket too high and
    // silently drops pairs that straddle it. (ts % W + W) % W is the
    // non-negative remainder, so subtracting it yields the greatest
    // multiple of W <= ts — exact floor(ts/W) for either sign, with no
    // double-precision detour.
    val bucket = expr(s"(_ts - (_ts % $windowUs + $windowUs) % $windowUs) div $windowUs")
    // left rows fan out to their own and the successor bucket; right rows
    // stay in their own bucket → equality join on (_k, _b) is exact
    val l = base.select(col("_k"), col("_id").as("_id1"), col("_ts").as("_ts1"),
        explode(array(bucket, bucket + lit(1L))).as("_b"))
    val r = base.select(col("_k"), col("_id").as("_id2"), col("_ts").as("_ts2"),
      bucket.as("_b"))
    l.join(r, Seq("_k", "_b"))
      .filter((col("_ts2") > col("_ts1") ||
        (col("_ts2") === col("_ts1") && col("_id2") > col("_id1"))) &&
        col("_ts2") <= col("_ts1") + lit(windowUs))
      .select(col("_k").as(keyCol), col("_id1").as(s"${idCol}1"),
        col("_id2").as(s"${idCol}2"), col("_ts1"), col("_ts2"))
  }
}
