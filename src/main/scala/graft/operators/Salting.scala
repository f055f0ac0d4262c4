package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-stage aggregation. For a key whose row count dwarfs
  * the others (a hot partkey, a bot user), a plain groupBy puts the whole
  * key in one reducer; salting splits stage 1 over `buckets` reducers and
  * stage 2 merges the tiny per-salt partials:
  *
  *   groupBy(key, salt = hash(row) mod buckets) → partial agg   [spread]
  *   groupBy(key)                               → merge partials [tiny]
  *
  * Only merge-associative aggregates are offered (count/sum/min/max) —
  * that's the algebra that makes the two-stage split correct. AQE's
  * skew-join splitting covers the join case; this covers aggregation.
  * (At sf0.1 the driver data is uniform — the operator exists for the
  * 100 TB posture and is verified for equivalence, not speed, here.)
  */
object Salting {

  def saltedAgg(df: DataFrame, keyCols: Seq[Column], buckets: Int,
                aggs: Seq[(String, Column)]): DataFrame = {
    // salt by row position, NOT row content: the canonical skew case is
    // billions of byte-identical rows for one hot key, and a content
    // hash would send them all to one salt bucket (no spread at all).
    // The salt value never reaches results (stage 2 merges it away), so
    // partition-layout dependence is harmless.
    val salted = df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val partialAggs = aggs.map { case (name, expr) => expr.as(s"_p_$name") }
    val partial = salted.groupBy((keyCols :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    // merge phase: counts and sums merge by sum; min/max by min/max
    val merged = aggs.map { case (name, _) =>
      val c = col(s"_p_$name")
      (name match {
        case n if n.startsWith("count") || n.startsWith("sum") => sum(c)
        case n if n.startsWith("min") => min(c)
        case n if n.startsWith("max") => max(c)
        case other => throw new IllegalArgumentException(
          s"non-mergeable aggregate '$other' (use count*/sum*/min*/max*)")
      }).as(name)
    }
    partial.groupBy(keyCols: _*).agg(merged.head, merged.tail: _*)
  }
}
