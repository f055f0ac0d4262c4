package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan '05) — the frequency
  * sketch that complements the two existing frequency surfaces:
  * Misra–Gries (q_heavy_hitters) yields a CANDIDATE set and needs a
  * recount pass for exact output; the exact groupBy holds per-task
  * state proportional to the distinct-key count. CMS is d·w integer
  * counters TOTAL (4×2048 here — 64 KiB) regardless of cardinality,
  * mergeable across shards by plain +, and answers a point query for
  * ANY item (not just survivors) with a one-sided guarantee:
  * estimate ≥ true count always, overcount ≤ e·N/w w.p. 1−e^−d.
  *
  * Every stage is exact integer arithmetic on the md5-derived portable
  * hash, and the counter values are pure SUMS — no merge-order
  * dependence anywhere (unlike Misra–Gries eviction or HLL++'s private
  * register encoding), so point estimates hash-verify in DuckDB
  * end to end.
  *
  * 100 TB shape: the build is one explode(d seeds) + one map-side-
  * combinable keyed count — each task combines to ≤ d·w rows before
  * the shuffle no matter how many rows it scanned. The estimate side
  * broadcasts the ≤ d·w-row counter table; no shuffle touches the
  * query items.
  */
object Cms {

  /** Depth (independent hash rows) and width (buckets per row). */
  val D = 4
  val W = 2048

  /** Row-`seed` bucket for `value` — seed-salted portable hash. */
  def bucket(seed: Column, value: Column): Column =
    Dedup.portableHash64(
      concat(lit("cms"), seed.cast("string"), lit(":"), value.cast("string"))) % W

  private def seeds: Column =
    explode(array((0 until D).map(i => lit(i)): _*))

  /** The sketch: (seed, bucket, c) with c = Σ weight — at most d·w rows.
    * Merge two sketches by unionByName + sum over (seed, bucket). */
  def counters(df: DataFrame, value: Column, weight: Column = lit(1L)): DataFrame =
    df.select(value.as("_v"), weight.as("_w"))
      .select(seeds.as("seed"), col("_v"), col("_w"))
      .groupBy(col("seed"), bucket(col("seed"), col("_v")).as("bucket"))
      .agg(sum(col("_w")).as("c"))

  /** Point estimates for every row of `items`: min over the d rows of
    * the counter each seed hashes the item into. The counter table
    * broadcasts; items are never shuffled. */
  def pointEstimates(sketch: DataFrame, items: DataFrame, itemCol: String): DataFrame =
    items.select(col(itemCol), seeds.as("seed"))
      .withColumn("bucket", bucket(col("seed"), col(itemCol)))
      .join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy(col(itemCol))
      .agg(min(col("c")).as("cms_estimate"))
}
