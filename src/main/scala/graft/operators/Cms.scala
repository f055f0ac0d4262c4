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
  * The d hash rows are BIT SLICES of ONE md5-derived 60-bit hash
  * (row i uses bits [11·i, 11·i+11) — 44 of the 60 bits): one digest
  * per input row instead of d. Measured 2.7× on the build (the digest
  * chain, not the explode, dominates: 2.53 → 0.92 s at sf0.1), and
  * md5's bit uniformity keeps the slices pairwise-independent enough
  * that the measured overcount profile is unchanged (86 % of items
  * collision-free at w=2048, identical to 4 independent salted
  * digests).
  *
  * Every stage is exact integer arithmetic on the portable hash, and
  * the counter values are pure SUMS — no merge-order dependence
  * anywhere (unlike Misra–Gries eviction or HLL++'s private register
  * encoding), so point estimates hash-verify in DuckDB end to end.
  *
  * 100 TB shape: the build is one digest + stack(d) + one map-side-
  * combinable keyed count — each task combines to ≤ d·w rows before
  * the shuffle no matter how many rows it scanned. The estimate side
  * broadcasts the ≤ d·w-row counter table; no shuffle touches the
  * query items.
  */
object Cms {

  /** Depth (hash rows) and width (buckets per row; 2^11). */
  val D = 4
  val W = 2048
  private val Bits = 11
  require((1 << Bits) == W && Bits * D <= 60)

  private def stackSql(hCol: String): String = {
    val args = (0 until D)
      .map(i => s"$i, CAST((shiftright($hCol, ${Bits * i})) % $W AS BIGINT)")
      .mkString(", ")
    s"stack($D, $args) AS (seed, bucket)"
  }

  /** The sketch: (seed, bucket, c) with c = Σ weight — at most d·w rows.
    * Merge two sketches by unionByName + sum over (seed, bucket). */
  def counters(df: DataFrame, value: Column, weight: Column = lit(1L)): DataFrame =
    // NULL values hash to NULL buckets — d dead counter rows that no
    // point estimate can ever reach (the equality join drops NULL) but
    // that survive merges and pollute the frame. NULL is not an item
    // (the Hll.registers rule).
    df.select(Dedup.portableHash64(value.cast("string")).as("_h"), weight.as("_w"))
      .filter(col("_h").isNotNull)
      .selectExpr(stackSql("_h"), "_w")
      .groupBy(col("seed"), col("bucket"))
      .agg(sum(col("_w")).as("c"))

  /** Point estimates for every row of `items`: min over the d bucket
    * slices of the item's hash. The counter table broadcasts; items
    * are never shuffled.
    *
    * A bucket with no counter row counts as ZERO (left join +
    * coalesce) — an inner join would silently drop the zeros from the
    * min, answering an unseen item with the smallest OCCUPIED bucket
    * (or no row at all when every slice is empty) instead of the
    * textbook 0. The distinction only shows for items absent from (or
    * vanishingly rare in) the sketched corpus — exactly the membership
    * probe a 100 TB decontamination pass runs.
    *
    * NULL probes are dropped, mirroring `counters`: NULL is not an
    * item, so it gets no estimate row — not a fabricated "never seen"
    * 0 (its NULL hash would miss every counter row and coalesce to 0,
    * a corner both engines would replay identically, invisible to the
    * oracle gate). */
  def pointEstimates(sketch: DataFrame, items: DataFrame, itemCol: String): DataFrame =
    items.select(col(itemCol),
        Dedup.portableHash64(col(itemCol).cast("string")).as("_h"))
      .filter(col("_h").isNotNull)
      .selectExpr(itemCol, stackSql("_h"))
      .join(broadcast(sketch), Seq("seed", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_estimate"))
}
