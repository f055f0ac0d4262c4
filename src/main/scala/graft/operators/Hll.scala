package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog (Flajolet et al. AofA'07) — the cardinality
  * sketch re-derived so EVERY intermediate is an exact integer and the
  * DuckDB oracle can replay it bit-for-bit (the same decision class as
  * [[Dedup.portableHash64]] vs xxhash64: Spark's own
  * `approx_count_distinct` HLL++ is the fast default, but its register
  * layout and bias tables are engine-private, so it can only ever be
  * error-gated, never hash-verified — see q_events_hourly_hll).
  *
  * Layout: p = 6 → m = 64 registers over the 60-bit md5-derived hash.
  * Register index = top 6 bits; rho = leading-zero count of the
  * remaining 54 bits + 1 ∈ [1, 55], computed as `55 − length(bin(rest))`
  * (both engines print minimal binary digits for positive integers).
  *
  * The one place textbook HLL breaks cross-engine verification is the
  * float harmonic mean Σ 2^−M_j (partition-order-dependent float sum).
  * Scaling by 2⁵⁵ makes every term the INTEGER 2^(55−M_j) ≤ 2⁵⁴, and
  * the 64-term sum ≤ 2⁶¹ fits a BIGINT exactly — the sum is order-free,
  * and the only float op left is the single final division
  * α·m²·2⁵⁵ / S. No small/large-range corrections: they need ln()
  * (not bit-portable across libm, the BM25 lesson), so this is the RAW
  * HLL estimate, honest to ±1.04/√m ≈ 13 % — the spec gates measured
  * error well inside that.
  *
  * At 100 TB the register frame IS the point: 64 rows of (key, reg, mx)
  * per group key, built by one map-side-combinable max-agg, mergeable
  * across partitions / days / tables by the same max (associative,
  * idempotent — HllSpec pins merge ≡ direct), so per-shard sketches
  * roll up without touching raw data again.
  */
object Hll {

  /** Register count m = 2^p. */
  val P = 6
  val M: Int = 1 << P
  private val RestBits = 60 - P
  private val RestMod = 1L << RestBits

  /** α₆₄ · m² · 2⁵⁵ — the estimate numerator, computed ONCE here;
    * oracles interpolate `Hll.EstNumerator.toString` (the '…'::DOUBLE
    * rule). α₆₄ = 0.709 (Flajolet Fig. 3 / the standard table). */
  val EstNumerator: Double = 0.709 * (M.toDouble * M.toDouble) * math.pow(2.0, 55.0)

  /** Mergeable register state: one row per (keys…, reg) with the max
    * rho `mx` ∈ [1, 55]. One shuffle, partial max on the map side. */
  def registers(df: DataFrame, keyCols: Seq[String], value: Column): DataFrame = {
    val h = Dedup.portableHash64(value.cast("string"))
    val rest = h % lit(RestMod)
    val rho = when(rest === 0, lit(55L))
      .otherwise(lit(55L) - length(bin(rest)).cast("long"))
    // NULL values hash to NULL and would surface as a NULL register row
    // — inflating regs_hit while contributing nothing to the harmonic
    // sum (whose `sum` skips NULL), silently skewing the estimate.
    // count(DISTINCT x) ignores NULLs; so does the sketch.
    df.select(
        keyCols.map(col) ++ Seq(
          shiftright(h, RestBits).as("reg"), rho.as("rho")): _*)
      .filter(col("reg").isNotNull)
      .groupBy(keyCols.map(col) :+ col("reg"): _*)
      .agg(max(col("rho")).as("mx"))
  }

  /** Roll register frames up to coarser keys (drop dimensions, e.g.
    * (type, day) sketches → per-type): max is associative and
    * idempotent, so pre-aggregated shard/partition/day sketches combine
    * without rescanning raw data — the 100 TB maintenance contract. */
  def mergeAll(regs: DataFrame, keyCols: Seq[String]): DataFrame =
    regs.groupBy(keyCols.map(col) :+ col("reg"): _*)
      .agg(max(col("mx")).as("mx"))

  /** Merge two register frames over the same keys. */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    mergeAll(a.unionByName(b), keyCols)

  /** Collapse registers to (keys…, regs_hit, harmonic, hll_estimate):
    * S = Σ 2^(55−mx) + (m − hit)·2⁵⁵ exactly in BIGINT, then the one
    * IEEE division. */
  def estimate(regs: DataFrame, keyCols: Seq[String]): DataFrame =
    regs.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("regs_hit"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mx AS INT))")).as("_s"))
      .withColumn("harmonic",
        col("_s") + (lit(M.toLong) - col("regs_hit")) * lit(1L << 55))
      .withColumn("hll_estimate", lit(EstNumerator) / col("harmonic").cast("double"))
      .drop("_s")

  /** registers → estimate in one call. */
  def cardinality(df: DataFrame, keyCols: Seq[String], value: Column): DataFrame =
    estimate(registers(df, keyCols, value), keyCols)
}
