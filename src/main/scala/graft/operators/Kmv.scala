package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values / theta sketch (Bar-Yossef et al. RANDOM'02; the
  * DataSketches theta family) — distinct counting that, unlike HLL,
  * supports SET ALGEBRA on the sketches themselves: union, intersection,
  * and Jaccard between tables come from comparing two k-row hash lists,
  * never from rescanning raw data. The audience-overlap / corpus-overlap
  * primitive at 100 TB: sketch each side once (one distinct + one
  * bounded top-k shuffle each), then every pairwise overlap is arithmetic
  * on ≤ k-row frames.
  *
  * Everything is deterministic integer state: the sketch IS the k
  * smallest distinct md5-derived 60-bit hashes (ties impossible after
  * the hash-distinct), so DuckDB replays it row for row — the same
  * portability class as [[Hll]]'s scaled-integer registers, and unlike
  * both HLL and CMS the ESTIMATOR is unbiased with known variance
  * (rel. stderr ≈ 1/√(k−2) ≈ 6 % at k = 256).
  *
  * The k-smallest selection runs on the native bounded-heap operator
  * ([[TopK.perGroupNative]]): partial heaps shrink the shuffle to ≤ k
  * rows per set per map partition — the selection never sorts a
  * partition, let alone a set.
  *
  * Estimators (θ = kth-smallest hash, H = 2⁶⁰ the hash space):
  *  - |S| ≈ (k−1)·H / θ  (exact count when the set has < k members)
  *  - for a pair with θ* = min(θ_a, θ_b): every sketch hash < θ* is a
  *    uniform sample of the union; |A∩B| ≈ n_common·H/θ*, |A∪B| ≈
  *    n_either·H/θ*, and Jaccard ≈ n_common/n_either needs no scaling.
  */
object Kmv {

  /** Sketch size: rel. stderr ≈ 1/√(k−2) ≈ 6.3 %. */
  val K = 256

  /** 2⁶⁰ — the portable hash's value space (exact as a double). */
  val HashSpace: Double = math.pow(2.0, 60.0)

  /** (k−1)·2⁶⁰ — distinct-estimate numerator, computed ONCE; oracles
    * interpolate the toString (the '…'::DOUBLE rule). */
  val EstNumerator: Double = (K - 1).toDouble * HashSpace

  /** The sketch: ≤ k rows (keys…, h) of the smallest distinct hashes
    * per set. One distinct shuffle + one bounded-heap top-k. */
  def sketch(df: DataFrame, keyCols: Seq[String], value: Column): DataFrame = {
    // NULL values hash to NULL and would occupy a sketch slot while
    // max(h) skips them — θ and n_sk disagree by one. count(DISTINCT)
    // semantics: NULL is not a member (the Hll.registers rule).
    val hashed = df
      .select(keyCols.map(col) :+ Dedup.portableHash64(value.cast("string")).as("h"): _*)
      .filter(col("h").isNotNull)
      .distinct()
      .withColumn("negh", -col("h"))
    TopK.perGroupNative(hashed, keyCols, "negh", Seq.empty, K).drop("negh")
  }

  /** (keys…, n_sk, theta, kmv_estimate): exact when n_sk < k, else the
    * unbiased (k−1)·H/θ. θ for a saturated sketch is its max h; an
    * unsaturated sketch saw the whole set, so θ = H conceptually. */
  def estimateDistinct(sk: DataFrame, keyCols: Seq[String]): DataFrame =
    sk.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("theta"))
      .withColumn("kmv_estimate",
        when(col("n_sk") < K, col("n_sk").cast("double"))
          .otherwise(lit(EstNumerator) / col("theta").cast("double")))

  /** Pairwise overlap of two sketches given as (tag, h) rows under the
    * SAME tag column: for every tag pair (a < b) — θ* = min of the two
    * thetas, n_common / n_either = sketch hashes < θ* in both / either,
    * then |A∩B| ≈ n_common·H/θ*, |A∪B| ≈ n_either·H/θ*, Jaccard =
    * n_common/n_either. Sketch frames are ≤ k rows per tag, so every
    * join here is broadcast-sized regardless of input scale. */
  def overlap(sketch0: DataFrame, tagCol: String): DataFrame = {
    // ≤ k rows per tag and four consumers below (thetas + three join
    // sides) — materialize once, Caching-tracked (Verify/Bench release)
    val sk = graft.Caching.persistTracked(sketch0)
    val thetas = sk.groupBy(col(tagCol)).agg(
      count(lit(1)).as("n_sk"), max(col("h")).as("theta"))
    val pairs = thetas.select(col(tagCol).as("tag_a"),
        col("n_sk").as("n_a"), col("theta").as("theta_a"))
      .join(thetas.select(col(tagCol).as("tag_b"),
        col("n_sk").as("n_b"), col("theta").as("theta_b")),
        col("tag_a") < col("tag_b"))
      .withColumn("theta_min", least(col("theta_a"), col("theta_b")))
    val a = sk.select(col(tagCol).as("ta"), col("h").as("ha"))
    val b = sk.select(col(tagCol).as("tb"), col("h").as("hb"))
    val aCounts = pairs
      .join(a, col("tag_a") === col("ta")).drop("ta")
      .filter(col("ha") < col("theta_min"))
      .join(b, col("tag_b") === col("tb") && col("ha") === col("hb"), "left")
      .groupBy(col("tag_a"), col("tag_b"))
      .agg(count(lit(1)).as("n_a_lt"), count(col("hb")).as("n_common"))
    // n_either = |{h < θ*} in A| + |{h < θ*} in B| − n_common
    val bCounts = pairs
      .join(b, col("tag_b") === col("tb"))
      .filter(col("hb") < col("theta_min"))
      .groupBy(col("tag_a"), col("tag_b")).agg(count(lit(1)).as("n_b_lt"))
    // LEFT joins from the pair frame: a side with no hashes below θ*
    // groups to NO row, and inner joins would silently drop the whole
    // pair — every (a, b) must report, with zero counts and a NULL
    // jaccard when the θ*-sample is empty (0/0 is "no evidence", and
    // NULL beats a NaN that hashes differently per engine).
    pairs.select(col("tag_a"), col("tag_b"), col("theta_min"))
      .join(aCounts, Seq("tag_a", "tag_b"), "left")
      .join(bCounts, Seq("tag_a", "tag_b"), "left")
      .select(col("tag_a"), col("tag_b"), col("theta_min"),
        coalesce(col("n_a_lt"), lit(0L)).as("n_a_lt"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_b_lt"), lit(0L)).as("n_b_lt"))
      .withColumn("n_either", col("n_a_lt") + col("n_b_lt") - col("n_common"))
      .select(col("tag_a"), col("tag_b"), col("n_common"), col("n_either"),
        (col("n_common").cast("double") *
          (lit(HashSpace) / col("theta_min").cast("double"))).as("inter_est"),
        (col("n_either").cast("double") *
          (lit(HashSpace) / col("theta_min").cast("double"))).as("union_est"),
        when(col("n_either") > 0L,
          col("n_common").cast("double") / col("n_either").cast("double"))
          .as("jaccard_est"))
  }
}
