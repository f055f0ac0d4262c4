package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic partsupp synthesis — the driver testdata has no
  * partsupp table, which kept TPC-H Q2/Q11 out of scope; this closes
  * that gap the same way the media corpus does: every attribute is
  * integer arithmetic on existing keys, so a DuckDB oracle replays the
  * table without sharing code with the engine.
  *
  * Shape follows TPC-H's partsupp rule (4 suppliers per part, spread
  * across the supplier space so part/supplier joins fan out evenly):
  * supplier i of part p = (p + i·(S div 4)) mod S over the 0-based
  * contiguous supplier keys — distinct for i ∈ 0..3 whenever S ≥ 8
  * (and at S = 10·SF the stride S div 4 keeps all four apart at every
  * driver SF). Cost/quantity are small-modulus integers, so Q11's
  * value sums stay exact BIGINTs — no decimal discipline needed.
  *
  * Scale: one narrow 4× explode of `part` against a 1-row broadcast
  * supplier count — no shuffle; the generated frame joins downstream
  * like any fact slice.
  */
object PartSuppGen {

  def partsupp(s: SparkSession, dir: String): DataFrame =
    partsuppOf(Tables.part(s, dir), s, dir)

  /** Generate partsupp rows for a (possibly pre-filtered) `part` frame.
    * Because every generated attribute is arithmetic on p_partkey alone,
    * filtering part FIRST and generating after is identical to
    * generating everything and joining the filter back — but the plan
    * skips the post-explode join and the explode itself shrinks by the
    * filter's selectivity (Q9/Q20 pass their type-filtered part here,
    * the join Catalyst could not push below the Generate). */
  def partsuppOf(part: DataFrame, s: SparkSession, dir: String): DataFrame = {
    val p = part.select(col("p_partkey").cast("long").as("p"))
    val sCount = Tables.supplier(s, dir).agg(count(lit(1)).as("s_cnt"))
    p.crossJoin(broadcast(sCount))
      .select(col("p"), col("s_cnt"), explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(
        col("p").as("ps_partkey"),
        ((col("p") + col("i") * expr("s_cnt div 4")) % col("s_cnt")).as("ps_suppkey"),
        (lit(1L) + (col("p") * 7 + col("i") * 13) % 9999).as("ps_availqty"),
        (lit(1L) + (col("p") * 11 + col("i") * 17) % 1000).as("ps_supplycost"))
  }
}
