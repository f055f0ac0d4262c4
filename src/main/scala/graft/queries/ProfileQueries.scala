package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.{Profile, ZOrder}

/** Table-profiling surface: one-scan per-column profile and equi-width
  * histogram over `lineitem`. The oracle SQL is GENERATED from the same
  * column/type list the engine profiles, so the per-type numeric-view
  * semantics (value / length / epoch-micros) are pinned in one place.
  */
object ProfileQueries {

  // (column, numeric-view SQL) — must mirror Profile.numView's per-type
  // rule for lineitem's schema. Declared before `defs` (init order).
  private val LineitemCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "CAST(l_orderkey AS DOUBLE)",
    "l_partkey" -> "CAST(l_partkey AS DOUBLE)",
    "l_suppkey" -> "CAST(l_suppkey AS DOUBLE)",
    "l_linenumber" -> "CAST(l_linenumber AS DOUBLE)",
    "l_quantity" -> "CAST(l_quantity AS DOUBLE)",
    "l_extendedprice" -> "CAST(l_extendedprice AS DOUBLE)",
    "l_discount" -> "CAST(l_discount AS DOUBLE)",
    "l_tax" -> "CAST(l_tax AS DOUBLE)",
    "l_returnflag" -> "CAST(length(l_returnflag) AS DOUBLE)",
    "l_linestatus" -> "CAST(length(l_linestatus) AS DOUBLE)",
    "l_shipdate" -> "CAST(epoch_us(l_shipdate) AS DOUBLE)")

  private val ProfileOracle = LineitemCols.map { case (c, nv) =>
    s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  min($nv) AS min_num, max($nv) AS max_num
       |FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  val defs: Seq[(String, QueryDef)] = Seq(

    // Exact mode (multi-distinct via Expand — one input scan). The
    // approx (HLL, no-Expand) mode is the 100 TB default and is gated
    // in ProfileSpec instead (estimates can't hash-match).
    "q_profile" -> QueryDef(
      (s, dir) => Profile.profile(
        Tables.lineitem(s, dir), LineitemCols.map(_._1), exact = true),
      ProfileOracle),

    "q_histogram" -> QueryDef(
      (s, dir) => Profile.histogram(
        Tables.lineitem(s, dir), "l_extendedprice", nBuckets = 20),
      """WITH bounds AS (
        |  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |         max(CAST(l_extendedprice AS DOUBLE)) AS mx
        |  FROM lineitem),
        |bk AS (
        |  SELECT CAST(CASE WHEN mx = mn THEN 0
        |         ELSE least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - mn) * 20.0 / (mx - mn)) AS BIGINT), 19)
        |         END AS BIGINT) AS bucket, mn, mx
        |  FROM lineitem CROSS JOIN bounds)
        |SELECT bucket,
        |       mn + CAST(bucket AS DOUBLE) * ((mx - mn) / 20.0) AS lo,
        |       mn + CAST(bucket + 1 AS DOUBLE) * ((mx - mn) / 20.0) AS hi,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM bk GROUP BY bucket, mn, mx"""),

    // Z-order (Morton) clustering key over (l_partkey, l_suppkey) — the
    // layout op behind 2-D data skipping (operators/ZOrder; the
    // repartitionByRange+sort side is pinned in ZOrderSpec, since a
    // partitioning property is invisible to a row hash). Pure integer
    // bit math, replayed shift-for-shift by the oracle.
    "q_zorder" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          ZOrder.zkey2(col("l_partkey"), col("l_suppkey")).as("zkey")),
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       ${ZOrder.zkey2Sql("l_partkey", "l_suppkey")} AS zkey
        |FROM lineitem""")
  )
}
