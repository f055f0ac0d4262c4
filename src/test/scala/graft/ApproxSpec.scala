package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate surface (HLL++ sketches): error bound vs exact
  * on real data. These are the constant-memory aggregations a 100 TB
  * profile pass uses where exact distinct counts would shuffle-explode. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val r = Tables.lineitem(spark, sf001).agg(
      countDistinct(col("l_partkey")).as("exact_p"),
      approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx_p"),
      countDistinct(col("l_orderkey")).as("exact_o"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_o")).collect().head
    def relErr(e: Long, a: Long) = math.abs(a - e).toDouble / e
    assert(relErr(r.getLong(0), r.getLong(1)) < 0.05)
    assert(relErr(r.getLong(2), r.getLong(3)) < 0.05)
  }

  test("approx percentile tracks exact percentile") {
    val r = Tables.lineitem(spark, sf001).agg(
      percentile(col("l_quantity"), lit(0.5)).as("exact"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("approx"))
      .collect().head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0)
  }
}
