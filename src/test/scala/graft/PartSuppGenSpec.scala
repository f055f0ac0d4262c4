package graft

import org.apache.spark.sql.functions._
import graft.sources.PartSuppGen

class PartSuppGenSpec extends SparkSpec {

  test("partsupp: 4 distinct in-range suppliers per part, integral attrs in bounds") {
    val ps = PartSuppGen.partsupp(spark, sf001)
    val perPart = ps.groupBy("ps_partkey")
      .agg(countDistinct("ps_suppkey").as("n"), count(lit(1)).as("rows"))
    assert(perPart.filter(col("n") =!= 4 || col("rows") =!= 4).isEmpty,
      "every part must get exactly 4 distinct suppliers")
    val nSupp = Tables.supplier(spark, sf001).count()
    val bad = ps.filter(
      col("ps_suppkey") < 0 || col("ps_suppkey") >= nSupp ||
        col("ps_availqty") < 1 || col("ps_availqty") > 9999 ||
        col("ps_supplycost") < 1 || col("ps_supplycost") > 1000)
    assert(bad.isEmpty, "attribute out of range")
    assert(ps.count() == Tables.part(spark, sf001).count() * 4)
  }

  test("partsupp synthesis is deterministic and shuffle-free") {
    val a = PartSuppGen.partsupp(spark, sf001).orderBy("ps_partkey", "ps_suppkey").collect()
    val b = PartSuppGen.partsupp(spark, sf001).orderBy("ps_partkey", "ps_suppkey").collect()
    assert(a.toSeq == b.toSeq)
    val p = PartSuppGen.partsupp(spark, sf001).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"generation must be a narrow explode against a broadcast count:\n$p")
  }
}
