package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-bucketing both fact tables on the join
  * key lets Catalyst plan the join with ZERO exchanges — the 100 TB
  * pattern for repeated joins on a stable key (bucket once, join many
  * times shuffle-free). Asserted at the plan level AND by value parity
  * with the shuffled join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key plans with no Exchange") {
    val li = Tables.lineitem(spark, sf001).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf001).select(col("o_orderkey"), col("o_totalprice"))
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_li")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_o")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("b_li")
        .join(spark.table("b_o"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      // value parity with the plain (shuffled) join
      val shuffled = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == shuffled)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_li")
      spark.sql("DROP TABLE IF EXISTS b_o")
    }
  }
}
