package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Plan pins for the bucketed-layout contract: once both sides are
  * bucketed on the join key, the join AND a key-grouped aggregation
  * run with ZERO shuffle exchanges — the scan itself satisfies the
  * clustering requirement. Results are also checked against the
  * plain-table join so layout never changes semantics.
  */
class BucketingSpec extends SparkSpec {

  private val lt = "bspec_orders"
  private val rt = "bspec_customer"

  private lazy val tables: Unit = {
    val orders = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sf001)
      .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_acctbal"))
    Bucketing.writeBucketed(orders, lt, Seq("o_custkey"), 8, Seq("o_custkey"))
    Bucketing.writeBucketed(cust, rt, Seq("o_custkey"), 8, Seq("o_custkey"))
  }

  test("bucketed join on the bucket key plans with zero shuffle exchanges") {
    tables
    val plan = Bucketing.cocolatedJoin(spark, lt, rt, Seq("o_custkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge join not chosen:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // the scans advertise the bucket layout
    assert(plan.contains("Bucketed: true"), s"scan ignored buckets:\n$plan")
  }

  test("aggregation keyed on the bucket column is also exchange-free") {
    tables
    val plan = spark.table(lt).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
  }

  test("bucketed layout never changes join results") {
    tables
    val bucketed = Bucketing.cocolatedJoin(spark, lt, rt, Seq("o_custkey"))
      .select(col("o_orderkey"), col("c_name"))
    val plain = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001)
        .withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
      .select(col("o_orderkey"), col("c_name"))
    assert(bucketed.count() == plain.count())
    assert(bucketed.except(plain).isEmpty && plain.except(bucketed).isEmpty)
  }
}
