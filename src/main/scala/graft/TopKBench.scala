package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TopK

/** A/B of the two per-key top-k formulations on identical inputs:
  *
  *  - window: row_number over (order desc, tie asc) + rank filter —
  *    Spark plans WindowGroupLimit (map-side group limit) but still
  *    SORTS every map partition and re-sorts after the exchange.
  *  - native: TopKPerKeyNode → two-phase bounded-heap exec — no sorts,
  *    O(n log k) per side.
  *
  * Two workload shapes bracket the design space:
  *  - orders/custkey: high key cardinality (≈ rows/10 groups), k=3 —
  *    the regime the heap path is built for.
  *  - lineitem month agg: q_top5_month's exact input — few groups
  *    (~84 months after a pre-agg), k=5.
  *
  * Prints one line per (workload, formulation, cold|steady); the
  * adopt-the-winner decision for q_top5_month cites these numbers.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // codegen-infra warmup

    def time2(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); f
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val steady = (System.nanoTime() - t1) / 1e9
      println(f"""TOPKBENCH {"workload":"$name","cold_sec":$cold%.3f,"steady_sec":$steady%.3f}""")
    }

    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    time2("orders_custkey_k3_window") {
      TopK.perGroup(orders, Seq(col("o_custkey")), col("o_totalprice"),
        Seq(col("o_orderkey")), 3).count()
    }
    time2("orders_custkey_k3_native") {
      TopK.perGroupNative(orders, Seq("o_custkey"), "o_totalprice",
        Seq("o_orderkey"), 3).count()
    }

    def monthly: DataFrame = Tables.lineitem(spark, sfDir)
      .select(graft.functions.ColFns.monthKey(col("l_shipdate")).as("month"), col("l_partkey"))
      .groupBy(col("month"), col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
    time2("month_part_k5_window") {
      TopK.perGroup(monthly, Seq(col("month")), col("cnt"),
        Seq(col("l_partkey")), 5).count()
    }
    time2("month_part_k5_native") {
      TopK.perGroupNative(monthly, Seq("month"), "cnt",
        Seq("l_partkey"), 5).count()
    }

    // raw (un-aggregated) per-key top-k straight off the scan: lineitem
    // top-3 rows per partkey by extendedprice — the shape where the
    // window path pays a full map-side sort of every scan partition
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("uid", col("l_orderkey") * 10 + col("l_linenumber"))
    time2("lineitem_part_k3_window") {
      TopK.perGroup(li, Seq(col("l_partkey")), col("l_extendedprice"),
        Seq(col("uid")), 3).count()
    }
    time2("lineitem_part_k3_native") {
      TopK.perGroupNative(li, Seq("l_partkey"), "l_extendedprice",
        Seq("uid"), 3).count()
    }
    spark.stop()
  }
}
