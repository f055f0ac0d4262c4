package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Queries expressed through the `spark.sql` text interface (the engine's
  * SQL front door): correlated subquery decorrelation and a six-table
  * TPC-H-Q5-shaped join. Registering the parquet tables as temp views is
  * metadata-only; the plans are identical to the DataFrame formulations.
  */
object SqlQueries {

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  val defs: Seq[(String, QueryDef)] = Seq(

    // Correlated scalar subquery → Catalyst rewrites to a decorrelated
    // aggregate + join. Decimal-exact per-nation mean on both sides.
    "q_correlated_subquery" -> QueryDef(
      (s, dir) => {
        views(s, dir, "customer")
        s.sql(
          """SELECT c_custkey, c_acctbal FROM customer c
            |WHERE c_acctbal > (
            |  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
            |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
      },
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)"""),

    // TPC-H Q5 shape (local-supplier volume in ASIA): six-table join,
    // two broadcast dims + three fact joins, decimal-exact revenue.
    "q_multi_join" -> QueryDef(
      (s, dir) => {
        views(s, dir, "region", "nation", "customer", "orders", "lineitem", "supplier")
        s.sql(
          """SELECT n_name,
            |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
            |       count(*) AS n_lines
            |FROM customer
            |JOIN orders   ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
            |JOIN nation   ON c_nationkey = n_nationkey
            |JOIN region   ON n_regionkey = r_regionkey
            |WHERE r_name = 'ASIA'
            |GROUP BY n_name""".stripMargin)
      },
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""")
  )
}
