package graft

import org.apache.spark.sql.functions._

/** Sink parity (SURVEY §2.1 text sinks): csv / json / parquet writers
  * round-trip a query result with values intact. */
class SinksSpec extends SparkSpec {

  test("csv, json, parquet sinks round-trip a query result") {
    val out = SparkEntry.queries("q_join_broadcast")(spark, sf001)
    val base = java.nio.file.Files.createTempDirectory("graft-sinks").toString
    out.write.option("header", "true").csv(s"$base/csv")
    out.write.json(s"$base/json")
    out.write.parquet(s"$base/parquet")
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$base/csv")
    val fromJson = spark.read.json(s"$base/json")
    val fromParquet = spark.read.parquet(s"$base/parquet")
    val expect = out.orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq
    assert(fromParquet.orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq == expect)
    assert(fromJson.select("r_name", "n_name", "n_cust", "total_bal")
      .orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq == expect)
    assert(fromCsv.count() == out.count())
    // collect-to-driver parity (the reference returns collected lists)
    assert(out.collect().length == out.count())
  }
}
