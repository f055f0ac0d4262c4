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

  test("orc sink round-trips with predicate pushdown at the scan") {
    val out = SparkEntry.queries("q_join_broadcast")(spark, sf001)
    val base = java.nio.file.Files.createTempDirectory("graft-orc").toString
    out.write.orc(s"$base/orc")
    val back = spark.read.orc(s"$base/orc")
    assert(back.orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq ==
      out.orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq)
    // ORC scans carry search arguments like parquet carries PushedFilters
    val plan = back.filter(col("n_cust") > 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_cust), GreaterThan(n_cust,2)]"),
      s"filter did not reach the ORC scan:\n$plan")
  }

  test("hive-partitioned layout prunes non-matching partitions at the scan") {
    // the 100 TB ingest posture: partition the lake by a low-cardinality
    // routing column so per-stratum queries touch only their directories
    val docs = Tables.documents(spark, sf001)
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString
    docs.write.partitionBy("lang").parquet(s"$base/docs")
    val back = spark.read.parquet(s"$base/docs")
    val en = back.filter(col("lang") === "en")
    // partition filter must reach the scan (pruning, not a post-filter)
    val scan = en.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pushed:\n$scan")
    assert(en.count() == docs.filter(col("lang") === "en").count())
    // non-matching partition directories are dropped before file listing
    // (inputFiles reports the PRE-pruning relation — ask the exec scan)
    val dirs = new java.io.File(s"$base/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")) && dirs.size > 1)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      // materialize THIS queryExecution (count() would plan a fresh one
      // whose metrics this plan instance never sees)
      val plan = df.queryExecution.executedPlan
      plan.execute().count()
      plan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get
    }
    val allFiles = scannedFiles(back)
    val enFiles = scannedFiles(back.filter(col("lang") === "en"))
    assert(enFiles > 0 && enFiles < allFiles,
      s"pruning did not reduce scanned files: $enFiles of $allFiles")
  }
}
