package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AssocRules, Dedup, TopK}
import graft.sources.{BillingReader, DataGen}

/** Apples-to-apples run at the reference authors' own scale: 1,000,000
  * billing lines, ≤10 items/basket, 8-item vocabulary
  * (`/root/reference/BD_hw1/src/generator/BillingMain.java:27`), from
  * raw text ingest through each of the three queries. Prints one line
  * per stage; see README "Reference-scale run".
  */
object RefScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("refscale").toString

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"REFSCALE $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    /** cold + steady (2nd run): the reference has no JVM-warm story, so
      * report both. */
    def time2(name: String)(f: => Long): Unit = {
      time(name + "-cold")(f); time(name + "-steady")(f)
    }

    time("gen-dialect-a")(DataGen.dialectALines(spark, n).write.text(s"$dir/a"))
    time("gen-dialect-b")(DataGen.dialectBLines(spark, n).write.text(s"$dir/b"))

    val baskets = BillingReader.dialectA(spark, s"$dir/a")
    time2("q1-top5-month") {
      val counts = baskets.select(date_format(col("date"), "yyyy-MM").as("month"),
          explode(col("items")).as("item"))
        .groupBy(col("month"), col("item")).agg(count(lit(1)).as("cnt"))
      TopK.perGroup(counts, Seq(col("month")), col("cnt"), Seq(col("item")), 5).count()
    }
    time2("q1-top5-native") {
      val counts = baskets.select(date_format(col("date"), "yyyy-MM").as("month"),
          explode(col("items")).as("item"))
        .groupBy(col("month"), col("item")).agg(count(lit(1)).as("cnt"))
      TopK.perGroupNative(counts, Seq("month"), "cnt", Seq("item"), 5).count()
    }
    time2("q2-revenue-month") {
      BillingReader.dialectB(spark, s"$dir/b")
        .groupBy(col("item"), date_format(col("date"), "yyyy-MM").as("month"))
        .agg(graft.functions.ColFns.moneySum(col("unitCost"), 2).as("total")).count()
    }
    time2("q3-rules-join") {
      AssocRules.rules(
        baskets.select(col("billId"), explode(col("items")).as("item")),
        "billId", "item").count()
    }
    time2("q3-rules-generator") {
      AssocRules.rulesFromBasketArrays(baskets.select(col("billId"), col("items")), "items").count()
    }

    // ------------------------------------------------ dedup at doc scale
    // The reference has no dedup surface; these rows put the curation
    // operators on the same apples-to-apples footing (seeded corpus,
    // known duplicate structure, raw ingest through each stage). Docs
    // default to n/5 (200k at the reference's 1M lines) — ~12M token
    // shingles through the MinHash agg, the heaviest stage.
    val nDocs = args.drop(1).headOption.map(_.toLong).getOrElse(n / 5L)
    time("gen-docs")(DataGen.documents(spark, nDocs)
      .write.parquet(s"$dir/docs"))
    val docs = spark.read.parquet(s"$dir/docs")
    def released(f: => Long): Long = try f finally Caching.release()
    time2("d-exact-dedup") { released {
      Dedup.exact(docs, "doc_id", Seq("text")).count()
    }}
    time2("d-minhash-sigs") { released {
      Dedup.minhashSignatures(docs, "doc_id", "text").count()
    }}
    time2("d-lsh-pipeline") { released {
      Dedup.lshCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id").count()
    }}
    time2("d-lsh-clusters") { released {
      val pairs = Dedup.lshCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
        .filter(col("est_jaccard") >= 0.7)
        .select(col("id1"), col("id2"))
      Dedup.connectedComponents(pairs, docs.select(col("doc_id")), "doc_id").count()
    }}
    spark.stop()
  }
}
