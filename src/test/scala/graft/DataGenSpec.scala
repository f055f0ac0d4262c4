package graft

import org.apache.spark.sql.functions._
import graft.model.Schemas.Billing
import graft.sources.{BillingReader, DataGen}

class DataGenSpec extends SparkSpec {

  test("generator distribution: sizes in 1..max-1 post-dedup, dates in 2015, vocab only") {
    val df = DataGen.baskets(spark, 2000, maxItems = 10)
    val stats = df.select(
      min(size(col("items"))).as("minSz"), max(size(col("items"))).as("maxSz"),
      min(year(col("date"))).as("minY"), max(year(col("date"))).as("maxY")).collect().head
    assert(stats.getAs[Int]("minSz") >= 1 && stats.getAs[Int]("maxSz") <= 9)
    assert(stats.getAs[Int]("minY") == 2015 && stats.getAs[Int]("maxY") == 2015)
    val badItems = df.select(explode(col("items")).as("i"))
      .filter(!col("i").isin(DataGen.DefaultVocab.map(x => x: Any): _*)).count()
    assert(badItems == 0)
  }

  test("generator is deterministic and partitioning-independent") {
    val a = DataGen.baskets(spark, 500).collect().map(_.toString).sorted
    val b = DataGen.baskets(spark, 500).repartition(13).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("dialect A lines round-trip through BillingReader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gen").toString + "/a"
    DataGen.dialectALines(spark, 300).write.text(dir)
    val back = BillingReader.dialectA(spark, dir)
    assert(back.count() == 300)
    // same multiset of (date, item-set) — billIds are synthetic on both sides
    val orig = DataGen.baskets(spark, 300)
      .select(col("date").cast("string"), array_sort(col("items")).cast("string"))
      .collect().map(_.toString).sorted
    val rt = back
      .select(col("date").cast("string"), array_sort(col("items")).cast("string"))
      .collect().map(_.toString).sorted
    assert(orig.sameElements(rt))
    // typed view is a zero-cost cast
    import spark.implicits._
    val typed = back.as[Billing]
    assert(typed.head().items.nonEmpty)
  }

  test("dialect B lines parse with cost-first semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gen").toString + "/b"
    DataGen.dialectBLines(spark, 200).write.text(dir)
    val priced = BillingReader.dialectB(spark, dir)
    val stats = priced.select(min(col("unitCost")), max(col("unitCost"))).collect().head
    assert(stats.getDouble(0) >= 1.0 && stats.getDouble(1) <= 20.0)
    assert(priced.filter(col("item").rlike("^[a-z]+$")).count() == priced.count())
  }
}
