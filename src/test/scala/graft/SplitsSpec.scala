package graft

import org.apache.spark.sql.functions._
import graft.operators.Splits

class SplitsSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf001).select(col("doc_id"))

  test("split assignment is stable under repartitioning and re-runs") {
    val a = Splits.assign(docs, "doc_id", "s1").orderBy("doc_id").collect()
    val b = Splits.assign(docs.repartition(7), "doc_id", "s1").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("splits are disjoint, exhaustive, and roughly proportioned") {
    val counts = Splits.assign(docs, "doc_id", "s1", trainPct = 80, validPct = 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(n == docs.count())
    assert(counts.keySet == Set("train", "valid", "test"))
    // md5 buckets over ~50 ids (sf0.001): generous tolerance, the point
    // is gross proportion, not exactness
    assert(counts("train").toDouble / n > 0.6 && counts("train").toDouble / n < 0.95)
  }

  test("changing the salt re-rolls the split") {
    val a = Splits.assign(docs, "doc_id", "s1").select("doc_id", "split")
    val b = Splits.assign(docs, "doc_id", "s2").select("doc_id", "split")
    assert(a.exceptAll(b).count() > 0) // at least one row moved
  }

  test("degenerate percentages are rejected") {
    intercept[IllegalArgumentException] {
      Splits.assign(docs, "doc_id", "s1", trainPct = 90, validPct = 10)
    }
  }
}
