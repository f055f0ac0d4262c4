package graft

import org.apache.spark.sql.functions._
import graft.functions.FreqSketch

/** Misra–Gries heavy hitters: the membership guarantee (candidates ⊇
  * every item with freq > n/(k+1)) under adversarial partitioning, exact
  * n, and the determinism of the sketch→exact-recount composition. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed stream: item i appears i² times — a long tail with a few
    * clear heavy hitters. */
  private def skewed(nItems: Int) =
    (1 to nItems).flatMap(i => Seq.fill(i * i)(s"item$i"))

  test("MG candidates contain every item above n/(k+1), any partitioning") {
    val data = skewed(10) // n = Σi² = 385; heavy (> 385/9 = 42): i ∈ 7..10
    val n = data.size.toLong
    val k = 8
    val exactHeavy = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > n / (k + 1)).keySet.toSet
    assert(exactHeavy.nonEmpty, "fixture must have heavy items")
    for (parts <- Seq(1, 3, 16)) {
      val row = data.toDF("item").repartition(parts)
        .agg(FreqSketch.mg_candidates(col("item"), k).as("sk"))
        .select(col("sk.items"), col("sk.n")).collect().head
      val cands = row.getSeq[String](0).toSet
      assert(row.getLong(1) == n)
      assert(cands.size <= k)
      assert(exactHeavy.subsetOf(cands),
        s"parts=$parts missing ${exactHeavy -- cands}")
    }
  }

  test("sketch→exact recount equals the plain exact heavy-hitter query") {
    val data = skewed(25)
    val n = data.size.toLong
    val df = data.toDF("item").repartition(7)
    val sk = df.agg(FreqSketch.mg_candidates(col("item"), 32).as("sk"))
      .select(explode(col("sk.items")).as("item"), col("sk.n").as("n"))
    val viaSketch = df.join(broadcast(sk), Seq("item"))
      .groupBy(col("item"), col("n")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 10 > col("n"))
      .select("item", "cnt").as[(String, Long)].collect().toSet
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * 10 > n).toSet
    assert(viaSketch == exact)
    assert(viaSketch.nonEmpty)
  }

  test("non-string input fails at analysis, not mid-job") {
    val df = Seq(1, 2, 2, 3).toDF("item")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(FreqSketch.mg_candidates(col("item"), 4).as("sk")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("misra_gries_agg") ||
      e.getMessage.contains("STRING"))
  }

  test("fewer distinct items than counters: candidates are exhaustive") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("item")
    val row = df.agg(FreqSketch.mg_candidates(col("item"), 10).as("sk"))
      .select(col("sk.items"), col("sk.n")).collect().head
    assert(row.getSeq[String](0).toSet == Set("a", "b", "c"))
    assert(row.getLong(1) == 6L)
  }
}
