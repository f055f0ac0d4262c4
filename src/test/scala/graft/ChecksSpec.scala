package graft

import org.apache.spark.sql.functions._
import graft.operators.Checks

/** The quality gate on data built to FAIL it: each check class counts
  * its violations exactly and flags `passed` only at zero.
  */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def resultMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Boolean)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("columnChecks counts nulls and range violations in one pass") {
    val d = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -3.0), (null, 5.0), (4L, 99.0), (null, null))
      .toDF("k", "v")
    val out = resultMap(Checks.columnChecks(d, Seq(
      "k_complete" -> col("k").isNull,
      "v_range" -> (col("v") < 0.0 || col("v") > 50.0),
      "v_complete" -> col("v").isNull)))
    assert(out("k_complete") == ((2L, false)))
    assert(out("v_range") == ((2L, false))) // -3 and 99; null v is NOT a range violation
    assert(out("v_complete") == ((1L, false)))
  }

  test("columnChecks on an empty table: zero violations, all passed") {
    val d = Seq.empty[(Long, Double)].toDF("k", "v")
    val out = resultMap(Checks.columnChecks(d, Seq("k_complete" -> col("k").isNull)))
    assert(out("k_complete") == ((0L, true)))
  }

  test("uniquenessCheck counts surplus rows beyond the first per dup key") {
    val d = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val out = resultMap(Checks.uniquenessCheck(d, "k_unique", Seq("k")))
    assert(out("k_unique") == ((3L, false))) // one extra 2, two extra 3s
    val clean = resultMap(Checks.uniquenessCheck(Seq(1L, 2L).toDF("k"), "k_unique", Seq("k")))
    assert(clean("k_unique") == ((0L, true)))
  }

  test("referentialCheck counts orphans; null child keys are orphans") {
    val child = Seq[java.lang.Long](10L, 10L, 20L, 30L, null).toDF("fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val out = resultMap(Checks.referentialCheck(child, parent, "fk_ok", "fk", "pk"))
    assert(out("fk_ok") == ((2L, false))) // 30 and null
  }

  test("suite unions check classes into one gate frame") {
    val d = Seq((1L, 5.0), (1L, 7.0)).toDF("k", "v")
    val out = resultMap(Checks.suite(
      Checks.columnChecks(d, Seq("v_range" -> (col("v") > 100.0))),
      Checks.uniquenessCheck(d, "k_unique", Seq("k"))))
    assert(out.size == 2)
    assert(out("v_range")._2 && !out("k_unique")._2)
  }
}
