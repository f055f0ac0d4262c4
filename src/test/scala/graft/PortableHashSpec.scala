package graft

import org.apache.spark.sql.functions._
import graft.functions.PortableHash60

/** PortableHash60 must be bit-identical to the composed
  * `conv(substring(md5(s), 1, 15), 16, 10)` — every oracle that replays
  * the md5 hash in DuckDB depends on it.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("native == composed on crafted strings, unicode, empty, null") {
    val rows = Seq("", "a", "hello world", "caffè latte ☕", "0", "-1",
      "x" * 10000, "42:999999", null.asInstanceOf[String]).toDF("s")
    val bad = rows.select(
        PortableHash60(col("s")).as("n"), composed(col("s")).as("c"))
      .filter(!(col("n") <=> col("c"))).count()
    assert(bad == 0, "native hash diverges from composed md5 form")
  }

  test("native == composed across real document text and numeric keys") {
    val docs = Tables.documents(spark, sf001)
    val badText = docs.select(
        PortableHash60(col("text")).as("n"), composed(col("text")).as("c"))
      .filter(!(col("n") <=> col("c"))).count()
    assert(badText == 0)
    val badIds = docs.select(col("doc_id").cast("string").as("s"))
      .select(PortableHash60(col("s")).as("n"), composed(col("s")).as("c"))
      .filter(!(col("n") <=> col("c"))).count()
    assert(badIds == 0)
    // 60-bit range: never negative, never ≥ 2^60
    val outOfRange = docs.select(PortableHash60(col("text")).as("n"))
      .filter(col("n") < 0 || col("n") >= lit(1L << 60)).count()
    assert(outOfRange == 0)
  }
}
