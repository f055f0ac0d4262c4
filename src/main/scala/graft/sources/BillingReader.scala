package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest for the reference's two schemaless text dialects (FIXTURES.md
  * §1–2; parsing sites `/root/reference/BD_hw1/src/spark/TopFive.java:64-66`,
  * `spark/TotalPerMonth.java:60-73`, `mapreduce/SupportAndConfidence.java:66`).
  *
  * Everything is declarative `functions._` (split / slice / explode /
  * to_date), so parsing stays inside whole-stage codegen and the text scan
  * parallelizes by file split exactly like any Spark text source.
  *
  * Pinned semantics (SURVEY §2.7):
  *  - empty lines dropped (Q-empty: the reference's Spark impls filter,
  *    its MR impls would NPE — we filter);
  *  - duplicate items within a basket deduped (Q7, `array_distinct`);
  *  - dates are NOT zero-padded (`2015-3-7`) → pattern `y-M-d`;
  *  - a synthetic `billId` is minted at ingest (the reference has no row
  *    id; pair generation needs one).
  */
object BillingReader {

  private def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .withColumn("billId", monotonically_increasing_id())
      .withColumn("fields", split(col("value"), ","))

  /** Dialect A — `<date>,<item>,<item>,...` → (billId, date, items). */
  def dialectA(spark: SparkSession, path: String): DataFrame =
    lines(spark, path).select(
      col("billId"),
      to_date(col("fields").getItem(0), "y-M-d").as("date"),
      array_distinct(filter(
        transform(
          slice(col("fields"), lit(2), greatest(size(col("fields")) - 1, lit(0))),
          i => trim(i)),
        i => length(i) > 0)).as("items"))

  /** Dialect B — `<date>,<cost> <item>,...` (cost FIRST; the reference's
    * own Javadoc shows the reverse and is wrong — FIXTURES.md §2) →
    * one row per priced line: (billId, date, item, unitCost). */
  def dialectB(spark: SparkSession, path: String): DataFrame =
    lines(spark, path)
      .select(
        col("billId"),
        to_date(col("fields").getItem(0), "y-M-d").as("date"),
        explode(filter(
          slice(col("fields"), lit(2), greatest(size(col("fields")) - 1, lit(0))),
          i => length(trim(i)) > 0)).as("pricedItem"))
      .withColumn("parts", split(trim(col("pricedItem")), " "))
      .select(
        col("billId"), col("date"),
        col("parts").getItem(1).as("item"),
        col("parts").getItem(0).cast("double").as("unitCost"))
}
