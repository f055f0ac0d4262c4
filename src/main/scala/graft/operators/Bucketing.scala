package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-location contract that deletes
  * shuffles at READ time: a table written with `bucketBy(n, k)` is
  * hash-partitioned on disk, so a join or aggregation keyed on `k`
  * satisfies its clustering requirement straight off the scan — no
  * Exchange, on either side, on every subsequent query. At 100 TB this
  * is the difference between shuffling the fact table once per join
  * and never: the one-time bucketed write amortizes across every
  * downstream consumer keyed on `k` (the warehouse-layout counterpart
  * of [[FileLayout]]'s size calibration).
  *
  * Both join sides must agree on the bucket count (or divide evenly);
  * [[cocolatedJoinPlan]] in BucketingSpec pins the Exchange-free plan
  * for join AND aggregation, with broadcast suppressed so the pin
  * proves bucketing, not small-table luck.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) managed
    * parquet table. `saveAsTable` is required: bucket metadata lives in
    * the catalog, not the files — a plain `parquet(path)` write cannot
    * carry it. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Join two bucketed tables on their shared bucket key with the
    * sort-merge strategy pinned (a broadcast would mask the
    * co-location property this layout exists to provide). */
  def cocolatedJoin(spark: SparkSession, left: String, right: String,
                    on: Seq[String]): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), on)
}
