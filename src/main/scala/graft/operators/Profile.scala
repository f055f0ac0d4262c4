package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the "what is in this 100 TB table" pass that runs
  * before any curation decision: per-column null counts, distinct
  * cardinality, and numeric ranges in ONE scan, plus a two-pass
  * equi-width histogram.
  *
  * Every metric is emitted as a DOUBLE-or-BIGINT scalar with pinned
  * semantics per column type (numerics profile their value, strings
  * their length, timestamps their epoch-micros), so the whole profile is
  * hash-portable — no engine-specific string rendering of min/max.
  */
object Profile {

  /** Numeric view of any column for range metrics: numerics cast to
    * double (exact for the parquet types in play), strings profile
    * LENGTH, timestamps epoch-micros, booleans 0/1. */
  private def numView(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case _: StringType => length(col(c)).cast("double")
      case _: TimestampType => unix_micros(col(c)).cast("double")
      // parquet may surface as NTZ depending on inferTimestampNTZ (the
      // ColFns.tsLit issue); the cast re-reads the same instant in the
      // session tz (UTC everywhere the oracle compares)
      case _: TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType)).cast("double")
      case _: BooleanType => col(c).cast("int").cast("double")
      case _ => col(c).cast("double")
    }
  }

  /** One-scan profile of `cols`: (col_name, n_rows, n_null, n_distinct,
    * min_num, max_num) — one row per column.
    *
    * `exact = true` plans the multi-column distinct through Spark's
    * Expand (ONE pass over the input, ×(cols+1) rows into the
    * aggregate) — the right call up to a handful of columns.
    * `exact = false` swaps in HLL++ sketches (approx_count_distinct,
    * `rsd` relative error, default 2%): no Expand, constant memory, the
    * 100 TB default — estimates, so profile output in that mode is
    * spec-gated, not hash-compared. All other metrics are identical in
    * both modes.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true,
              rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty && cols.size <= 14,
      s"profile supports 1..14 columns per pass (${cols.size} given) — " +
        "wider tables: chunk into passes (>~60 agg columns also falls out of codegen)")
    def m(c: String, suffix: String) = s"__${c}__$suffix"
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(m(c, "null")),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), rsd))
          .as(m(c, "distinct")),
        min(numView(df, c)).as(m(c, "min")),
        max(numView(df, c)).as(m(c, "max")))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        col(m(c, "null")).as("n_null"),
        col(m(c, "distinct")).as("n_distinct"),
        col(m(c, "min")).as("min_num"),
        col(m(c, "max")).as("max_num"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Equi-width histogram of a numeric column: nBuckets buckets over the
    * observed [min, max], (bucket, lo, hi, n). Two passes by necessity
    * (the bounds are data); pass 1 reduces to ONE row that re-enters as
    * a broadcast — no collect, no driver round-trip. The bucket index is
    * a fixed IEEE expression (floor((x−mn)·B/(mx−mn)), max clamped to
    * the last bucket) so histograms hash-match across engines. Constant
    * columns get one bucket holding everything. NULL values land in a
    * single `bucket IS NULL` row (lo/hi NULL) rather than being
    * silently dropped — the profile() n_null cross-check. */
  def histogram(df: DataFrame, c: String, nBuckets: Int = 20): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= 10000, s"nBuckets in [1,10000], got $nBuckets")
    val v = numView(df, c)
    val bounds = df.agg(min(v).as("mn"), max(v).as("mx"))
    val b = lit(nBuckets.toDouble)
    // NULL guard FIRST: the constant-column arm doesn't reference v, so
    // without it a constant column's NULL rows would be swept into
    // bucket 0 while a non-constant column's land in the NULL bucket
    val bucket = when(v.isNull, lit(null).cast("long"))
      .when(col("mx") === col("mn"), lit(0L))
      .otherwise(least(
        floor((v - col("mn")) * b / (col("mx") - col("mn"))),
        lit(nBuckets - 1L)))
    df.crossJoin(broadcast(bounds))
      .select(bucket.as("bucket"), col("mn"), col("mx"))
      .groupBy(col("bucket"), col("mn"), col("mx"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (col("mn") + col("bucket").cast("double") * ((col("mx") - col("mn")) / b)).as("lo"),
        (col("mn") + (col("bucket") + 1L).cast("double") * ((col("mx") - col("mn")) / b)).as("hi"),
        col("n"))
  }
}
